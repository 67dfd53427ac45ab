package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** warc_links + graph_host_rank (round 17: the crawl→graph loop) —
  * the properties the oracle gate can't state:
  *
  *  1. STRIP INVARIANCE: the out-link block added to the fixture page
  *     is anchor-text-free, so the htmlStrip of the page is
  *     byte-identical with or without it — the invariant that kept
  *     every stripped-text oracle green when the block landed.
  *  2. The planted hub/spam separation: the hub (index 0) is the
  *     top-ranked domain, and the blocklisted farm trio (5,6,7) —
  *     a complete internal triangle, in-degree ≥ 2 each — stays in
  *     the bottom half of the ranking (the signal a URL-quality
  *     prior exists to produce; a fully CLOSED farm would have
  *     topped pure PageRank, which is why the farm leaks to the hub).
  *  3. Extraction == arithmetic on a hand-built page (the regex path
  *     proven against a body built by linkBlockStr itself would be
  *     circular — this one is written out literally).
  */
class WarcLinksSpec extends SparkSpec {
  import spark.implicits._

  test("strip invariance: the link block contributes ZERO characters " +
      "to the stripped page (every stripped-text oracle unchanged)") {
    val pageWith = TextQueries.htmlWrap(col("doc_id"), col("text"))
    // the pre-round-17 wrap, literal
    val pageWithout = concat(
      lit("<html><head><script type=\"text/javascript\">var x = 1;" +
        "</script><style>p { color: red }</style></head><body><h1>Doc "),
      col("doc_id"),
      lit("</h1><!-- boilerplate --><p>"), col("text"),
      lit(" &amp; more &lt;escaped&gt; &quot;text&quot;&nbsp;here</p>" +
        "</body></html>"))
    val n = graft.Tables.documents(spark, sf)
      .select(
        TextQueries.htmlStripCol(pageWith).as("a"),
        TextQueries.htmlStripCol(pageWithout).as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(n == 0, s"$n documents strip differently with the link block")
  }

  test("WAT links JSON: a link-less page serializes \"links\":[] — " +
      "valid JSON with an EMPTY array, not [\"\"] (ADVICE r17)") {
    val pages = Seq(
      ("<html><body>no anchors here</body></html>", 0),
      ("<a href=\"https://x.example/1\"><a href=\"https://y.example/2\"",
        2)).toDF("page", "want_n")
    val got = pages.select(
      WarcQueries.watLinksJson(regexp_extract_all(col("page"),
        lit("<a href=\"(https://[^\"]+)\""), lit(1))).as("j"),
      col("want_n"))
      .as[(String, Int)].collect().toMap
    assert(got.keySet.contains("[]"), s"zero-anchor page: $got")
    // both forms must parse as a JSON string array of the right size
    got.foreach { case (j, n) =>
      val parsed = pages.sparkSession.range(1)
        .select(from_json(lit(j),
          org.apache.spark.sql.types.DataTypes.createArrayType(
            org.apache.spark.sql.types.DataTypes.StringType)).as("a"))
        .select(size(col("a"))).as[Int].head()
      assert(parsed == n, s"$j must parse as $n links, got $parsed")
    }
  }

  test("builder parity: linkBlockStr (writer) == linkBlockCol " +
      "(column) on every doc") {
    val n = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        TextQueries.linkBlockCol(col("doc_id")).as("c"))
      .collect()
      .count(r => TextQueries.linkBlockStr(r.getLong(0)) != r.getString(1))
    assert(n == 0, s"$n docs differ between writer and column builders")
  }

  test("extraction == arithmetic on a literal hand-built page") {
    val body =
      "<html><body><h1>T</h1>" +
        "<link rel=\"canonical\" href=\"https://www.example-blog.net/page/1\"/>" +
        "<div class=\"nav\">" +
        "<a href=\"https://acme-docs.org/page/2\"></a>" +
        "<a href=\"https://example-blog.net/page/9\"></a>" + // intra: dropped
        "<a href=\"https://example-news.com/page/3\"></a></div>" +
        "<p>text</p></body></html>"
    // drive the same regex chain warcLinkEdges uses, over one row
    val page = lit(body)
    def regDom(c: org.apache.spark.sql.Column) =
      regexp_extract(c, "([^.]+\\.[^.]+)$", 1)
    val rows = Seq(1).toDF("x")
      .select(
        regexp_extract(page,
          "<link rel=\"canonical\" href=\"https://([^/\"]+)/", 1)
          .as("src_host"),
        explode(regexp_extract_all(page,
          lit("<a href=\"https://([^/\"]+)/[^\"]*\""), lit(1)))
          .as("dst_host"))
      .select(regDom(col("src_host")).as("s"), regDom(col("dst_host")).as("t"))
      .filter(col("s") =!= col("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(rows.toSeq == Seq(
      ("example-blog.net", "acme-docs.org"),
      ("example-blog.net", "example-news.com")),
      s"got ${rows.toSeq}: www-prefix must reduce to the registered " +
        "domain and the intra-domain link must drop")
  }

  test("planted separation: hub top-ranked, the spam farm trio in " +
      "the bottom half despite in-degree >= 2") {
    val ranked = WarcQueries.graphHostRank(spark, sf)
      .orderBy(col("rank_fp").desc)
      .collect()
    assert(ranked.length == 10, "all ten domains must be ranked")
    assert(ranked.head.getString(0) == "example-news.com",
      s"the hub must rank first, got ${ranked.head.getString(0)}")
    val farm = Set("adfarm.biz", "spam-mill.info", "trackpix.co")
    val topHalf = ranked.take(5).map(_.getString(0)).toSet
    assert(topHalf.intersect(farm).isEmpty,
      s"farm domains must stay in the bottom half, top-5: $topHalf")
    // the farm is genuinely well-cited internally — the in-degree
    // alone would NOT have demoted it (that's the point of the rank)
    ranked.filter(r => farm(r.getString(0))).foreach { r =>
      assert(r.getLong(2) >= 2,
        s"${r.getString(0)}: expected in-degree >= 2, got ${r.getLong(2)}")
    }
  }

  test("graph_hits: the hub domain tops authority at exactly " +
      "HITS_SCALE; the farm trio's authority stays bounded") {
    val rows = WarcQueries.graphHits(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 10, "all ten domains must be scored")
    val S = SimilarityQueries.HITS_SCALE
    assert(rows("example-news.com")._1 == S,
      s"the cited-by-everyone hub must be the max-normalized top " +
        s"authority, got ${rows("example-news.com")._1}")
    Seq("adfarm.biz", "spam-mill.info", "trackpix.co").foreach { d =>
      assert(rows(d)._1 < S / 2,
        s"$d: the closed farm's internal triangle must not lift its " +
          s"authority past SCALE/2, got ${rows(d)._1}")
    }
    // authority and hub measure different things: the top authority
    // is NOT the top hub (news is cited by all, cites almost nothing)
    assert(rows("example-news.com")._2 < S / 10,
      "the pure-destination hub domain must have a near-zero hub score")
  }

  test("hitsRanks: driver shortcut == distributed fallback, " +
      "bit-identical on the real host graph") {
    def toId(c: org.apache.spark.sql.Column) =
      array_position(typedLit(Seq("example-news.com", "example-blog.net",
        "acme-docs.org", "shopmart.io", "forumhub.dev", "adfarm.biz",
        "spam-mill.info", "trackpix.co", "mirrorsite.us",
        "campuswiki.edu")), c) - 1
    val edges = WarcQueries.warcLinkEdges(spark, sf)
      .select(toId(col("src_domain")).as("a"),
        toId(col("dst_domain")).as("b"))
      .distinct()
    val nodes = edges.select(col("a")).union(edges.select(col("b")))
      .distinct().select(col("a").as("vec_id"))
    val driver = SimilarityQueries.hitsRanks(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val dist = SimilarityQueries.hitsRanks(nodes, edges, driverMax = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(driver == dist,
      s"driver and distributed HITS diverge:\n$driver\n$dist")
  }

  test("warc_links excludes 404 pages and intra-domain links; " +
      "n_links matches the residue-class arithmetic") {
    val links = WarcQueries.warcLinks(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val doms = (0 until 10).map(d =>
      graft.Tables.documents(spark, sf)
        .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 10 === d)
        .count())
    // replay the arithmetic: per residue class d, 3 targets
    val expect = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    val U = Seq("example-news.com", "example-blog.net", "acme-docs.org",
      "shopmart.io", "forumhub.dev", "adfarm.biz", "spam-mill.info",
      "trackpix.co", "mirrorsite.us", "campuswiki.edu")
    (0 until 10).foreach { d =>
      val (t1, t2, t3) = TextQueries.linkTargets(d)
      Seq(t1, t2, t3).filter(_ != d).foreach { t =>
        expect((U(d), U(t))) += doms(d)
      }
    }
    assert(links == expect.toMap,
      s"edge counts diverge: engine=$links expected=${expect.toMap}")
  }
}
