package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** curation_url_filter: planted URLs exercising every normalization
  * rule and the blocklist semantics, plus the non-degenerate gate
  * split and the datasheet roll-in. */
class UrlFilterSpec extends SparkSpec {
  import spark.implicits._

  private val bl = Seq("badsite.com" -> "spam")

  private def verdicts(urls: Seq[(Long, String)]) =
    PipelineQueries.urlVerdictFrom(
      spark, urls.toDF("doc_id", "url_raw"), bl)
      .select(col("doc_id"), col("url_norm"), col("domain"),
        col("category"), col("keep"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getBoolean(4)))
      .toMap

  test("normalization: case fold, default ports, www, fragments, " +
      "duplicate and trailing slashes all collapse to one canonical " +
      "form; blocklisted domains drop whatever the shape") {
    val m = verdicts(Seq(
      1L -> "https://goodsite.org/p/1",
      2L -> "HTTPS://WWW.GOODSITE.ORG:443/p/1",
      3L -> "https://goodsite.org//p//1#frag",
      4L -> "http://goodsite.org:80/x/",
      5L -> "https://sub.badsite.com/landing",
      6L -> "HTTP://BADSITE.COM:80/a//b/"))
    assert(m(1L)._1 == "https://goodsite.org/p/1")
    assert(m(2L)._1 == "https://goodsite.org/p/1",
      "upper case + :443 + www must normalize away")
    assert(m(3L)._1 == "https://goodsite.org/p/1",
      "fragment and duplicate slashes must normalize away")
    assert(m(4L)._1 == "http://goodsite.org/x",
      ":80 and the trailing slash must strip")
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(m(id)._2 == "goodsite.org" && m(id)._4, s"doc $id must keep")
    }
    assert(m(5L)._2 == "badsite.com" && m(5L)._3 == "spam" && !m(5L)._4,
      "a subdomain of a blocked registered domain must drop")
    assert(!m(6L)._4, "case/port variants of a blocked domain must drop")
  }

  test("non-default ports survive normalization (only :80/:443 are " +
      "scheme defaults)") {
    val m = verdicts(Seq(7L -> "https://goodsite.org:8443/p"))
    assert(m(7L)._1 == "https://goodsite.org:8443/p")
  }

  test("gate ledger: 10 domains, exactly the 3 blocklisted ones drop " +
      "everything, the rest keep everything") {
    val rows = PipelineQueries.curationUrlFilter(spark, sf).collect()
    assert(rows.length == 10)
    val blocked = PipelineQueries.URL_BLOCKLIST.map(_._1).toSet
    rows.foreach { r =>
      val (dom, cat, nd, nk) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))
      if (blocked(dom)) {
        assert(cat != "allowed" && nk == 0L, s"$dom must drop all")
      } else {
        assert(cat == "allowed" && nk == nd, s"$dom must keep all")
      }
      assert(nd > 0)
    }
  }

  test("datasheet url_keep_rate equals the ledger's corpus-level " +
      "keep fraction") {
    val ledger = PipelineQueries.curationUrlFilter(spark, sf)
      .agg(sum(col("n_kept")).cast("double") / sum(col("n_docs")))
      .first().getDouble(0)
    val sheet = PipelineQueries.curationDatasheet(spark, sf)
      .agg((sum(col("url_keep_rate") * col("n_docs")) /
        sum(col("n_docs"))).as("r"))
      .first().getDouble(0)
    assert(math.abs(ledger - sheet) < 1e-3,
      s"ledger $ledger vs datasheet $sheet")
  }
}
