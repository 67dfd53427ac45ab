package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ingest.WarcIo

/** src_warc / pipeline_warc_to_corpus: the distributed read path and
  * its quarantine contract (the oracle gate pins the parse
  * arithmetic; these pin the pieces the gate can't see — a corrupt
  * file inside a healthy glob, and the 404 drop). */
class WarcQueriesSpec extends SparkSpec {

  test("a corrupt archive in the glob quarantines as error rows; " +
      "healthy files still parse fully") {
    val dir = Files.createTempDirectory("graft-warc-spec")
    val good = new java.io.FileOutputStream(s"$dir/good.warc.gz")
    WarcIo.writeRecord(good, Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> "<urn:uuid:resp-1>",
      "WARC-Date" -> "2022-05-01T00:00:00Z",
      "WARC-Target-URI" -> "https://example.org/page/1",
      "Content-Type" -> "application/http;msgtype=response"),
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>")
        .getBytes("UTF-8"))
    good.close()
    Files.write(Paths.get(s"$dir/bad.warc.gz"),
      "not gzip at all".getBytes("UTF-8"))
    val rows = WarcQueries
      .warcRecords(spark, s"file:$dir/*.warc.gz")
      .select(col("url"), col("http_status"), col("err"))
      .collect()
    assert(rows.length == 2)
    val ok = rows.find(_.getString(2).isEmpty).get
    assert(ok.getString(0) == "https://example.org/page/1" &&
      ok.getLong(1) == 200L)
    assert(rows.exists(_.getString(2).startsWith("gzip:")))
    dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
  }

  test("the pipeline drops exactly the 404 pages and keeps doc_ids " +
      "aligned with the corpus") {
    val docs = graft.Tables.documents(spark, sf).count()
    val out = WarcQueries.pipelineWarcToCorpus(spark, sf)
    val n404 = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0).count()
    assert(out.count() == docs - n404)
    assert(out.filter(col("doc_id") % 7 === 0).count() == 0)
  }

  test("offset-split parse is record-for-record identical to the " +
      "whole-file parse — including a corrupt archive in the glob — " +
      "and actually multiplies parallelism past the file count") {
    val dir = Files.createTempDirectory("graft-warc-split")
    val mw = new WarcIo.MemberWriter(
      new java.io.FileOutputStream(s"$dir/big.warc.gz"))
    (1 to 200).foreach { i =>
      mw.writeRecord(Seq(
        "WARC-Type" -> "response",
        "WARC-Record-ID" -> s"<urn:uuid:resp-$i>",
        "WARC-Date" -> "2022-05-01T00:00:00Z",
        "WARC-Target-URI" -> s"https://example.org/page/$i",
        "Content-Type" -> "application/http;msgtype=response"),
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
          s"<p>body $i body $i</p>").getBytes("UTF-8"))
    }
    mw.close()
    Files.write(Paths.get(s"$dir/bad.warc.gz"),
      "definitely not gzip".getBytes("UTF-8"))
    val whole = WarcQueries.warcRecords(spark, s"file:$dir/*.warc.gz")
      .select(col("src_file"), col("rec_idx"), col("rec_id"),
        col("url"), col("err"), sha2(col("body"), 256).as("sha"))
    val split = WarcQueries
      .warcRecordsSplit(spark, s"file:$dir/*.warc.gz", splitBytes = 2048L)
      .select(col("src_file"), col("rec_idx"), col("rec_id"),
        col("url"), col("err"), sha2(col("body"), 256).as("sha"))
    val a = whole.orderBy("src_file", "rec_idx").collect()
    val b = split.orderBy("src_file", "rec_idx").collect()
    assert(a.length == 201, s"200 records + 1 quarantine, got ${a.length}")
    assert(a.sameElements(b),
      "split parse must equal the whole-file parse row for row")
    // the file-count cap is genuinely removed: 2 files parse as far
    // more than 2 splits at this grain
    val nParts = WarcQueries
      .warcRecordsSplit(spark, s"file:$dir/*.warc.gz", splitBytes = 2048L)
      .rdd.getNumPartitions
    assert(nParts > 2, s"expected >2 parse tasks for 2 files, got $nParts")
    dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
  }

  test("snk_wet memoizes the WET root per corpus fingerprint: a " +
      "second call replays the read-back audit without rewriting the " +
      "32 archives (r16 advisory)") {
    val first = WarcQueries.snkWet(spark, sf).orderBy("file_k").collect()
    val before = MemoBuilds.count
    val second = WarcQueries.snkWet(spark, sf).orderBy("file_k").collect()
    assert(!MemoBuilds.labelsSince(before).contains("wet_fixture"),
      "second call must hit the memo, not repay the distributed write")
    assert(first.sameElements(second),
      "memo hit must serve the identical audit")
  }

  test("snk_wat: metadata records pair 1:1 with HTTP-200 responses " +
      "via WARC ids, the JSON carries the page's ACTUAL anchors, and " +
      "the root memoizes per corpus fingerprint") {
    val watRoot = WarcQueries.watRootFor(spark, sf)
    val before = MemoBuilds.count
    assert(WarcQueries.watRootFor(spark, sf) == watRoot &&
      !MemoBuilds.labelsSince(before).contains("wat_fixture"),
      "second call must hit the memo, not repay the distributed write")
    // id linkage: wat-<id> record ids == resp-<id> ids of the 200 set
    val src = WarcQueries.warcRecords(spark,
      s"file:${WarcQueries.warcRoot(spark, sf)}/*.warc.gz")
    val respIds = src
      .filter(col("rec_type") === "response" && col("http_status") === 200)
      .select(regexp_extract(col("url"), "page/(\\d+)$", 1).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val wat = WarcQueries.warcRecords(spark, s"file:$watRoot/*.warc.gz")
      .filter(col("rec_type") === "metadata")
      .select(col("rec_id"), decode(col("body"), "UTF-8").as("json"))
      .collect()
    val watIds = wat.map(r =>
      "wat-(\\d+)".r.findFirstMatchIn(r.getString(0)).get.group(1).toLong)
      .sorted
    assert(watIds.toSeq == respIds.toSeq,
      "one WAT metadata record per HTTP-200 response, keyed by id")
    // a sampled record's JSON links == the linkTargets arithmetic
    val sample = wat.minBy(r =>
      "wat-(\\d+)".r.findFirstMatchIn(r.getString(0)).get.group(1).toLong)
    val id = respIds.head
    val (t1, t2, t3) = TextQueries.linkTargets((id % 10).toInt)
    val doms = Seq("example-news.com", "example-blog.net",
      "acme-docs.org", "shopmart.io", "forumhub.dev", "adfarm.biz",
      "spam-mill.info", "trackpix.co", "mirrorsite.us", "campuswiki.edu")
    val expect = s""""links":["https://${doms(t1)}/page/${id + 1}",""" +
      s""""https://${doms(t2)}/page/${id + 2}",""" +
      s""""https://${doms(t3)}/page/${id + 3}"]"""
    assert(sample.getString(1).contains(expect),
      s"JSON for doc $id must carry its three anchors: " +
        s"${sample.getString(1)}")
    assert(sample.getString(1).contains(s""""url":"https://example.org/page/$id""""))
  }

  test("pipeline_recrawl_plan: covers the crawled universe 1:1, all " +
      "four states occur, and the multiplicative policy orders " +
      "hot < recovered < cold < dead") {
    val plan = WarcQueries.pipelineRecrawlPlan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = graft.Tables.documents(spark, sf).count()
    assert(plan.length == n, s"plan rows ${plan.length} != corpus $n")
    val byState = plan.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byState.keySet == Set("hot", "cold", "recovered", "dead"),
      s"all four change-history states must occur, got $byState")
    val iv = plan.groupBy(_._2).view
      .mapValues(_.map(_._3).distinct.toSeq).toMap
    iv.foreach { case (s, vs) =>
      assert(vs.length == 1, s"$s: one interval per state, got $vs") }
    assert(iv("hot").head < iv("recovered").head &&
      iv("recovered").head < iv("cold").head &&
      iv("cold").head < iv("dead").head,
      s"policy must back off in state order, got $iv")
    // hot is the strict majority here (2/3 of pages change) — the
    // fixture genuinely exercises the halve-on-change branch
    assert(byState("hot") > plan.length / 2)
  }
}
