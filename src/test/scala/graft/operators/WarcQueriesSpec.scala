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
}
