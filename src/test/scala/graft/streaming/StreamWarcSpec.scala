package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.ingest.WarcIo

/** stream_warc_ingest: the streaming twin of src_warc — record-level
  * batch parity (quarantine rows included) and checkpointed
  * exactly-once per archive file. */
class StreamWarcSpec extends SparkSpec {

  private def respRecord(id: Int): Array[Byte] =
    WarcIo.recordBytes(Seq(
      "WARC-Type" -> "response",
      "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
      "WARC-Date" -> "2022-05-01T00:00:00Z",
      "WARC-Target-URI" -> s"https://example.org/page/$id",
      "Content-Type" -> "application/http;msgtype=response"),
      (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>body $id</p>")
        .getBytes("UTF-8"))

  private def writeArchive(path: String, ids: Seq[Int],
      corruptTail: Boolean = false): Unit = {
    val out = new WarcIo.MemberWriter(
      new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(path)))
    try {
      ids.foreach(id => out.writeMember(respRecord(id)))
      if (corruptTail)
        // a record whose Content-Length overruns the member
        out.writeMember(respRecord(999).dropRight(25))
    } finally out.close()
  }

  private def runOnce(inDir: String, outDir: String, ckpt: String): Unit = {
    val q = StreamingOps.warcIngest(spark, inDir)
      .drop("body") // parquet sink keeps the audit columns only
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    ()
  }

  test("stream == batch record-for-record, quarantine included; " +
      "checkpoint makes a new file incremental and a re-run a no-op") {
    val tmp = Files.createTempDirectory("graft-swarc").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"
    Files.createDirectories(Paths.get(inDir))
    writeArchive(s"$inDir/a.warc.gz", Seq(1, 2, 3))
    writeArchive(s"$inDir/b.warc.gz", Seq(4), corruptTail = true)

    runOnce(inDir, outDir, ckpt)
    val got = spark.read.parquet(outDir)
    val batch = graft.operators.WarcQueries
      .warcRecords(spark, s"file:$inDir/*.warc.gz").drop("body")
    // parity on everything except the physical file path spelling:
    // compare per-record tuples keyed by (file name, rec_idx)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(regexp_extract(col("src_file"), "([^/]+)$", 1).as("f"),
        col("rec_idx"), col("url"), col("rec_id"), col("rec_type"),
        col("content_length"), col("http_status"), col("err"))
      .collect().map(_.toSeq).toSet
    assert(canon(got) == canon(batch),
      "stream rows must equal the batch parse, quarantine included")
    assert(got.filter(col("err").startsWith("truncated")).count() == 1,
      "the corrupt tail quarantines in-stream")

    // a third archive lands: only ITS records are appended
    writeArchive(s"$inDir/c.warc.gz", Seq(7, 8))
    runOnce(inDir, outDir, ckpt)
    val after = spark.read.parquet(outDir)
    assert(after.count() == got.count() + 2)
    // re-run with the same checkpoint: a no-op
    runOnce(inDir, outDir, ckpt)
    assert(spark.read.parquet(outDir).count() == after.count())
  }
}
