package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.ingest.TarIo

/** stream_wds_ingest: the streaming twin of the WebDataset source —
  * entry-level batch parity (quarantine included) and checkpointed
  * exactly-once per shard file. */
class StreamWdsSpec extends SparkSpec {

  private def writeShard(path: String, ids: Seq[Int],
      corrupt: Boolean = false): Unit = {
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path))
    try {
      ids.foreach { id =>
        TarIo.writeEntry(out, f"$id%09d.bin",
          Array.tabulate(id % 700)(j => ((id + j) % 251).toByte))
        TarIo.writeEntry(out, f"$id%09d.json",
          s"""{"doc_id":$id}""".getBytes("UTF-8"))
      }
      if (corrupt) out.write(Array.fill[Byte](512)('x'.toByte))
      else TarIo.finish(out)
    } finally out.close()
  }

  private def runOnce(inDir: String, outDir: String, ckpt: String): Unit = {
    val q = StreamingOps.wdsIngest(spark, inDir)
      .select(col("name"), length(col("data")).as("nb"),
        substring(sha2(col("data"), 256), 1, 16).as("sha16"),
        col("err"), col("src_file"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    ()
  }

  test("stream == batch entry-for-entry, quarantine included; " +
      "checkpoint makes a new shard incremental and a re-run a no-op") {
    val tmp = Files.createTempDirectory("graft-swds").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"
    val ckpt = s"$tmp/ckpt"
    Files.createDirectories(Paths.get(inDir))
    writeShard(s"$inDir/part-0.tar", Seq(1, 2, 3))
    writeShard(s"$inDir/part-1.tar", Seq(4), corrupt = true)

    runOnce(inDir, outDir, ckpt)
    val got = spark.read.parquet(outDir)
    val batch = graft.operators.MultimodalQueries
      .tarEntries(spark, s"file:$inDir/part-*.tar")
      .select(col("name"), length(col("data")).as("nb"),
        substring(sha2(col("data"), 256), 1, 16).as("sha16"),
        col("err"), col("src_file"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(regexp_extract(col("src_file"), "([^/]+)$", 1).as("f"),
        col("name"), col("nb"), col("sha16"), col("err"))
      .collect().map(_.toSeq).toSet
    assert(canon(got) == canon(batch),
      "stream entries must equal the batch parse, quarantine included")
    assert(got.filter(col("err").startsWith("tar:")).count() == 1,
      "the corrupt header quarantines in-stream")

    writeShard(s"$inDir/part-2.tar", Seq(7, 8))
    runOnce(inDir, outDir, ckpt)
    val after = spark.read.parquet(outDir)
    assert(after.count() == got.count() + 4,
      "only the new shard's four entries may append")
    runOnce(inDir, outDir, ckpt)
    assert(spark.read.parquet(outDir).count() == after.count(),
      "a re-run with the same checkpoint must be a no-op")
  }
}
