package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-archive probe (VERDICT r16 task 5's measurement half): one
  * archive holding ~10× a normal file's share of the corpus, parsed
  * (a) at file grain — the straggler serializes the whole shard —
  * and (b) through the offset-split path with a grain that cuts the
  * big file into many member-aligned ranges. Prints one JSON line
  * with both wall-clocks, the task multiplier, and a record-count
  * parity check. Run:
  *
  *   sbt "Test/runMain graft.operators.WarcSkewProbe /tmp/sf10"
  */
object WarcSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // skewed root: 31 files; file 0 takes 10 residue classes of 40
    // (25% of the corpus ≈ 10× a normal file's 2.5% share)
    val root = java.nio.file.Files
      .createTempDirectory("graft-warc-skew").toString
    IndexManifest.registerTempRoot(root)
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        when(col("doc_id") % 40 < 10, 0L)
          .otherwise(col("doc_id") % 30 + 1).as("k"))
      .repartition(31, col("k"))
      .sortWithinPartitions(col("k"), col("doc_id"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        var curK = -1L
        var out: graft.ingest.WarcIo.MemberWriter = null
        def closeCur(): Unit = if (out != null) { out.close(); out = null }
        try {
          it.foreach { r =>
            val (id, text, k) =
              (r.getLong(0), r.getString(1), r.getLong(2))
            if (k != curK) {
              closeCur()
              out = new graft.ingest.WarcIo.MemberWriter(
                new java.io.BufferedOutputStream(
                  new java.io.FileOutputStream(
                    s"$root/part-$k.warc.gz")))
              curK = k
            }
            out.writeRecord(Seq(
              "WARC-Type" -> "response",
              "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
              "WARC-Date" -> "2022-05-01T00:00:00Z",
              "WARC-Target-URI" -> s"https://example.org/page/$id",
              "Content-Type" -> "application/http;msgtype=response"),
              (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
                s"<html><body><h1>Doc $id</h1><p>$text</p></body></html>")
                .getBytes("UTF-8"))
          }
        } finally closeCur()
      }
    val sizes = new java.io.File(root).listFiles().map(_.length()).sorted
    val bigBytes = sizes.last

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val glob = s"file:$root/*.warc.gz"
    // rep 1 warms the page cache for both paths; rep 2 is reported
    val grain = 4L << 20 // 4 MB: the big file splits ~10-30 ways
    def fileGrain(): Long =
      WarcQueries.warcRecords(spark, glob).count()
    def splitGrain(): Long =
      WarcQueries.warcRecordsSplit(spark, glob, grain).count()
    fileGrain(); splitGrain()
    val (tFile, nFile) = time(fileGrain())
    val (tSplit, nSplit) = time(splitGrain())
    val nSplits = graft.ingest.WarcIo.memberOffsets(
      new java.io.FileInputStream(
        new java.io.File(root).listFiles()
          .maxBy(_.length()).getPath)).length
    println(s"""{"probe":"warc_skew","big_file_mb":${bigBytes >> 20},""" +
      s""""file_grain_s":${math.round(tFile * 100) / 100.0},""" +
      s""""split_grain_s":${math.round(tSplit * 100) / 100.0},""" +
      s""""records_file":$nFile,"records_split":$nSplit,""" +
      s""""members_in_big_file":$nSplits,"grain_mb":${grain >> 20}}""")
    assert(nFile == nSplit, "split parse must be record-for-record")
    spark.stop()
  }
}
