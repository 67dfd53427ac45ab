package graft.operators

import graft.SparkSpec

/** Dirty-ingest behavior: PERMISSIVE JSONL reading must quarantine
  * exactly the malformed lines — never fail the job, never silently
  * drop a row. */
class SourceFormatsSpec extends SparkSpec {

  test("jsonl read quarantines exactly the planted corrupt lines") {
    val r = SourceSinkQueries.srcJsonlQuarantine(spark, sf).collect()(0)
    assert(r.getLong(0) == 20L, s"parsed ${r.getLong(0)} good lines")
    assert(r.getLong(1) == 3L, s"quarantined ${r.getLong(1)} lines")
  }

  test("footer audit sums chunks across files and row groups, counts nulls") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-footer").toString + "/t"
    // 3 files (repartition) × several row groups (tiny block size so
    // each file splits), with nulls every 10th row — the paths the
    // single-file single-row-group test tables never exercise
    val n = 30000L
    (0L until n).map(i =>
        (i, if (i % 10 == 0) None else Some(i * 0.5), s"s$i"))
      .toDF("id", "v", "tag")
      .repartition(3)
      .write
      .option("parquet.block.size", 64 * 1024)
      .option("parquet.page.size", 8 * 1024)
      .mode("overwrite").parquet(tmp)
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(tmp)
    val files = p.getFileSystem(conf).listStatus(p).toSeq
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .map(f => ("t", f.toString))
    assert(files.length == 3, s"expected 3 data files, got ${files.length}")
    // the point of the fixture is MULTIPLE row groups per file — if a
    // parquet default change ever collapses them, this test must say
    // so rather than silently stop covering the cross-chunk sums
    val oneFooter = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(files.head._2), conf))
    val nBlocks = try oneFooter.getFooter.getBlocks.size finally oneFooter.close()
    assert(nBlocks >= 2, s"fixture produced only $nBlocks row group(s)")
    val out = SourceSinkQueries.footerAudit(spark, files,
        Map(("t", "id") -> true, ("t", "v") -> true, ("t", "tag") -> false))
      .collect().map(r => r.getString(1) -> r).toMap
    assert(out("id").getLong(2) == 30000L)
    assert(out("id").getLong(3) == 0L)
    assert(out("id").getDouble(4) == 0.0 && out("id").getDouble(5) == 29999.0)
    assert(out("v").getLong(2) == 30000L, "num_values counts nulls too")
    assert(out("v").getLong(3) == 3000L, "footer null_count sums across chunks")
    assert(out("v").getDouble(4) == 0.5 && out("v").getDouble(5) == 29999 * 0.5)
    assert(out("tag").getLong(2) == 30000L && out("tag").isNullAt(4))
  }
}
