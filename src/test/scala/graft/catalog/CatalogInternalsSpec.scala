package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.FixtureGranuleSource

/** package-private CatalogStore internals: the cloud-committer guard,
  * the static per-leaf commit fallback, and the column-order
  * canonicalization of the cross-store tiebreak hash.
  */
class CatalogInternalsSpec extends SparkSpec {

  test("rejectsDynamicOverwrite flags only the cloud committers") {
    assert(CatalogStore.rejectsDynamicOverwrite(
      "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"))
    assert(!CatalogStore.rejectsDynamicOverwrite(""))
    assert(!CatalogStore.rejectsDynamicOverwrite(
      "org.apache.spark.sql.execution.datasources" +
        ".SQLHadoopMapReduceCommitProtocol"))
  }

  test("static per-leaf overwrite replaces exactly the staged leaves") {
    // the S3A cloud committers reject dynamicPartitionOverwrite at
    // runtime, so upsert's commit takes staticLeafOverwrite; the real
    // PathOutputCommitProtocol class is not on the test classpath, so
    // drive the helper directly over a staged monthly layout
    val root = Files.createTempDirectory("graft-staticleaf")
    val path = s"$root/items"
    val source = new FixtureGranuleSource()
    val (items0, _) = ItemAssembly.assemble(source.granules(spark))
    val items = items0.unionByName(
      items0.withColumn("collection_id", lit("UNTOUCHED")))
    CatalogStore.writeMonthly(items, path)
    val before = CatalogStore.read(spark, path).count()
    // stage a patched copy of ONLY the original collection
    val patched = CatalogStore.withMonth(items0
      .withColumn("properties", map(lit("patched"), lit("yes"))))
    val staging = s"$root/.items.staging-test"
    patched.write.mode("overwrite")
      .partitionBy("collection_id", "month").parquet(staging)
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val fs = stagingPath.getFileSystem(hadoopConf)
    def leaves(p: org.apache.hadoop.fs.Path,
        depth: Int): Seq[org.apache.hadoop.fs.Path] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap(st => leaves(st.getPath, depth - 1))
    val stagedLeaves = leaves(stagingPath, 2)
    assert(stagedLeaves.nonEmpty)
    CatalogStore.staticLeafOverwrite(spark, stagingPath,
      new org.apache.hadoop.fs.Path(path), Seq("collection_id", "month"),
      patched.schema, stagedLeaves)
    val after = CatalogStore.read(spark, path)
    assert(after.count() == before, "row count preserved")
    assert(after.filter(col("collection_id") === "UNTOUCHED")
      .filter(coalesce(
        element_at(col("properties"), "patched") === "yes",
        lit(false))).count() == 0,
      "partitions absent from the staged leaves must be untouched")
    assert(after.filter(col("collection_id") =!= "UNTOUCHED")
      .filter(!coalesce(
        element_at(col("properties"), "patched") === "yes",
        lit(false))).count() == 0,
      "every staged leaf must be replaced")
  }

  test("tiebreakHash is independent of the caller's column order") {
    val source = new FixtureGranuleSource()
    val (items, _) = ItemAssembly.assemble(source.granules(spark))
    val h1 = items.select(col("item_id"),
      CatalogStore.tiebreakHash(items).as("h"))
    val reordered = items.select(items.columns.reverse.map(col): _*)
    val h2 = reordered.select(col("item_id"),
      CatalogStore.tiebreakHash(reordered).as("h"))
    assert(h1.exceptAll(h2).count() == 0 && h2.exceptAll(h1).count() == 0,
      "same rows must hash identically regardless of select order")
  }
}
