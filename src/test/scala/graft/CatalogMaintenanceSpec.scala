package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.catalog.{CatalogMaintenance, CatalogStore, ItemAssembly}
import graft.ingest.FixtureGranuleSource

/** Small-file compaction: data-identical rewrite, leaf file-count
  * collapse, partition values intact, object-store (non-atomic-rename)
  * path, and no hidden residue. */
class CatalogMaintenanceSpec extends SparkSpec {

  private def sliverCatalog(prefix: String): String = {
    val path = Files.createTempDirectory(prefix).toString + "/items"
    val (items, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 03:59:59").granules(spark))
    CatalogStore.withMonth(items).repartition(24)
      .write.partitionBy("collection_id", "month").parquet(path)
    path
  }

  test("compact collapses sliver files and preserves every row") {
    val path = sliverCatalog("graft-cmp")
    val before = CatalogStore.read(spark, path)
    val beforeRows = before.collect().toSet
    val statsBefore = CatalogMaintenance.fileStats(spark, path)
    val filesBefore = statsBefore.count()
    val leaves = statsBefore.select("leaf").distinct().count()
    assert(filesBefore > leaves, "fixture must actually have slivers")
    val (seen, compacted) =
      CatalogMaintenance.compact(spark, path, targetBytes = 1L << 30)
    assert(seen == leaves && compacted == seen,
      s"every sliver leaf must compact (seen=$seen compacted=$compacted)")
    val statsAfter = CatalogMaintenance.fileStats(spark, path)
    assert(statsAfter.count() == leaves, "one file per leaf at huge target")
    val afterRows = CatalogStore.read(spark, path).collect().toSet
    assert(afterRows == beforeRows, "compaction must be a pure rewrite")
    // partition columns still derived from directory names
    assert(CatalogStore.read(spark, path)
      .select("collection_id", "month").distinct().count() == leaves)
    // no staging/backup residue anywhere under the catalog
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hidden(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(".")) Seq(st.getPath.toString)
        else if (st.isDirectory) hidden(st.getPath) else Nil
      }
    assert(hidden(new org.apache.hadoop.fs.Path(path)).isEmpty)
  }

  test("compact is idempotent and skips already-compact leaves") {
    val path = sliverCatalog("graft-cmp2")
    CatalogMaintenance.compact(spark, path, targetBytes = 1L << 30)
    val (seen2, compacted2) =
      CatalogMaintenance.compact(spark, path, targetBytes = 1L << 30)
    assert(seen2 > 0 && compacted2 == 0,
      "second pass must find nothing to compact")
  }

  test("compact works through a non-atomic-rename (object-store) fs") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockobj.impl", classOf[MockObjectStoreFs].getName)
    val local = sliverCatalog("graft-cmp3")
    val path = "mockobj://" + local.stripPrefix("file:")
    val beforeRows = CatalogStore.read(spark, path).collect().toSet
    val statsBefore = CatalogMaintenance.fileStats(spark, path)
    val leaves = statsBefore.select("leaf").distinct().count()
    assert(statsBefore.count() > leaves)
    val (_, compacted) =
      CatalogMaintenance.compact(spark, path, targetBytes = 1L << 30)
    assert(compacted > 0)
    assert(CatalogStore.read(spark, path).collect().toSet == beforeRows)
    assert(CatalogMaintenance.fileStats(spark, path).count() == leaves)
  }

  test("fileStats reports bytes, rows and leaves consistently") {
    val path = sliverCatalog("graft-cmp4")
    val stats = CatalogMaintenance.fileStats(spark, path).collect()
    assert(stats.forall(r => r.getAs[Long]("bytes") > 0))
    val totalRows = stats.map(_.getAs[Long]("n_rows")).sum
    assert(totalRows == CatalogStore.read(spark, path).count())
    assert(stats.forall(_.getAs[String]("leaf").contains("collection_id=")))
  }
}
