package graft

import org.apache.spark.sql.functions._

import graft.catalog._
import graft.ingest.InsituSource

/** End-to-end in-situ vertical: the reference's second recipe —
  * trajectory platforms across 15 category collections. */
class InsituSpec extends SparkSpec {

  private lazy val platforms = InsituSource.platforms(spark)

  test("fixture covers all 15 categories with planted degenerates") {
    assert(platforms.select("category").distinct().count() == 15)
    assert(platforms.count() == 15 * 20)
    // planted unparsable bbox rows exist
    assert(platforms.filter(col("geospatial_lon_min") === "broken").count() > 0)
  }

  test("assembly: category derivation, geometry, quarantine") {
    val (items, errors) = InsituAssembly.assemble(platforms)
    val n = items.count()
    assert(n + errors.count() == 300L)
    assert(errors.count() > 0, "planted bad rows must be quarantined")
    // 15 derived collections named root-CATEGORY
    val colls = items.select("collection_id").distinct()
      .collect().map(_.getString(0)).sorted
    assert(colls.length == 15)
    assert(colls.forall(_.startsWith(InsituSource.CollectionRoot + "-")))
    // geometry types: LineString for tracks, Point for degenerates
    val types = items
      .select(element_at(col("properties"), "geo_type").as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types.contains("LineString") && types.contains("Point"))
    // DP collapsed the collinear run: kept points well below input
    val kept = items
      .filter(element_at(col("properties"), "geo_type") === "LineString")
      .select(element_at(col("properties"), "n_points").cast("int"))
      .collect().map(_.getInt(0))
    assert(kept.forall(_ <= 4),
      s"collinear drift + one kink must simplify to ≤4 points, got ${kept.max}")
    // datetimes array present for observed platforms
    assert(items.filter(size(col("datetimes")) > 0).count() == n)
  }

  test("in-situ catalog: 15 partitions, per-collection search") {
    val (items, _) = InsituAssembly.assemble(platforms)
    val path = java.nio.file.Files
      .createTempDirectory("graft-insitu").toString + "/items"
    CatalogStore.write(items, path)
    val catalog = CatalogStore.read(spark, path)
    assert(new java.io.File(path).listFiles()
      .count(_.getName.startsWith("collection_id=")) == 15)
    // STAC search within one category collection
    val page = CatalogQuery.compile(catalog, CatalogQuery.Search(
      collections = Seq(s"${InsituSource.CollectionRoot}-CT"),
      cql2 = Some("geo_type = 'LineString'"),
      sortBy = Seq(("item_id", true)),
      limit = 50)).collect()
    assert(page.nonEmpty)
    assert(page.forall(_.getAs[String]("collection_id").endsWith("-CT")))
    // extents summary across the 15 collections
    val ext = CatalogStore.collectionExtents(catalog)
    assert(ext.count() == 15)
  }
}
