package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The full-system takedown flow — the engine-side realization of the
  * reference's STAC Transaction DELETE (docker-compose.yml:30-44
  * serves deletes through pgstac): one retraction request must sweep
  * EVERY serving surface — the catalog's search results AND both
  * persisted retrieval indexes — using the per-surface delete
  * operators that are individually verified elsewhere. This spec pins
  * the composition: nothing about running them together (shared
  * SparkSession, shared doc-id space) leaks a deleted id back into
  * any serve path.
  */
class TakedownSpec extends SparkSpec {

  test("one takedown sweeps catalog search and both serving indexes") {
    import graft.catalog.{CatalogQuery, CatalogStore, ItemAssembly}
    import graft.ingest.FixtureGranuleSource

    // --- the serving estate: a catalog and both indexes ---
    val catPath = Files.createTempDirectory("graft-td-cat").toString + "/items"
    val (items, _) = ItemAssembly.assemble(
      new FixtureGranuleSource(end = "2022-05-01 02:59:59").granules(spark))
    CatalogStore.write(items, catPath)
    val textRoot = Files.createTempDirectory("graft-td-text").toString
    IndexManifest.registerTempRoot(textRoot)
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    TextQueries.appendToIndex(docs, textRoot, 0L)
    val vecRoot = Files.createTempDirectory("graft-td-vec").toString
    IndexManifest.registerTempRoot(vecRoot)
    val e = graft.Tables.embeddings(spark, sf)
    SimilarityQueries.initVectorIndex(e, vecRoot)
    SimilarityQueries.appendToVectorIndex(e, vecRoot, 0L)

    // --- the takedown request: items by id, documents/vectors by id ---
    val itemIds = items.limit(5).select("item_id")
      .collect().map(_.getString(0)).toSeq
    val contentIds = docs.filter(pmod(col("doc_id"), lit(9)) === 1)
      .select("doc_id")

    val nItems = CatalogStore.delete(spark, catPath, itemIds)
    assert(nItems == 5L)
    val nDocs = TextQueries.deleteFromTextIndex(
      spark, textRoot, contentIds, 1L)
    assert(nDocs > 0)
    SimilarityQueries.deleteFromVectorIndex(
      spark, vecRoot, contentIds.withColumnRenamed("doc_id", "vec_id"), 1L)

    // --- every serve surface reflects the takedown immediately ---
    val searched = CatalogQuery.compile(
      CatalogStore.read(spark, catPath),
      CatalogQuery.Search(limit = 10000))
      .select("item_id").collect().map(_.getString(0)).toSet
    assert(itemIds.forall(!searched.contains(_)),
      "catalog search still returns taken-down items")

    val served = TextQueries.bm25ServeFrom(spark, textRoot,
      terms = Seq("the", "data", "spark"), k = 200).collect()
    assert(served.forall(_.getLong(0) % 9 != 1),
      "bm25 serve still returns taken-down documents")

    val q = SimilarityQueries.withNorm(e).filter(col("vec_id") === 0)
      .select(col("emb"), col("nrm")).collect().head
    val ann = SimilarityQueries.annServeFrom(spark, vecRoot,
      q.getSeq[Double](0).toArray, q.getDouble(1), topK = 100).collect()
    assert(ann.forall(_.getLong(0) % 9 != 1),
      "ANN serve still returns taken-down vectors")

    // --- and maintenance later makes the removal physical everywhere ---
    TextQueries.compactTextIndex(spark, textRoot)
    SimilarityQueries.compactVectorIndex(spark, vecRoot)
    assert(spark.read.parquet(s"$textRoot/postings")
      .filter(pmod(col("doc_id"), lit(9)) === 1).count() == 0)
    assert(spark.read.parquet(s"$vecRoot/assignments")
      .filter(pmod(col("vec_id"), lit(9)) === 1).count() == 0)
  }
}
