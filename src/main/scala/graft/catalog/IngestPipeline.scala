package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ingest.GranuleSource

/** End-to-end ingest (the engine's recipe `main`, SURVEY.md §3.1):
  * granule source → item assembly → catalog upsert, one Catalyst plan
  * per action, no driver-side materialization. `postprocess` is the
  * user hook point (`postprocess_item`, avhrr recipe.py:77-78,130).
  */
object IngestPipeline {

  case class IngestResult(itemsWritten: Long, castErrors: Long)

  def run(
      spark: SparkSession,
      source: GranuleSource,
      catalogPath: String,
      postprocess: DataFrame => DataFrame = identity,
      initial: Boolean = false): IngestResult = {
    val (items, errors) = ItemAssembly.assemble(source.granules(spark))
    val finalItems = postprocess(items)
    if (initial) CatalogStore.write(finalItems, catalogPath)
    else CatalogStore.upsert(spark, catalogPath, finalItems)
    IngestResult(
      CatalogStore.read(spark, catalogPath).count(),
      errors.count())
  }
}
