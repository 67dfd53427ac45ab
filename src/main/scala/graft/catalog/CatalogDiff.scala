package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot changelog (CDC between two catalog states): which items
  * were added, removed, or changed between an old and a new snapshot.
  * The incremental-consumer primitive — a downstream index or mirror
  * applies the changelog instead of re-reading the catalog, and a
  * data audit answers "what did last night's ingest actually do".
  *
  * Content identity reuses CatalogStore.tiebreakHash (column-order
  * canonicalized, container-safe), excluding `ingested_at` (every
  * re-ingest touches it — it is WHEN, not WHAT) and the derived
  * `month` partition column.
  *
  * Scale shape: ONE full outer join on the item key — both sides
  * shuffle once on (collection_id, item_id); the change verdict is a
  * narrow hash comparison, and the summary collapses to |collections|
  * rows. At 100 TB both snapshots are month-partitioned, so a diff
  * scoped to recent months prunes to the affected partitions.
  */
object CatalogDiff {

  /** Per-item changelog: (collection_id, item_id, change) with change
    * in added | removed | changed (identical items are dropped —
    * a changelog carries changes, not the catalog). */
  def changelog(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val ex = Set("ingested_at", "month")
    val o = oldSnap
      .withColumn("_h_old", CatalogStore.tiebreakHash(oldSnap, ex))
      .select(col("collection_id"), col("item_id"), col("_h_old"))
    val n = newSnap
      .withColumn("_h_new", CatalogStore.tiebreakHash(newSnap, ex))
      .select(col("collection_id"), col("item_id"), col("_h_new"))
    o.join(n, Seq("collection_id", "item_id"), "full_outer")
      .withColumn("change",
        when(col("_h_old").isNull, lit("added"))
          .when(col("_h_new").isNull, lit("removed"))
          .when(col("_h_old") =!= col("_h_new"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col("collection_id"), col("item_id"), col("change"))
  }

  /** Per-collection summary of a changelog. */
  def summarize(log: DataFrame): DataFrame =
    log.groupBy(col("collection_id"))
      .agg(
        count(when(col("change") === "added", lit(1))).as("n_added"),
        count(when(col("change") === "removed", lit(1))).as("n_removed"),
        count(when(col("change") === "changed", lit(1))).as("n_changed"))
}
