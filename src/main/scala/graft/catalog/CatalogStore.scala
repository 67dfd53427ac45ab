package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's catalog store (snk_upsert / snk_parquet_catalog):
  * items as parquet partitioned by collection_id — the role pgstac's
  * time-partitioned Postgres tables play behind `ToPgStac`
  * (avhrr recipe.py:85,137; docker-compose.yml:30-44).
  *
  * Upsert = last-write-wins per item_id (pgstac's idempotent item
  * replace) implemented as dedup-rank over (existing ∪ delta) +
  * DYNAMIC partition overwrite: only partitions present in the delta
  * are rewritten — at 100 TB an incremental month touches a handful
  * of partitions, not the whole catalog.
  */
object CatalogStore {

  /** Partition-derivation column: month of start_datetime, the second
    * partition level for 100 TB catalogs (pgstac's time partitioning
    * role). Stored as yyyy-MM strings so directory names are sane. */
  def withMonth(items: DataFrame): DataFrame =
    items.withColumn("month",
      date_format(col("start_datetime"), "yyyy-MM"))

  /** Initial (full) write. Repartition on the partition column first:
    * one shuffle task per collection writes its partition's files —
    * without it every shuffle task writes a sliver into every
    * partition directory (tiny-file explosion at scale). */
  def write(items: DataFrame, path: String): Unit =
    items.repartition(col("collection_id"))
      .write
      .mode("overwrite")
      .partitionBy("collection_id")
      .parquet(path)

  /** Month-partitioned layout: (collection_id, month) directories.
    * CatalogQuery derives month predicates from interval filters, so
    * a datetime search prunes whole month directories before any
    * file is opened. */
  def writeMonthly(items: DataFrame, path: String): Unit =
    withMonth(items)
      .repartition(col("collection_id"), col("month"))
      .write
      .mode("overwrite")
      .partitionBy("collection_id", "month")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Typed view of the items table (SURVEY §1.3 Dataset[StacItem]). */
  def readTyped(spark: SparkSession, path: String)
      : org.apache.spark.sql.Dataset[StacModel.StacItem] = {
    import spark.implicits._
    read(spark, path)
      .select("item_id", "collection_id", "geometry", "bbox",
        "bbox_w", "bbox_s", "bbox_e", "bbox_n",
        "start_datetime", "end_datetime", "datetimes",
        "properties", "assets", "links", "source_url", "ingested_at")
      .as[StacModel.StacItem]
  }

  /** Per-collection extents from the items table — the summary pgstac
    * maintains server-side (collections.yaml extent fields): temporal
    * min/max plus the BboxUnionAgg spatial union. */
  def collectionExtents(items: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import items.sparkSession.implicits._
    import graft.functions.BboxUnionAgg
    val spatial = items
      .select(col("collection_id"),
        struct(col("bbox_w").as("w"), col("bbox_s").as("s"),
          col("bbox_e").as("e"), col("bbox_n").as("n")).as("box"))
      .as[(String, BboxUnionAgg.Bbox)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(BboxUnionAgg.agg.toColumn.name("extent"))
      .select(col("key").as("collection_id"),
        col("extent.w").as("bbox_w"), col("extent.s").as("bbox_s"),
        col("extent.e").as("bbox_e"), col("extent.n").as("bbox_n"))
    val temporal = items.groupBy(col("collection_id"))
      .agg(min(col("start_datetime")).as("t_min"),
        max(col("end_datetime")).as("t_max"),
        count(lit(1)).as("n_items"))
    temporal.join(spatial, Seq("collection_id"))
  }

  /** Idempotent merge of `delta` into the catalog at `path`: newest
    * ingested_at wins per item_id; ties broken by delta-over-existing,
    * then by a content hash — fully deterministic across retries.
    * Touches only the delta's collection partitions. */
  def upsert(spark: SparkSession, path: String, delta: DataFrame): Unit = {
    // bootstrap: first merge into a not-yet-existing catalog is a
    // plain write (a streaming upsertSink's first batch hits this).
    // An EMPTY first batch must not write: a zero-row partitioned
    // write leaves a parquet-less directory that wedges every later
    // read with UNABLE_TO_INFER_SCHEMA.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) {
      if (!delta.isEmpty) write(delta, path)
      return
    }
    val existingAll = read(spark, path)
    // a writeMonthly catalog keeps its (collection_id, month) layout:
    // derive month on the delta and overwrite both partition levels
    val monthly = existingAll.columns.contains("month")
    val deltaP =
      if (monthly && !delta.columns.contains("month")) withMonth(delta)
      else delta
    val partCols =
      if (monthly) Seq("collection_id", "month") else Seq("collection_id")
    val affected = deltaP.select("collection_id").distinct()
    val existing = existingAll
      .join(broadcast(affected), Seq("collection_id"), "left_semi")
      .select(deltaP.columns.map(col).toIndexedSeq: _*)
    val dataCols = deltaP.columns.map(col).toIndexedSeq
    // Spark prohibits hashing MAP types (no canonical order) — build
    // the tiebreak hash from the hash-safe columns only
    def hashSafe(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case a: org.apache.spark.sql.types.ArrayType =>
          hashSafe(a.elementType)
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.forall(f => hashSafe(f.dataType))
        case _ => true
      }
    val tieCols = deltaP.schema.fields
      .filter(f => hashSafe(f.dataType)).map(f => col(f.name)).toIndexedSeq
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("ingested_at").desc, col("_prio").desc,
        col("_tie").desc)
    val merged = existing.withColumn("_prio", lit(0))
      .unionByName(deltaP.select(dataCols: _*).withColumn("_prio", lit(1)))
      // content hash: equal-timestamp, equal-priority duplicates pick
      // the same winner on every run/retry
      .withColumn("_tie", xxhash64(struct(tieCols: _*)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "_prio", "_tie")
    // Materialize the merge BEFORE overwriting: the plan reads the
    // same path it is about to rewrite, and a lazy read racing the
    // overwrite commit (or an AQE stage re-execution) could read
    // deleted files. localCheckpoint severs the lineage first; if it
    // fails, the catalog is untouched — fail-safe, never corrupting.
    val materialized = merged.repartition(partCols.map(col): _*)
      .localCheckpoint()
    // per-write dynamic mode: only partitions present in `merged` are
    // replaced, WITHOUT mutating the session-wide overwrite semantics
    materialized.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path)
  }
}
