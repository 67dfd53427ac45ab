package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for repeated co-located joins (SCALE.md
  * §Joins). Writing both fact tables bucketed (and per-bucket
  * sorted) by the join key pins an identical hash-partitioned layout
  * on disk, so every later equi-join on that key is exchange-free:
  * task i zips bucket i with bucket i. For fact⋈fact joins that
  * recur (items⋈granules, orders⋈lineitem), this is the difference
  * between re-shuffling 100 TB per run and shuffling never — the
  * one-time bucketed write is the whole cost. Bucket count is chosen
  * once per table (≈ table size / 128 MB target split) and must
  * match across co-joined tables. */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table in
    * the session catalog. The repartition on the bucket key is
    * load-bearing: without it every upstream task writes a sliver
    * into every bucket (tasks × buckets small files); with it each
    * task owns exactly one bucket's rows (repartition and bucketBy
    * share Murmur3 hash partitioning), so the table is one file per
    * bucket. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their shared bucket key.
    * With matching bucket counts this plans as a sort-merge join
    * with ZERO Exchange operators on either side — asserted by
    * PlanShapeSpec, result-equality-checked against the shuffling
    * join. */
  def colocatedJoin(s: SparkSession, left: String, right: String,
      key: String): DataFrame =
    s.table(left).join(s.table(right), key)
}
