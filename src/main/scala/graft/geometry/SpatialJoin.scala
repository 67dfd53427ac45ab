package graft.geometry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable bucketized overlap joins (SURVEY.md §2.3
  * join_bbox_intersect / join_interval_overlap; §4.2 "bbox/interval
  * overlap at scale").
  *
  * A raw overlap theta-join is a BroadcastNestedLoopJoin in Spark — a
  * cross product at scale. These helpers rewrite it as: explode each
  * side to the grid cells (or time buckets) it covers → equi-join on
  * the cell → residual exact predicate → drop multi-cell duplicates.
  * Semantically identical to the theta join for rows whose
  * coordinates are plausible degrees (any wrap convention up to ±400;
  * sentinel garbage — NetCDF fill, NaN, null — is dropped rather
  * than joined); equivalence property-tested in SpatialJoinSpec.
  * Shuffle is an equi-join on a short uniform key. Cell/bucket size
  * trades explode factor against candidate precision.
  */
object SpatialJoin {

  /** All (left, right) row pairs whose [w,s,e,n] boxes overlap.
    * Both inputs need the four named bbox columns; output carries all
    * columns of both sides (right's bbox columns suffixed `_r`).
    *
    * Duplicate elimination is by CANONICAL CELL, not distinct: a pair
    * is emitted only from the bottom-left-most cell of the overlap
    * region, which is unique per pair — preserves input-row
    * multiplicity and avoids a dedup shuffle entirely. */
  /** Validity bound for coordinates: generous enough for every real
    * longitude convention (±180, 0–360, ±360 wraps), tight enough to
    * reject sentinel garbage (NetCDF fill ~9.97e36). Cells are
    * computed on the RAW value, so 0–360-convention data joins
    * correctly against itself — only values beyond any convention
    * are treated as dirty. */
  private val COORD_BOUND = 400.0

  /** Cell index, total over dirty data: a coordinate outside
    * ±COORD_BOUND (NetCDF fill values ~9.97e36, NaN — NaN compares
    * greater than any double in Spark, so the range test catches it)
    * maps to NULL like a null coordinate, and the null sequence bound
    * makes explode drop the row. Clamping such rows into a boundary
    * cell instead would funnel every dirty row of a fill-value-heavy
    * corpus into ONE grid cell on both axes — a quadratic hot bucket
    * in the candidate join for pairs that are not well-formed boxes.
    * This differs from RewriteBboxOverlapJoin.cellIndex deliberately:
    * the optimizer rule transparently rewrites a user's theta join
    * and must preserve the raw predicate's answer even for fill-value
    * rows (fill <= fill is true), so it clamps; this helper is an
    * explicit API whose contract is "coordinates are degrees in some
    * wrap convention" and drops what can't be. */
  private def cellIdx(e: Column, cellDeg: Double): Column =
    when(e.isNull || e < lit(-COORD_BOUND) || e > lit(COORD_BOUND),
        lit(null).cast("int"))
      .otherwise(floor(e / cellDeg).cast("int"))

  def bboxOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      cellDeg: Double = 10.0): DataFrame = {
    def cellsOf(df: DataFrame, suffix: String): DataFrame = {
      val renamed = if (suffix.isEmpty) df else
        df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + suffix))
      def c(name: String): Column = col(name + suffix)
      renamed
        .withColumn("_cx" + suffix, explode(sequence(
          cellIdx(c("bbox_w"), cellDeg),
          cellIdx(c("bbox_e"), cellDeg))))
        .withColumn("_cy" + suffix, explode(sequence(
          cellIdx(c("bbox_s"), cellDeg),
          cellIdx(c("bbox_n"), cellDeg))))
    }
    val l = cellsOf(left, "")
    val r = cellsOf(right, "_r")
    l.join(r,
        col("_cx") === col("_cx_r") && col("_cy") === col("_cy_r"))
      .filter(col("bbox_w") <= col("bbox_e_r") &&
        col("bbox_w_r") <= col("bbox_e") &&
        col("bbox_s") <= col("bbox_n_r") &&
        col("bbox_s_r") <= col("bbox_n"))
      // canonical cell: bottom-left of the overlap region (same
      // domain-guarded index as candidate generation — rows that
      // reached here generated real cells, so these recomputed
      // indices are non-null and can't crash the cast)
      .filter(col("_cx") === greatest(
          cellIdx(col("bbox_w"), cellDeg),
          cellIdx(col("bbox_w_r"), cellDeg)) &&
        col("_cy") === greatest(
          cellIdx(col("bbox_s"), cellDeg),
          cellIdx(col("bbox_s_r"), cellDeg)))
      .drop("_cx", "_cy", "_cx_r", "_cy_r")
  }

  /** All (left, right) row pairs whose [start, end] intervals overlap.
    * Timestamp columns named start_ts/end_ts on both sides (right
    * suffixed `_r` in the output). bucket is a Spark interval unit for
    * date_trunc (e.g. "MONTH", "DAY"). */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      truncUnit: String = "MONTH"): DataFrame = {
    def bucketsOf(df: DataFrame, suffix: String): DataFrame = {
      val renamed = if (suffix.isEmpty) df else
        df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + suffix))
      val start = col("start_ts" + suffix)
      val end = col("end_ts" + suffix)
      // inverted intervals (start > end) are dirty data: Sequence with
      // a positive step would throw on them, so they generate no
      // buckets and the row is dropped (an inverted interval is not a
      // well-formed occupancy claim)
      renamed.withColumn("_bkt" + suffix, explode(
        when(start <= end, sequence(
          date_trunc(truncUnit, start),
          date_trunc(truncUnit, end),
          expr(s"INTERVAL 1 $truncUnit")))))
    }
    bucketsOf(left, "")
      .join(bucketsOf(right, "_r"), col("_bkt") === col("_bkt_r"))
      .filter(col("start_ts") <= col("end_ts_r") &&
        col("start_ts_r") <= col("end_ts"))
      // canonical bucket: first bucket of the overlap region
      .filter(col("_bkt") === greatest(
        date_trunc(truncUnit, col("start_ts")),
        date_trunc(truncUnit, col("start_ts_r"))))
      .drop("_bkt", "_bkt_r")
  }
}
