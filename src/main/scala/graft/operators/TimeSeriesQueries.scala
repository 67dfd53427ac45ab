package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Time-series regularization over the `events` table — the
  * resample-onto-a-grid and smoothing operators an observational
  * pipeline needs (the reference's domain is exactly this: irregular
  * in-situ ocean observations aligned onto a regular time grid,
  * `insitu…/recipe.py`'s time-axis handling; src_time_grid builds the
  * grid, these score data onto it).
  *
  * Scale design: both operators are per-key (user_id) linear passes —
  * sort-within-partition windows or a per-key array fold — so the
  * work partitions by key and no stage ever materializes anything
  * corpus-sized on one node. Keys are independent; 100× more keys is
  * 100× more partitions of the same per-key cost.
  */
object TimeSeriesQueries {

  /** ts_resample_interpolate — linear interpolation of each user's
    * irregular readings onto the daily UTC grid strictly inside that
    * user's observed span (pure interpolation; no extrapolated edge).
    *
    * Shape: union the observations with the generated grid points,
    * then ONE ascending and ONE descending running `last(ignoreNulls)`
    * window per user gives every grid point its bracketing readings —
    * two sorts per user partition, never a per-gridpoint join or a
    * range join. Tie discipline at a grid point that coincides with a
    * reading: the ascending pass orders readings BEFORE the grid row
    * (prev is inclusive, `pt <= g`), the descending pass orders the
    * grid row first (next is strictly later, `nt > g`), so the
    * denominator `nt - pt` is never zero. Duplicate (user, ts)
    * readings collapse to min(value) for determinism.
    */
  def tsResampleInterpolate(s: SparkSession, dir: String): DataFrame = {
    val obs = events(s, dir)
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("value")).as("value"))
    val grid = obs.groupBy(col("user_id"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      // single-day spans have no interior midnight (Spark's sequence
      // refuses start > stop; DuckDB's generate_series returns empty)
      .filter(date_add(to_date(col("t0")), 1) <= to_date(col("t1")))
      .select(col("user_id"), explode(sequence(
        date_add(to_date(col("t0")), 1).cast("timestamp"),
        to_date(col("t1")).cast("timestamp"),
        expr("interval 1 day"))).as("ts"))
    val rows = obs.select(col("user_id"), col("ts"), col("value"),
        lit(0).as("is_grid"))
      .unionByName(grid.select(col("user_id"), col("ts"),
        lit(null).cast("double").as("value"), lit(1).as("is_grid")))
    val wAsc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_grid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("is_grid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsTs = when(col("is_grid") === 0, col("ts"))
    rows
      .withColumn("pv", last(col("value"), ignoreNulls = true).over(wAsc))
      .withColumn("pt", last(obsTs, ignoreNulls = true).over(wAsc))
      .withColumn("nv", last(col("value"), ignoreNulls = true).over(wDesc))
      .withColumn("nt", last(obsTs, ignoreNulls = true).over(wDesc))
      .filter(col("is_grid") === 1 && col("pv").isNotNull &&
        col("nv").isNotNull)
      .select(col("user_id"), col("ts").as("grid_ts"),
        round(col("pv") + (col("nv") - col("pv")) *
          (unix_micros(col("ts")) - unix_micros(col("pt"))).cast("double") /
          (unix_micros(col("nt")) - unix_micros(col("pt"))).cast("double") +
          lit(1e-9), 6).as("v_interp"))
  }

  val tsResampleInterpolateSql: String =
    """WITH obs AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, min(value) AS value
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT user_id, min(ts) AS t0, max(ts) AS t1 FROM obs GROUP BY 1),
      |grid AS (
      |  SELECT user_id, g.ts FROM span,
      |  unnest(generate_series(
      |    CAST(CAST(t0 AS DATE) + 1 AS TIMESTAMP),
      |    CAST(CAST(t1 AS DATE) AS TIMESTAMP),
      |    INTERVAL 1 DAY)) AS g(ts)),
      |u AS (
      |  SELECT user_id, ts, value, 0 AS is_grid FROM obs
      |  UNION ALL
      |  SELECT user_id, ts, NULL, 1 FROM grid),
      |b AS (
      |  SELECT user_id, ts, is_grid,
      |    last_value(value IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts ASC, is_grid ASC
      |       ROWS UNBOUNDED PRECEDING) AS pv,
      |    last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts ASC, is_grid ASC
      |       ROWS UNBOUNDED PRECEDING) AS pt,
      |    last_value(value IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts DESC, is_grid DESC
      |       ROWS UNBOUNDED PRECEDING) AS nv,
      |    last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS) OVER
      |      (PARTITION BY user_id ORDER BY ts DESC, is_grid DESC
      |       ROWS UNBOUNDED PRECEDING) AS nt
      |  FROM u)
      |SELECT user_id, ts AS grid_ts,
      |  round(pv + (nv - pv) *
      |    CAST(epoch_us(ts) - epoch_us(pt) AS DOUBLE) /
      |    CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE) + 1e-9, 6) AS v_interp
      |FROM b
      |WHERE is_grid = 1 AND pv IS NOT NULL AND nv IS NOT NULL""".stripMargin

  /** ts_ewma — per-user exponentially weighted moving average of the
    * reading stream (α = 0.3, seeded at the first reading), one output
    * row per event. The recurrence is inherently sequential PER KEY,
    * so it runs as a per-key array fold: collect each user's readings,
    * sort once, and fold with the `aggregate` higher-order function —
    * codegen'd, no UDF, no driver loop, each key independent. The
    * identical `0.3·v + 0.7·p` double recurrence replays bit-exact in
    * the oracle's recursive CTE, so 6-dp rounding is cosmetic, not
    * tolerance.
    *
    * MEMORY BOUND (explicit — SCALE.md "Time series"): the fold
    * materializes one user's FULL sequence in one row, O(per-key
    * cardinality) task memory — fine for bounded keys (fixture
    * ≤100/user; ~10⁶/user ≈ 24 MB is still safe), a single-task OOM
    * at ~10⁸ events on one hot key. For unbounded per-key
    * cardinality use the O(1)-state streaming twin
    * [[graft.streaming.StreamingOps.ewmaStream]] (stream==batch
    * parity pinned in StreamingSpec). */
  def tsEwma(s: SparkSession, dir: String): DataFrame = {
    events(s, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        col("ts"), col("event_id"), col("value")))).as("seq"))
      .select(col("user_id"), explode(expr(
        """aggregate(
          |  seq,
          |  named_struct(
          |    'p', CAST(0.0 AS DOUBLE),
          |    'out', CAST(array() AS ARRAY<STRUCT<event_id: BIGINT,
          |                                        ewma: DOUBLE>>)),
          |  (acc, x) -> named_struct(
          |    'p', CASE WHEN size(acc.out) = 0 THEN x.value
          |              ELSE 0.3D * x.value + 0.7D * acc.p END,
          |    'out', concat(acc.out, array(named_struct(
          |      'event_id', x.event_id,
          |      'ewma', CASE WHEN size(acc.out) = 0 THEN x.value
          |                   ELSE 0.3D * x.value + 0.7D * acc.p END)))),
          |  acc -> acc.out)""".stripMargin)).as("e"))
      .select(col("user_id"), col("e.event_id").as("event_id"),
        round(col("e.ewma") + lit(1e-9), 6).as("ewma"))
  }

  val tsEwmaSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      |  FROM events),
      |r AS (
      |  SELECT user_id, event_id, rn, value, value AS ewma
      |  FROM e WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.event_id, e.rn, e.value,
      |    0.3 * e.value + 0.7 * r.ewma
      |  FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
      |SELECT user_id, event_id, round(ewma + 1e-9, 6) AS ewma
      |FROM r""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_resample_interpolate" -> (tsResampleInterpolate _),
    "ts_ewma" -> (tsEwma _)
  )

  def oracle: Map[String, String] = Map(
    "ts_resample_interpolate" -> tsResampleInterpolateSql,
    "ts_ewma" -> tsEwmaSql
  )
}
