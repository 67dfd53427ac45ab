package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Window-function operators (SURVEY.md §2.5) — the Spark-native form
  * of several reference behaviors: last-write-wins upsert (`ToPgStac`
  * item replace, avhrr recipe.py:137), gap detection (the hand-built
  * missing list avhrr recipe.py:93-115 is the OUTPUT of this
  * analysis), and the STAC sortby+limit-per-collection surface.
  *
  * Scale notes: every window partitions on a real key (never a global
  * single-partition window except gap-detect, which partitions by day
  * first); window sort happens within the shuffle partition — one
  * exchange per query.
  */
object WindowQueries {

  /** win_dedup_rank — last-write-wins upsert: keep the newest row per
    * (user, type) key; total tiebreak (ts DESC, event_id DESC). */
  def winDedupRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
  }

  val winDedupRankSql: String =
    """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts
      |FROM (SELECT user_id, event_type, event_id, ts,
      |        row_number() OVER (PARTITION BY user_id, event_type
      |                           ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) WHERE rn = 1""".stripMargin

  /** win_gap_detect — find missing slots: gaps > 30 min between
    * consecutive events within a day (partition by day so the sort
    * never becomes a single-task global sort at scale). */
  def winGapDetect(s: SparkSession, dir: String): DataFrame = {
    val day = date_trunc("DAY", col("ts"))
    val w = Window.partitionBy(day).orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("prev_ts")))
      .filter(col("gap_us") > 30L * 60 * 1000000)
      .select(col("event_id"), col("prev_ts"), col("ts"), col("gap_us"))
  }

  val winGapDetectSql: String =
    """SELECT event_id, CAST(prev_ts AS TIMESTAMP) AS prev_ts,
      |  CAST(ts AS TIMESTAMP) AS ts,
      |  datediff('microseconds', CAST(prev_ts AS TIMESTAMP),
      |           CAST(ts AS TIMESTAMP)) AS gap_us
      |FROM (SELECT event_id, ts,
      |        lag(ts) OVER (PARTITION BY date_trunc('day', CAST(ts AS TIMESTAMP))
      |                      ORDER BY ts, event_id) AS prev_ts
      |      FROM events)
      |WHERE datediff('microseconds', CAST(prev_ts AS TIMESTAMP),
      |               CAST(ts AS TIMESTAMP)) > 30 * 60 * 1000000""".stripMargin

  /** win_topk_per_group — top-3 orders per customer by price
    * (STAC sortby+limit per collection); rank with total tiebreak. */
  def winTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        col("o_totalprice"))
  }

  val winTopkPerGroupSql: String =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |      FROM orders) WHERE rk <= 3""".stripMargin

  /** win_running — running sum per user over event time (identical
    * left-to-right accumulation order on both engines ⇒ bitwise-equal
    * doubles, rounded anyway). */
  def winRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("running_value", round(sum(col("value")).over(w), 2))
      .select(col("event_id"), col("user_id"), col("running_value"))
  }

  val winRunningSql: String =
    """SELECT event_id, user_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
      |FROM events""".stripMargin

  /** win_tumbling_batch — batch twin of the streaming tumbling window
    * (SURVEY §2.9): the SAME function body streaming runs
    * (StreamingOps.tumblingCounts), applied to a batch frame — the
    * batch/stream unification guarantee made executable. */
  def winTumblingBatch(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.tumblingCounts(events(s, dir))

  val winTumblingBatchSql: String =
    """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
      |    AS window_start,
      |  event_type, count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY 1, 2""".stripMargin

  /** win_sliding_batch — batch twin of the streaming sliding window
    * (1 h window / 15 min slide, §2.9 stream_sliding): same body as
    * the stream (StreamingOps.slidingCounts); each event lands in 4
    * epoch-aligned windows on both engines. */
  def winSlidingBatch(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.slidingCounts(events(s, dir))

  val winSlidingBatchSql: String =
    """WITH x AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |w AS (SELECT ts, value,
      |        time_bucket(INTERVAL '15 minutes', ts)
      |          - k * INTERVAL '15 minutes' AS ws
      |      FROM x, unnest([0,1,2,3]) t(k))
      |SELECT ws AS window_start, count(*) AS n,
      |  round(sum(value), 2) AS total
      |FROM w GROUP BY ws""".stripMargin

  /** win_session_batch — batch twin of the streaming session window
    * (30-min inactivity gap, §2.9 stream_session): the stream's own
    * sessionize body, minus session_end (not expressible in the
    * gaps-and-islands oracle without duplicating the gap constant). */
  def winSessionBatch(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.sessionize(events(s, dir))
      .drop("session_end")

  val winSessionBatchSql: String =
    """WITH o AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
      |      AS prev
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN prev IS NULL
      |      OR ts - prev >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM o),
      |s AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT min(ts) AS session_start, user_id,
      |  count(*) AS n_events, round(sum(value), 2) AS session_value
      |FROM s GROUP BY user_id, sid""".stripMargin

  /** agg_first_per_key — one representative row per key (idempotent
    * upsert semantics of ToPgStac; same window shape as dedup_rank but
    * declared as the §2.4 aggregate). */
  def aggFirstPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
  }

  val aggFirstPerKeySql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      |      FROM orders) WHERE rn = 1""".stripMargin

  /** win_anomaly — rolling z-score anomaly detection: each event
    * judged against ITS USER's trailing-50-event baseline (mean /
    * sample stddev over the preceding rows only — the event never
    * sees itself), flagged when the rounded |z| ≥ 2.5 with at least
    * 20 baseline events. The per-entity rolling baseline is the
    * standard ops/fraud monitoring shape.
    *
    * Scale shape: ONE window shuffle keyed user_id — entity
    * cardinality grows with the data, so partitions stay balanced at
    * 100 TB (keying by the 5-value event_type would serialize the
    * corpus through 5 partitions); the bounded ROWS frame keeps
    * per-row state O(50). z is rounded BEFORE thresholding on both
    * engines so the flag set can't diverge on a last-ulp boundary. */
  def winAnomaly(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-50, -1)
    events(s, dir)
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sd", stddev_samp(col("value")).over(w))
      .withColumn("n", count(col("value")).over(w))
      .filter(col("n") >= 20 && col("sd") > 0)
      .withColumn("z",
        round((col("value") - col("mu")) / col("sd") + lit(1e-9), 4))
      .filter(abs(col("z")) >= 2.5)
      .select(col("event_id"), col("user_id"), col("z"))
  }

  val winAnomalySql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events),
      |wd AS (
      |  SELECT event_id, user_id, value,
      |    avg(value) OVER w AS mu,
      |    stddev_samp(value) OVER w AS sd,
      |    count(value) OVER w AS n
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id,
      |  round((value - mu) / sd + 1e-9, 4) AS z
      |FROM wd WHERE n >= 20 AND sd > 0
      |  AND abs(round((value - mu) / sd + 1e-9, 4)) >= 2.5""".stripMargin

  /** win_topk_custom — win_topk_per_group through the CUSTOM physical
    * operator (plans.TopKPerGroup): two-phase bounded heaps instead
    * of a per-partition full sort, ≤ k rows per (group, partition)
    * through the exchange. Same answer as the window form — the
    * oracle IS the window SQL — on a plan with no Sort and no
    * WindowExec (TopKSpec asserts the shape). Ordering carries an
    * event_id tiebreak: a total order is what makes heap and window
    * agree on boundary rows. */
  def winTopkCustom(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    graft.plans.TopKPerGroup.topKPerGroup(
      events(s, dir).select(col("user_id"), col("event_id"), col("value")),
      keys = Seq("user_id"),
      orderBy = Seq(("value", false), ("event_id", true)),
      k = 3)
  }

  val winTopkCustomSql: String =
    """SELECT user_id, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY value DESC, event_id) AS rk
      |  FROM events) t WHERE rk <= 3""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_topk_custom" -> (winTopkCustom _),
    "win_anomaly" -> (winAnomaly _),
    "win_dedup_rank" -> (winDedupRank _),
    "win_gap_detect" -> (winGapDetect _),
    "win_topk_per_group" -> (winTopkPerGroup _),
    "win_running" -> (winRunning _),
    "win_tumbling_batch" -> (winTumblingBatch _),
    "win_sliding_batch" -> (winSlidingBatch _),
    "win_session_batch" -> (winSessionBatch _),
    "agg_first_per_key" -> (aggFirstPerKey _)
  )

  def oracle: Map[String, String] = Map(
    "win_topk_custom" -> winTopkCustomSql,
    "win_anomaly" -> winAnomalySql,
    "win_dedup_rank" -> winDedupRankSql,
    "win_gap_detect" -> winGapDetectSql,
    "win_topk_per_group" -> winTopkPerGroupSql,
    "win_running" -> winRunningSql,
    "win_tumbling_batch" -> winTumblingBatchSql,
    "win_sliding_batch" -> winSlidingBatchSql,
    "win_session_batch" -> winSessionBatchSql,
    "agg_first_per_key" -> aggFirstPerKeySql
  )
}
