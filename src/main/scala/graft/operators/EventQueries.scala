package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Event-sequence analytics over the `events` table — the funnel and
  * cohort queries run over interaction logs (and, in a training-data
  * pipeline, over ingest/annotation event streams).
  */
object EventQueries {

  /** win_funnel — strict-order funnel: how many users signed up, then
    * clicked AFTER signing up, then purchased AFTER that click. Each
    * stage is one filtered min-ts agg keyed by user joined to the
    * previous stage — all equi-joins on user_id (co-partitioned, no
    * broadcast needed at scale), never a window over the event log.
    * Stage frames shrink monotonically, so later stages are cheap. */
  def winFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def stage(df: DataFrame, idx: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).cast("long").as("stage"), lit(name).as("event_type"),
          col("n_users"))
    stage(s1, 1, "signup")
      .unionAll(stage(s2, 2, "click"))
      .unionAll(stage(s3, 3, "purchase"))
  }

  val winFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events),
      |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1
      |       GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |       GROUP BY e.user_id)
      |SELECT 1 AS stage, 'signup' AS event_type,
      |  (SELECT count(*) FROM s1) AS n_users
      |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin

  /** agg_retention — weekly cohort retention: users grouped by the
    * week of their first event, counted as retained in every later
    * week they reappear. Two hash aggs (first-event per user; distinct
    * users per cohort×offset cell) and one user-keyed equi-join; the
    * output is |weeks|² cells regardless of corpus size. */
  def aggRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val first = ev.groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort"))
    ev.select(col("user_id"), to_date(date_trunc("week", col("ts")))
        .as("wk"))
      .join(first, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("long")
          .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(col("cohort").cast("string").as("cohort"),
        col("week_offset"), col("n_users"))
  }

  val aggRetentionSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |first AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      |  FROM e GROUP BY user_id)
      |SELECT CAST(f.cohort AS VARCHAR) AS cohort,
      |  CAST(date_diff('day', f.cohort,
      |    CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT)
      |    AS week_offset,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM e JOIN first f ON e.user_id = f.user_id
      |GROUP BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_funnel" -> (winFunnel _),
    "agg_retention" -> (aggRetention _)
  )

  def oracle: Map[String, String] = Map(
    "win_funnel" -> winFunnelSql,
    "agg_retention" -> aggRetentionSql
  )
}
