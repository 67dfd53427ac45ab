package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-scenario pins for the time-series tier: interpolation
  * geometry (incl. the grid-coincides-with-a-reading tie and the
  * no-interior-midnight span) and the EWMA recurrence + ordering. */
class TimeSeriesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write a planted events.parquet with the fixture schema into a
    * temp dir so the (s, dir)-shaped operators run unmodified. */
  private def plantedDir(
      rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ts").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("interpolation hits the exact linear values between brackets") {
    // user 1: obs (Jan 1 12:00, 0.0) and (Jan 3 12:00, 2.0)
    //   grid Jan 2 00:00 -> 12h/48h = 0.5  -> 0.0 + 0.5*2? no: frac=0.25
    //   grid Jan 3 00:00 -> 36h/48h = 0.75 -> 1.5
    val dir = plantedDir(Seq(
      (1L, ts("2024-01-01 12:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-03 12:00:00"), 1L, "view", 2.0, "{}")))
    val got = TimeSeriesQueries.tsResampleInterpolate(spark, dir)
      .orderBy("grid_ts").collect()
      .map(r => (r.getTimestamp(1).toString, r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("2024-01-02 00:00:00.0", 0.5),
      ("2024-01-03 00:00:00.0", 1.5)))
  }

  test("a reading exactly on a grid point is returned verbatim") {
    val dir = plantedDir(Seq(
      (1L, ts("2024-01-01 06:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-02 00:00:00"), 1L, "view", 7.0, "{}"),
      (3L, ts("2024-01-03 06:00:00"), 1L, "view", 9.0, "{}")))
    val got = TimeSeriesQueries.tsResampleInterpolate(spark, dir)
      .orderBy("grid_ts").collect()
      .map(r => (r.getTimestamp(1).toString, r.getDouble(2)))
    // Jan 2 00:00 coincides with obs 7.0 (prev inclusive, frac 0);
    // Jan 3 00:00 interpolates 7.0 -> 9.0 at 24h/30h = 0.8 -> 8.6
    assert(got.toSeq == Seq(
      ("2024-01-02 00:00:00.0", 7.0),
      ("2024-01-03 00:00:00.0", 8.6)))
  }

  test("a single-day span produces no grid rows") {
    val dir = plantedDir(Seq(
      (1L, ts("2024-01-01 01:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 23:00:00"), 1L, "view", 2.0, "{}")))
    assert(TimeSeriesQueries.tsResampleInterpolate(spark, dir).count() == 0)
  }

  test("ewma replays the seeded recurrence in (ts, event_id) order") {
    // interleaved event_ids force the ts sort; two users independent
    val dir = plantedDir(Seq(
      (10L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0, "{}"),
      (5L, ts("2024-01-02 00:00:00"), 1L, "view", 2.0, "{}"),
      (7L, ts("2024-01-03 00:00:00"), 1L, "view", 3.0, "{}"),
      (1L, ts("2024-01-01 00:00:00"), 2L, "view", 10.0, "{}")))
    val got = TimeSeriesQueries.tsEwma(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 10L)) == 1.0)
    assert(math.abs(got((1L, 5L)) - 1.3) < 1e-6)
    assert(math.abs(got((1L, 7L)) - (0.3 * 3.0 + 0.7 * 1.3)) < 1e-6)
    assert(got((2L, 1L)) == 10.0)
  }
}
