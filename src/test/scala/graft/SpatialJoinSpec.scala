package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.geometry.SpatialJoin

/** Bucketed overlap joins == naive theta joins (SURVEY.md §5.2). */
class SpatialJoinSpec extends SparkSpec {

  private def boxes(n: Int, seed: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val w = rnd.nextDouble() * 300 - 150
      val s = rnd.nextDouble() * 140 - 70
      (i.toLong, w, s, w + rnd.nextDouble() * 35, s + rnd.nextDouble() * 25)
    }.toDF("id", "bbox_w", "bbox_s", "bbox_e", "bbox_n")
  }

  test("bbox bucketed join equals naive theta join") {
    val a = boxes(120, seed = 1)
    val b = boxes(80, seed = 2)
    val bucketed = SpatialJoin.bboxOverlapJoin(a, b)
      .select(col("id"), col("id_r")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.join(b.toDF(b.columns.map(_ + "_r").toIndexedSeq: _*),
        col("bbox_w") <= col("bbox_e_r") && col("bbox_w_r") <= col("bbox_e") &&
        col("bbox_s") <= col("bbox_n_r") && col("bbox_s_r") <= col("bbox_n"))
      .select(col("id"), col("id_r")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "random boxes must overlap sometimes")
    assert(bucketed == naive,
      s"bucketed ${bucketed.size} pairs vs naive ${naive.size}")
  }

  test("interval bucketed join equals naive theta join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def intervals(n: Int): DataFrame =
      (0 until n).map { i =>
        val start = 1640995200L + rnd.nextInt(180 * 24 * 3600).toLong
        (i.toLong, new java.sql.Timestamp(start * 1000),
          new java.sql.Timestamp((start + rnd.nextInt(40 * 24 * 3600)) * 1000))
      }.toDF("id", "start_ts", "end_ts")
    val a = intervals(60)
    val b = intervals(40)
    val bucketed = SpatialJoin.intervalOverlapJoin(a, b)
      .select(col("id"), col("id_r")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.join(b.toDF("id_r", "start_ts_r", "end_ts_r"),
        col("start_ts") <= col("end_ts_r") &&
          col("start_ts_r") <= col("end_ts"))
      .select(col("id"), col("id_r")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    assert(bucketed == naive,
      s"bucketed ${bucketed.size} pairs vs naive ${naive.size}")
  }

  test("bbox join survives NetCDF fill values, NaN and null bounds") {
    import spark.implicits._
    val dirty = Seq(
      (1L, 9.969209968386869e36, 9.969209968386869e36,
        9.969209968386869e36, 9.969209968386869e36), // fill value
      (2L, Double.NaN, Double.NaN, Double.NaN, Double.NaN),
      (3L, -20.0, -10.0, 20.0, 10.0), // one clean box
      (5L, 200.0, -10.0, 220.0, 10.0) // 0-360 longitude convention
    ).toDF("id", "bbox_w", "bbox_s", "bbox_e", "bbox_n")
      .union(Seq((4L, null, null, null, null))
        .toDF("id", "bbox_w", "bbox_s", "bbox_e", "bbox_n")
        .select(col("id"), col("bbox_w").cast("double"),
          col("bbox_s").cast("double"), col("bbox_e").cast("double"),
          col("bbox_n").cast("double")))
    val clean = Seq(
      (10L, -5.0, -5.0, 5.0, 5.0),
      (11L, 210.0, -5.0, 230.0, 5.0) // 0-360 convention, overlaps id 5
    ).toDF("id", "bbox_w", "bbox_s", "bbox_e", "bbox_n")
    // must not crash under ANSI mode; the clean pair must be found,
    // 0-360-convention coordinates (≤ the ±400 validity bound) still
    // join on their real cells, and fill-value / NaN / null rows are
    // dropped as not-well-formed boxes (out-of-domain coords map to a
    // null cell) rather than funneled into one boundary cell as a
    // quadratic hot bucket
    val got = SpatialJoin.bboxOverlapJoin(dirty, clean)
      .select(col("id"), col("id_r")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 10L), (5L, 11L)))
  }

  test("interval join drops inverted and null intervals without error") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dirty = Seq(
      (1L, ts("2022-03-10 00:00:00"), ts("2022-01-01 00:00:00")), // inverted
      (2L, ts("2022-02-01 00:00:00"), ts("2022-02-20 00:00:00"))  // clean
    ).toDF("id", "start_ts", "end_ts")
      .union(Seq((3L, None: Option[java.sql.Timestamp],
        None: Option[java.sql.Timestamp])).toDF("id", "start_ts", "end_ts"))
    val other = Seq((10L, ts("2022-02-05 00:00:00"), ts("2022-02-10 00:00:00")))
      .toDF("id", "start_ts", "end_ts")
    val got = SpatialJoin.intervalOverlapJoin(dirty, other)
      .select(col("id"), col("id_r")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 10L)))
  }
}
