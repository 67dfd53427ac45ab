package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

/** The custom two-phase heap top-k must return exactly the window
  * form's rows on a plan with no Sort and no Window. */
class TopKSpec extends SparkSpec {

  private def run(k: Int) = {
    GraftExtensions.register(spark)
    TopKPerGroup.topKPerGroup(
      Tables.events(spark, sf)
        .select(col("user_id"), col("event_id"), col("value")),
      keys = Seq("user_id"),
      orderBy = Seq(("value", false), ("event_id", true)),
      k = k)
  }

  test("heap top-k equals the window top-k exactly") {
    val got = run(3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val want = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).drop("rk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("plan: two heap phases, one exchange, no sort, no window") {
    // string-match: AdaptiveSparkPlanExec hides the inner plan from
    // TreeNode.collect until execution
    val str = run(3).queryExecution.executedPlan.toString
    assert(str.sliding("TopKPerGroup".length)
      .count(_ == "TopKPerGroup") == 2, str)
    assert(str.contains("3, true") && str.contains("3, false"),
      s"one partial and one final phase:\n$str")
    assert(!str.contains("WindowExec") && !str.contains("Window("), str)
    assert(!str.contains("Sort "), s"no sort anywhere:\n$str")
    assert(str.sliding("Exchange".length).count(_ == "Exchange") == 1, str)
  }

  test("k larger than every group returns all rows") {
    val n = Tables.events(spark, sf).count()
    assert(run(1000000).count() == n)
  }

  test("randomized: heap equals window over seeded datasets and ks") {
    import spark.implicits._
    GraftExtensions.register(spark)
    for (seed <- Seq(1L, 7L, 42L); k <- Seq(1, 2, 5)) {
      val rnd = new scala.util.Random(seed)
      // skewed groups, duplicate values, negative values
      val rows = (0 until 500).map { i =>
        (rnd.nextInt(7).toLong, i.toLong,
          math.floor(rnd.nextGaussian() * 3) / 2)
      }
      val df = rows.toDF("g", "id", "v")
      val got = TopKPerGroup.topKPerGroup(df, Seq("g"),
        Seq(("v", false), ("id", true)), k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val want = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k).drop("rk")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"seed=$seed k=$k")
    }
  }

  test("duplicate order values resolve by the tiebreak, not partitioning") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 5.0),
      (2L, 20L, 1.0)
    ).toDF("user_id", "event_id", "value")
    GraftExtensions.register(spark)
    val a = TopKPerGroup.topKPerGroup(df, Seq("user_id"),
      Seq(("value", false), ("event_id", true)), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = TopKPerGroup.topKPerGroup(df.repartition(7), Seq("user_id"),
      Seq(("value", false), ("event_id", true)), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == Set((1L, 10L), (1L, 11L), (2L, 20L)))
    assert(b == a, "result must not depend on input partitioning")
  }
}
