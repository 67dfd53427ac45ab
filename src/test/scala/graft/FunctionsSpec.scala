package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.ArrayDot

class FunctionsSpec extends SparkSpec {

  test("array_dot codegen expression matches manual dot product") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -0.5), Seq(2.0, 2.0))
    ).toDF("a", "b")
      .select(ArrayDot.arrayDot(col("a"), col("b")).as("d"))
    val got = df.collect().map(_.getDouble(0))
    assert(got(0) == 32.0)
    assert(got(1) == 0.0)
  }

  test("array_dot rejects non-double arrays at analysis time") {
    import spark.implicits._
    val df = Seq((Seq("x"), Seq("y"))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(ArrayDot.arrayDot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("array_dot") ||
      ex.getMessage.toLowerCase.contains("type"))
  }

  test("GraftExtensions registers array_dot for SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }

  test("bbox union aggregator merges partial buffers correctly") {
    import spark.implicits._
    import graft.functions.BboxUnionAgg
    val boxes = Seq(
      (1L, BboxUnionAgg.Bbox(-10, -5, 0, 5)),
      (1L, BboxUnionAgg.Bbox(-2, -20, 8, 1)),
      (2L, BboxUnionAgg.Bbox(0, 0, 1, 1))
    ).toDS().repartition(3) // force partial+final merge
    val got = boxes.groupByKey(_._1).mapValues(_._2)
      .agg(BboxUnionAgg.agg.toColumn.name("u"))
      .collect().toMap
    assert(got(1L) == BboxUnionAgg.Bbox(-10, -20, 8, 5))
    assert(got(2L) == BboxUnionAgg.Bbox(0, 0, 1, 1))
  }
}
