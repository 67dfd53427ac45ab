package graft.operators

import graft.SparkSpec
import graft.functions.QuantileSketchAgg
import graft.functions.QuantileSketchAgg._

/** DDSketch quantiles: the α relative-error bound against exact
  * quantiles, merge-order independence, graceful low-bucket collapse,
  * and the non-negative input contract. */
class QuantileSketchSpec extends SparkSpec {

  private def exactQuantile(sorted: Array[Double], q: Double): Double =
    sorted(math.max(0, math.ceil(q * sorted.length).toInt - 1))

  test("estimates stay within the alpha bound of exact quantiles") {
    import org.apache.spark.sql.functions._
    val vals = graft.Tables.orders(spark, sf)
      .select(col("o_totalprice")).collect().map(_.getDouble(0)).sorted
    val est = RelationalQueries.aggQuantileSketch(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(est == vals.length, "sketch counts every row")
    val s = new Sketch
    vals.foreach(v => update(s, v, ALPHA, MAX_BUCKETS))
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val ex = exactQuantile(vals, q)
      val e = quantile(s, q, ALPHA)
      assert(math.abs(e - ex) <= ALPHA * ex + 1e-9,
        s"q=$q est=$e exact=$ex")
    }
  }

  test("distributed result is identical across partitionings") {
    // deterministic bucket adds: under the bucket budget the sketch is
    // merge-order independent, so 1-partition and 13-partition runs
    // must agree EXACTLY (the same discipline as heavy hitters' exact
    // regime), not just within tolerance
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def run(parts: Int) = graft.Tables.orders(spark, sf)
      .repartition(parts)
      .select(col("o_orderstatus"), col("o_totalprice"))
      .as[(String, Double)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(QuantileSketchAgg.agg().toColumn.name("q"))
      .collect().sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("collapse keeps upper quantiles accurate when the budget is tiny") {
    // 5 decades of range into 64 buckets: the low tail collapses, the
    // p99 target keeps its alpha (collapsing folds LOWEST buckets)
    val vals = Array.tabulate(20000)(i => math.pow(10, 5.0 * i / 20000))
    val s = new Sketch
    vals.foreach(v => update(s, v, ALPHA, maxBuckets = 64))
    assert(s.buckets.size <= 64, s"budget violated: ${s.buckets.size}")
    val sorted = vals.sorted
    val ex = exactQuantile(sorted, 0.99)
    val e = quantile(s, 0.99, ALPHA)
    assert(math.abs(e - ex) <= ALPHA * ex + 1e-9, s"p99 est=$e exact=$ex")
  }

  test("fixture values keep clear of gamma^k bucket boundaries") {
    // The DuckDB oracle recomputes k = ceil(ln x / ln gamma) with its
    // own ln; a 1-ulp divergence from Math.log flips ceil exactly at a
    // boundary. Assert every fixture value's log-ratio sits a safe
    // relative distance from the nearest integer, so both engines
    // agree on every bucket regardless of ulp-level ln differences.
    import org.apache.spark.sql.functions._
    val lnG = math.log(gamma(ALPHA))
    val dists = graft.Tables.orders(spark, sf)
      .select(col("o_totalprice")).collect().map { r =>
        val frac = math.log(r.getDouble(0)) / lnG
        math.abs(frac - math.rint(frac))
      }
    assert(dists.min > 1e-9,
      s"a fixture value sits ${dists.min} from a bucket boundary — " +
        "the cross-engine ln oracle is no longer safe")
  }

  test("regime telemetry reports bucket count and zero count") {
    // the declared query asserts these via assert_true; pin the
    // telemetry itself so the assertion means what it claims
    val s = new Sketch
    Seq(0.0, 1e-12, 5.0, 50.0, 500.0).foreach(v => update(s, v, ALPHA, 16))
    val q = QuantileSketchAgg.agg(ALPHA, 16) match { case a =>
      a.finish(s)
    }
    assert(q.zero_count == 2 && q.n_buckets == 3 && q.n == 5)
  }

  test("zero bucket and input contract") {
    val s = new Sketch
    Seq(0.0, 1e-12, 5.0, 50.0).foreach(v => update(s, v, ALPHA, 16))
    assert(s.zeroCount == 2)
    assert(quantile(s, 0.25, ALPHA) == 0.0, "zero ranks report 0")
    intercept[IllegalArgumentException](update(s, -1.0, ALPHA, 16))
    intercept[IllegalArgumentException](update(s, Double.NaN, ALPHA, 16))
  }
}
