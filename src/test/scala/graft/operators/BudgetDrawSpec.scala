package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BudgetDraw — the two-pass distributed prefix-sum budget draw
  * (VERDICT r17 task 1). The oracle gates pin the VALUES of the four
  * budget qids; this spec pins what they can't: bit-for-bit parity
  * between the range form and the single-window form on skewed and
  * tied inputs, invariance to the range count and input partitioning,
  * and that every window in the new plans carries a partition spec
  * (no single-partition WindowExec anywhere). */
class BudgetDrawSpec extends SparkSpec {
  import spark.implicits._

  /** The single-window reference form (the r17 plan). */
  private def windowForm(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column],
      tok: String, budget: Long): DataFrame = {
    val base =
      if (groupCols.isEmpty) Window.orderBy(orderCols: _*)
      else Window.partitionBy(groupCols.map(col): _*)
        .orderBy(orderCols: _*)
    val w = base.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    df.withColumn("__cum", sum(col(tok)).over(w))
      .filter(col("__cum") - col(tok) < budget)
      .drop("__cum")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** 5k-row skewed corpus: 90% of rows in one language, token
    * lengths and buckets from deterministic hash arithmetic. */
  private lazy val skewed = spark.range(5000)
    .select(col("id").as("doc_id"),
      when(col("id") % 10 < 9, lit("en"))
        .otherwise(concat(lit("l"), col("id") % 3)).as("lang"),
      (pmod(xxhash64(col("id")), lit(49)) + 1).cast("long").as("n_tok"),
      SampleQueries.hashBucket(col("id")).as("bucket"))
    .cache()

  test("per-lang bucket draw: range form == window form bit-for-bit " +
      "on a 90%-skewed corpus, at R in {1, 3, 32}, at budgets tiny " +
      "(1), binding (5000), and unbounded (10^9)") {
    val order = Seq(col("bucket"), col("doc_id"))
    for (budget <- Seq(1L, 5000L, 1000000000L); r <- Seq(1, 3, 32)) {
      val want = rows(windowForm(skewed, Seq("lang"), order,
        "n_tok", budget))
      val got = rows(BudgetDraw.keptByBudget(skewed, Seq("lang"),
        BudgetDraw.bucketRange(col("bucket"),
          SampleQueries.HASH_BUCKETS, r),
        order, "n_tok", budget))
      assert(got == want, s"budget=$budget R=$r: range form diverges " +
        s"(${got.size} vs ${want.size} rows)")
      assert(budget == 1L || got.nonEmpty)
    }
  }

  test("global desc-key draw (the DSIR shape): range form == window " +
      "form with TIED keys, and the sampled boundaries are " +
      "partition-layout-invariant") {
    // keys tie heavily (50 distinct values over 5k rows) — the exact
    // case where a boundary must not split an equivalence class
    val keyed = skewed.select(col("doc_id"), col("n_tok"),
      round(pmod(xxhash64(col("doc_id") + 7), lit(50)) / 10.0, 1)
        .as("key")).cache()
    val order = Seq(col("key").desc, col("doc_id"))
    val bounds = BudgetDraw.keyRangeBounds(keyed, "doc_id", "key")
    assert(bounds.nonEmpty && bounds == bounds.sorted.reverse,
      "boundaries must be DESC-ordered")
    val b2 = BudgetDraw.keyRangeBounds(keyed.repartition(13),
      "doc_id", "key")
    assert(bounds == b2, "boundary sample must not depend on layout")
    for (budget <- Seq(1L, 4000L, 1000000000L)) {
      val want = rows(windowForm(keyed, Seq.empty, order,
        "n_tok", budget))
      val got = rows(BudgetDraw.keptByBudget(keyed, Seq.empty,
        BudgetDraw.descKeyRange(col("key"), bounds),
        order, "n_tok", budget))
      assert(got == want, s"budget=$budget: desc-key range form " +
        s"diverges (${got.size} vs ${want.size} rows)")
    }
    keyed.unpersist()
  }

  test("the production seams match their window replay on the gate " +
      "corpus, and the draw is input-partitioning-invariant") {
    val docs = graft.Tables.documents(spark, sf)
    val prepared = docs.select(col("lang"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      SampleQueries.hashBucket(col("doc_id")).as("bucket"))
    val want = rows(windowForm(prepared, Seq("lang"),
      Seq(col("bucket"), col("doc_id")), "n_tok",
      SampleQueries.LANG_BUDGET))
    assert(rows(SampleQueries.tokenBudgetKeptFrom(docs)) == want)
    assert(rows(SampleQueries.tokenBudgetKeptFrom(
      docs.repartition(11))) == want,
      "draw must be invariant to input partitioning")
  }

  test("no unpartitioned window survives in the budget-draw plans " +
      "(the r17 single-partition WindowExec finding)") {
    def winSpecs(df: DataFrame): Seq[Int] =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.partitionSpec.size
      }
    val draw = BudgetDraw.keptByBudget(skewed, Seq("lang"),
      BudgetDraw.bucketRange(col("bucket"),
        SampleQueries.HASH_BUCKETS), Seq(col("bucket"), col("doc_id")),
      "n_tok", 5000L)
    val specs = winSpecs(draw)
    assert(specs.nonEmpty && specs.forall(_ >= 2),
      s"every window must partition by (group, range): $specs")
    val seam = winSpecs(SampleQueries.tokenBudgetKeptFrom(
      graft.Tables.documents(spark, sf)))
    assert(seam.nonEmpty && seam.forall(_ >= 2), seam)
    // the global desc-key shape still partitions by its range id
    val bounds = BudgetDraw.keyRangeBounds(
      skewed.select(col("doc_id"), col("n_tok"),
        col("bucket").cast("double").as("key")), "doc_id", "key")
    val g = winSpecs(BudgetDraw.keptByBudget(
      skewed.select(col("doc_id"), col("n_tok"),
        col("bucket").cast("double").as("key")),
      Seq.empty, BudgetDraw.descKeyRange(col("key"), bounds),
      Seq(col("key").desc, col("doc_id")), "n_tok", 4000L))
    assert(g.nonEmpty && g.forall(_ >= 1),
      s"the groupless draw must still partition by range: $g")
  }
}
