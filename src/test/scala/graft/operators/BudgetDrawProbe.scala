package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 100×-scale probe of the two-pass budget draw (VERDICT r17 task 1's
  * measurement half): on the sf10 corpus (500k docs), the per-lang
  * draw run (a) as the r17 single-window form and (b) as the range
  * form, at two budget shapes —
  *
  *   - corpus-scale (half of each language's tokens — the real
  *     mixture-run shape): MANY ranges survive pruning, so the
  *     cumulative stage runs |langs|·R-ish parallel window
  *     partitions, each ~1/R of a language, instead of |langs|
  *     serial funnels;
  *   - gate-scale (LANG_BUDGET = 2500 tokens): pruning keeps ONE
  *     range per language — the window's input collapses to ~1/R of
  *     the corpus before any row shuffles.
  *
  * Prints one JSON line per budget with both wall-clocks, the
  * surviving window-partition count, the largest per-partition input,
  * and a kept-row parity check. Run:
  *
  *   sbt "Test/runMain graft.operators.BudgetDrawProbe /tmp/sf10"
  */
object BudgetDrawProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val prepared = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        SampleQueries.hashBucket(col("doc_id")).as("bucket"))
      .persist()
    val nDocs = prepared.count()
    val minLangTokens = prepared.groupBy(col("lang"))
      .agg(sum(col("n_tok")).as("t"))
      .agg(min(col("t"))).head().getLong(0)

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val order = Seq(col("bucket"), col("doc_id"))
    def windowForm(budget: Long): Long = {
      val w = Window.partitionBy(col("lang")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      prepared.withColumn("cum", sum(col("n_tok")).over(w))
        .filter(col("cum") - col("n_tok") < budget)
        .agg(count(lit(1)), sum(col("doc_id"))).head().getLong(0)
    }
    def rangeForm(budget: Long): Long =
      BudgetDraw.keptByBudget(prepared, Seq("lang"),
        BudgetDraw.bucketRange(col("bucket"),
          SampleQueries.HASH_BUCKETS), order, "n_tok", budget)
        .agg(count(lit(1)), sum(col("doc_id"))).head().getLong(0)

    for ((label, budget) <- Seq(
        ("corpus_scale", minLangTokens / 2),
        ("gate_scale", SampleQueries.LANG_BUDGET))) {
      windowForm(budget); rangeForm(budget) // rep 1 warms both paths
      val (tw, nw) = time(windowForm(budget))
      val (tr, nr) = time(rangeForm(budget))
      // the surviving window partitions + the largest one's input —
      // the same arithmetic keptByBudget prunes with
      val r = BudgetDraw.bucketRange(col("bucket"),
        SampleQueries.HASH_BUCKETS)
      val sums = prepared.groupBy(col("lang"), r.as("rng"))
        .agg(sum(col("n_tok")).as("s"), count(lit(1)).as("n"))
      val offs = sums.as("a").join(sums.as("b"),
          col("a.lang") === col("b.lang") &&
            col("b.rng") < col("a.rng"), "left")
        .groupBy(col("a.lang"), col("a.rng"), col("a.n"))
        .agg(coalesce(sum(col("b.s")), lit(0L)).as("off"))
        .filter(col("off") < budget)
      val surv = offs.count()
      val maxRows = offs.agg(max(col("a.n"))).head().getLong(0)
      println(s"""{"probe":"budget_draw","budget_shape":"$label",""" +
        s""""corpus_docs":$nDocs,"budget":$budget,""" +
        s""""window_form_s":${math.round(tw * 100) / 100.0},""" +
        s""""range_form_s":${math.round(tr * 100) / 100.0},""" +
        s""""kept_window":$nw,"kept_range":$nr,""" +
        s""""surviving_window_partitions":$surv,""" +
        s""""max_partition_input_rows":$maxRows}""")
      assert(nw == nr, s"$label: range form must keep identical rows")
    }
    spark.stop()
  }
}
