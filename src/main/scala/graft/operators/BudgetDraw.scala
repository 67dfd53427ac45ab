package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed token-budget draw — the scale path of the
  * cumulative-admission rule shared by sample_token_budget,
  * pipeline_dsir_select, pipeline_build_mixture and
  * pipeline_curriculum (VERDICT r17 finding #1).
  *
  * The admission rule is a running sum over a TOTAL order: a doc is
  * kept iff the tokens before it (in hash-bucket or score order)
  * leave budget. Expressed as one unpartitioned (or per-language)
  * window, Spark funnels the whole corpus through a single reducer —
  * the WindowExec "moving all data to a single partition" plan that
  * is correct at sf0.1 and a scale-killer at 100 TB.
  *
  * This kernel computes the identical running sum as a TWO-PASS
  * distributed prefix sum over order-consistent ranges (the
  * sort_range_partition discipline, RelationalQueries.scala):
  *
  *   1. every row gets a range id `r` that RESPECTS the draw order
  *      (order(x) < order(y) ⇒ r(x) ≤ r(y) within a group);
  *   2. pass 1 aggregates per-(group, range) token sums map-side —
  *      a |groups|·R-row table — and a triangular self-join on that
  *      tiny table yields each range's global offset (the prefix sum
  *      of all earlier ranges);
  *   3. ranges whose offset already meets the budget are PRUNED
  *      (off ≥ budget ⇒ no row in the range can be admitted, since
  *      cum − n_tok ≥ off), so pass 2's per-range cumulative window
  *      shuffles only the budget-reachable slice of the corpus;
  *   4. pass 2 broadcast-joins the offset row back and runs the
  *      cumulative window PARTITIONED BY (group, range): global
  *      cum = range offset + local cumsum — bit-identical to the
  *      single window by associativity of +.
  *
  * Scale shape: two narrow corpus scans (pass 1 projects only
  * (group, range, n_tok)), one tiny triangular join, one broadcast,
  * and a window whose partitions number |groups|·R instead of
  * |groups| — and whose INPUT is only the ranges the budget can
  * reach. Bit-for-bit equality with the window form is pinned by
  * BudgetDrawSpec; the gate oracles are unchanged.
  */
object BudgetDraw {

  /** Ranges per group. 32 matches the local[32] lane count; a 100 TB
    * run raises it to corpus/partition-size — correctness is
    * range-count-invariant (the spec pins R ∈ {1, 3, 32}). */
  private[operators] val BUDGET_RANGES = 32

  /** Deterministic boundary-sample size (the sort_range_partition
    * sample discipline — smallest xxhash64 over the row key). */
  private[operators] val BUDGET_SAMPLE = 1024

  /** The two-pass draw. Keeps exactly the rows the single-window
    * form `sum(tok) over (partition by group order by order)` admits
    * with `cum − tok < budget`; returns the input columns unchanged.
    *
    * `rangeId` must be order-consistent with `orderCols` inside each
    * group (rows ordered earlier land in the same or an earlier
    * range). [[bucketRange]] / [[keyRangeBounds]] build such ids.
    */
  private[graft] def keptByBudget(
      df: DataFrame,
      groupCols: Seq[String],
      rangeId: Column,
      orderCols: Seq[Column],
      tokCol: String,
      budget: Long): DataFrame = {
    val gCols = groupCols.map(col)
    // NOTE the draw reads `df` TWICE by construction (pass 1 sums,
    // pass 2 window): callers whose input is an expensive chain
    // materialize it themselves (curriculum checkpoints its decile
    // frame, DSIR persists its keyed frame) — an input checkpoint
    // HERE was tried and reverted: it either leaks blocks until a
    // driver GC (CurationSpec's cache-hygiene bar) or, released via
    // an eager output checkpoint, hides the draw's partitioned
    // windows from the static plan scanners that pin the r17
    // single-partition finding as fixed.
    val withR = df.withColumn("__r", rangeId)
    // pass 1: per-(group, range) token sums — map-side combined,
    // |groups|·R rows total
    val sums = withR
      .groupBy(gCols :+ col("__r"): _*)
      .agg(sum(col(tokCol)).as("__s"))
    // triangular prefix on the tiny table: offset(range) = Σ sums of
    // strictly-earlier ranges in the same group (a broadcast
    // nested-loop/hash join over ≤ |groups|·R rows — no window, so
    // no single-partition WindowExec anywhere in the plan)
    val right = groupCols
      .foldLeft(sums
        .withColumnRenamed("__r", "__br")
        .withColumnRenamed("__s", "__bs")) {
        case (d, c) => d.withColumnRenamed(c, s"__b_$c")
      }
    val joinCond = groupCols
      .map(c => col(c) === col(s"__b_$c"))
      .foldLeft(col("__br") < col("__r"))(_ && _)
    val offs = sums.join(broadcast(right), joinCond, "left")
      .groupBy(gCols :+ col("__r"): _*)
      .agg(coalesce(sum(col("__bs")), lit(0L)).as("__off"))
      // budget pruning: a range whose offset meets the budget admits
      // nothing — the inner join below then drops its rows map-side,
      // so the window's input is budget-reachable ranges only
      .filter(col("__off") < budget)
    // pass 2: local cumsum per (group, range) + the broadcast offset
    val w = Window
      .partitionBy(gCols :+ col("__r"): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withR
      .join(broadcast(offs), groupCols :+ "__r")
      .withColumn("__cum", col("__off") + sum(col(tokCol)).over(w))
      .filter(col("__cum") - col(tokCol) < budget)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Order-consistent range id for a draw ordered by a hash bucket
    * in [0, `mod`): equal-width bucket intervals (hash buckets are
    * uniform by construction, so the ranges balance without a
    * sample). */
  private[graft] def bucketRange(bucket: Column,
      mod: Int, ranges: Int = BUDGET_RANGES): Column =
    ((bucket * ranges) / mod).cast("int")

  /** Deterministic DESC-order boundary keys for a draw ordered by a
    * double-valued score: the `key` order statistics of the
    * BUDGET_SAMPLE rows with the smallest xxhash64 over `idCol` (a
    * total order — identical on every run, cluster layout, and
    * partitioning; the sort_range_partition sample). Empty when the
    * frame is smaller than the sample stride (single range). */
  private[graft] def keyRangeBounds(df: DataFrame,
      idCol: String, keyCol: String,
      ranges: Int = BUDGET_RANGES): Seq[Double] = {
    val sample = df
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(BUDGET_SAMPLE)
      .select(col(keyCol))
      .collect().map(_.getDouble(0))
      .sorted(Ordering[Double].reverse)
    val step = sample.length / ranges
    if (step == 0) Seq.empty
    else (1 until ranges).map(i => sample(i * step - 1))
  }

  /** Range id from DESC boundaries: #boundaries strictly above the
    * key — ties on `key` land in one range, so the id is
    * order-consistent for (key DESC, id) orders. */
  private[graft] def descKeyRange(key: Column,
      bounds: Seq[Double]): Column =
    if (bounds.isEmpty) lit(0)
    else size(filter(typedLit(bounds), b => b > key))
}
