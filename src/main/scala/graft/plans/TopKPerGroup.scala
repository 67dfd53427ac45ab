package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY §2.10 ladder rung c): top-k per
  * group as a custom LogicalPlan + SparkStrategy + SparkPlan, planned
  * as a TWO-PHASE physical operator:
  *
  *   TopKPerGroupExec(final)   — exact top-k, groups co-located
  *     └ Exchange(hash on keys)         [inserted by EnsureRequirements]
  *        └ TopKPerGroupExec(partial) — bounded heaps BEFORE the shuffle
  *
  * Why not a window? `row_number().over(partitionBy(g).orderBy(o))
  * <= k` SORTS every partition in full and shuffles EVERY row. The
  * heap operator keeps O(groups × k) state per task and ships at most
  * k rows per (group, input-partition) through the exchange — on a
  * 100 TB corpus with small k the shuffle shrinks by orders of
  * magnitude, the same reason TakeOrderedAndProject beats global
  * Sort+Limit. No codegen (heap maintenance is data-dependent), but
  * the operator sits between two codegen'd stages and its input is
  * already a tight UnsafeRow stream.
  *
  * Determinism: callers MUST pass a total order (tiebreak the
  * ordering) — equal-rank boundary rows are otherwise
  * partition-order-dependent, exactly as with the window form.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroup = copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // the partial phase runs wherever the data already is; the final
  // phase needs each group wholly in one partition
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    // bind plan fields to locals BEFORE building the closure — a
    // lambda referencing `groupExprs`/`child` directly captures `this`
    // (the whole physical subtree) and serializes it into every task,
    // the same capture hazard Spark's own exec nodes avoid
    val ge = groupExprs
    val childOutput = child.output
    val ord = new LazilyGeneratedOrdering(order, childOutput)
    val kk = k
    child.execute().mapPartitions({ rows =>
      val proj = UnsafeProjection.create(ge, childOutput)
      // per-group bounded heap: head = WORST kept row (reverse order),
      // so a better row evicts the head in O(log k)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      rows.foreach { row =>
        val key = proj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // cap the INITIAL capacity: k can legitimately exceed every
          // group (returns whole groups), and preallocating a
          // k-element array per group would burn heap for nothing
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(kk, 16), ord.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val it = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var cur: java.util.Iterator[InternalRow] = _
        override def hasNext: Boolean = {
          while ((cur == null || !cur.hasNext) && it.hasNext)
            cur = it.next().iterator()
          cur != null && cur.hasNext
        }
        override def next(): InternalRow = cur.next()
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupExec = copy(child = newChild)
}

object TopKPerGroup {
  import org.apache.spark.sql.graftbridge.GraftExpr

  /** Column API: exact top-k rows per group under (col, asc) order —
    * pass a TOTAL order (include a tiebreak column). The session must
    * have TopKPerGroupStrategy installed (GraftExtensions does). */
  def topKPerGroup(
      df: DataFrame,
      keys: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val child = GraftExpr.analyzed(df)
    def attr(n: String): Attribute = child.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column '$n' not in ${child.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftExpr.ofRows(df.sparkSession,
      TopKPerGroup(keys.map(attr), order, k, child))
  }
}
