package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.GraftExpr
import org.apache.spark.sql.types.DoubleType

/** Marker predicate for spatial joins (SURVEY.md §4.2's single
  * budgeted custom rule): `bbox_overlaps(w1,s1,e1,n1, w2,s2,e2,n2)`
  * is the STAC/PostGIS `&&` box-overlap test.
  *
  * Used as a join condition it evaluates correctly on its own (the
  * fallback is the plain conjunction — a nested-loop join), but
  * RewriteBboxOverlapJoin recognizes it during optimization and
  * rewrites the enclosing join into the grid-cell-bucketed equi-join,
  * which is the 100 TB plan. Users write the natural predicate; the
  * planner picks the scalable join.
  */
case class BboxOverlaps(children: Seq[Expression])
    extends Predicate with CodegenFallback {

  require(children.length == 8,
    "bbox_overlaps(w1, s1, e1, n1, w2, s2, e2, n2)")

  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bbox_overlaps requires 8 DOUBLE arguments")

  override def eval(input: InternalRow): Any = {
    val v = children.map(_.eval(input))
    if (v.contains(null)) null
    else {
      val Seq(w1, s1, e1, n1, w2, s2, e2, n2) =
        v.map(_.asInstanceOf[Double])
      // java.lang.Double.compare ordering (NaN greater than all) —
      // the same total order Spark SQL comparisons use, so the
      // fallback agrees with the rewritten residual filter on NaN
      def le(a: Double, b: Double) = java.lang.Double.compare(a, b) <= 0
      le(w1, e2) && le(w2, e1) && le(s1, n2) && le(s2, n1)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BboxOverlaps =
    copy(children = newChildren)
}

object BboxOverlaps {
  /** Wrap every argument in a double cast so integer/float inputs
    * coerce instead of failing type-check (Cast(double→double) folds
    * away); keeps the cellIndex invariant the rewrite relies on. */
  def coerced(children: Seq[Expression]): BboxOverlaps =
    BboxOverlaps(children.map(c =>
      org.apache.spark.sql.catalyst.expressions.Cast(c, DoubleType)))

  /** Column API: the natural spatial-overlap predicate. */
  def bboxOverlaps(
      w1: Column, s1: Column, e1: Column, n1: Column,
      w2: Column, s2: Column, e2: Column, n2: Column): Column =
    GraftExpr.toColumn(coerced(
      Seq(w1, s1, e1, n1, w2, s2, e2, n2).map(GraftExpr.toExpr)))
}
