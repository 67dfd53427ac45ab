package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ArrayDotProduct

/** Session extensions (SURVEY.md §4.2): registers the engine's custom
  * Catalyst expressions into the SQL function registry so
  * `spark.sql("SELECT array_dot(a, b)")` works alongside the Column
  * API. Install with:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      GraftExtensions.arrayDotBuilder))
    ext.injectFunction((
      new FunctionIdentifier("bbox_overlaps"),
      new ExpressionInfo(
        classOf[graft.plans.BboxOverlaps].getName, "bbox_overlaps"),
      GraftExtensions.bboxOverlapsBuilder))
    // the single custom optimizer rule: bbox_overlaps joins → bucketed
    ext.injectOptimizerRule(_ => graft.plans.RewriteBboxOverlapJoin)
  }
}

object GraftExtensions {
  private val arrayDotBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "array_dot takes exactly 2 arguments")
    ArrayDotProduct(children.head, children(1))
  }

  private val bboxOverlapsBuilder: Seq[Expression] => Expression =
    children => graft.plans.BboxOverlaps.coerced(children)

  /** Register the engine functions + optimizer rule into an
    * already-running session (extensions proper can only be installed
    * at session build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graftbridge.GraftExpr
      .registerFunction(spark, "array_dot", arrayDotBuilder)
    org.apache.spark.sql.graftbridge.GraftExpr
      .registerFunction(spark, "bbox_overlaps", bboxOverlapsBuilder)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RewriteBboxOverlapJoin)) {
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.RewriteBboxOverlapJoin)
    }
  }
}
