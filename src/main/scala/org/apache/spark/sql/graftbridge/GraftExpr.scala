package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters
  * `private[sql]` (they live behind the Connect/Classic split), so
  * custom Catalyst expressions need this one-file shim inside the
  * org.apache.spark.sql namespace — the standard extension-library
  * pattern.
  */
object GraftExpr {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a LogicalPlan (Dataset.ofRows is private[sql]) —
    * needed to hand a custom logical operator to the planner. */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Release a localCheckpoint'ed frame's blocks NOW. Dataset
    * .unpersist() only uncaches CacheManager entries, so it is a
    * silent no-op on checkpoint RDDs (their blocks otherwise live
    * until a driver GC lets the ContextCleaner reclaim them) —
    * iterative loops that stack K checkpoints need the real
    * release. Safe only once nothing will read the frame again:
    * a localCheckpoint's blocks ARE its data. */
  def releaseLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Install an extra planner strategy into a RUNNING session. */
  def addStrategy(
      spark: org.apache.spark.sql.SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy))
      cs.experimental.extraStrategies ++= Seq(strategy)
  }

  /** Runtime registration into an EXISTING session's function registry
    * (SparkSessionExtensions only applies at session build time). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
