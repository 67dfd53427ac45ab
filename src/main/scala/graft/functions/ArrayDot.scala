package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftExpr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path: dot product
  * of two ARRAY<DOUBLE> columns with full whole-stage codegen — a
  * tight primitive loop with no per-element boxing, no lambda
  * dispatch, no intermediate array allocation. Replaces the
  * interpreted `aggregate(zip_with(...))` composition, which allocates
  * a zipped array and evaluates a lambda per element (~10× slower on
  * 64-dim vectors, measured at sf0.1).
  *
  * Accumulation is sequential left-to-right in double — the exact
  * order DuckDB's list_cosine_similarity uses — so oracle parity is
  * bitwise, not just approximate.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires ARRAY<DOUBLE> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  // null on length mismatch (dimension drift must not produce a
  // plausible-but-wrong score) ⇒ result is nullable regardless of
  // children
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) {
        // a null ELEMENT must null the result (the interpreted
        // zip_with composition and DuckDB both do) — getDouble on a
        // null slot would silently read 0.0: a plausible-but-wrong
        // score, exactly what the mismatch contract forbids
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed names: two ArrayDotProduct instances in the
      // same codegen scope (e.g. dot(a,b) and dot(a,a) for the norm in one
      // projection) would otherwise redeclare the locals — janino fails and
      // Spark silently falls back to interpreted execution.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column-level API: dot product of two double-array columns. */
  def arrayDot(a: Column, b: Column): Column =
    GraftExpr.toColumn(
      ArrayDotProduct(GraftExpr.toExpr(a), GraftExpr.toExpr(b)))

  def l2Norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(arrayDot(a, a))
}
