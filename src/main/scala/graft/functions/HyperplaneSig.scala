package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftExpr
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the LSH hot path: the
  * random-hyperplane signature of an ARRAY<DOUBLE> column as `bits`
  * packed sign bits. Two wins over the FastSig UDF it replaces:
  * whole-stage codegen (no Seq boxing of the embedding), and — the
  * dominant one — the ±1 hyperplane components are PRECOMPUTED into
  * a bits × ⌈dim/64⌉ bit table shared across rows, instead of one
  * splitmix64 hash per (bit, dimension) per ROW (64 bits × 64 dims =
  * 4,096 hashes/row at our fixture shape). Bit-for-bit identical
  * signatures to the UDF (same mix, same sign rule), so recall tests
  * and stored results are unchanged.
  */
object SigTable {

  /** splitmix64 — must match FastSig.mix exactly. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Dimensions covered by the precomputed table; beyond it the
    * per-element hash path is used (correct, just slower). */
  val MAX_DIM = 4096

  /** negWords(b)(d >> 6) bit (d & 63) set ⇔ hyperplane component
    * (b, d) is NEGATIVE. ~32 KB at 64 bits; built once per (bits,
    * seed) on the driver and shipped inside the expression. */
  def negWords(bits: Int, seed: Long): Array[Array[Long]] =
    Array.tabulate(bits) { b =>
      val words = new Array[Long](MAX_DIM >> 6)
      var d = 0
      while (d < MAX_DIM) {
        if ((mix(seed ^ (b.toLong << 32) ^ d) & 1L) != 0L)
          words(d >> 6) |= (1L << (d & 63))
        d += 1
      }
      words
    }

  /** Per-element fallback for dims past MAX_DIM — public and
    * static-forwarded so generated code can call it. */
  def negSign(seed: Long, b: Int, d: Int): Boolean =
    (mix(seed ^ (b.toLong << 32) ^ d) & 1L) != 0L
}

case class HyperplaneSigExpr(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {

  // null on a null ELEMENT (mirrors ArrayDotProduct) ⇒ nullable even
  // under a non-nullable child
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires ARRAY<DOUBLE>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  @transient private lazy val neg = SigTable.negWords(bits, seed)

  override def nullSafeEval(input: Any): Any = {
    val emb = input.asInstanceOf[ArrayData]
    val n = emb.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      val words = neg(b)
      var proj = 0.0
      var d = 0
      while (d < n) {
        // null element → null signature (mirrors ArrayDotProduct):
        // reading the slot as 0.0 would hash the vector into a bucket
        // it doesn't belong to
        if (emb.isNullAt(d)) return null
        val negative =
          if (d < SigTable.MAX_DIM) ((words(d >> 6) >>> (d & 63)) & 1L) != 0L
          else SigTable.negSign(seed, b, d)
        val v = emb.getDouble(d)
        proj += (if (negative) -v else v)
        d += 1
      }
      if (proj >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("negWords", neg, "long[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val proj = ctx.freshName("proj")
      val w = ctx.freshName("w")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long $sig = 0L;
         |for (int $d = 0; $d < $n; $d++) {
         |  if ($a.isNullAt($d)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  for (int $b = 0; $b < $bits; $b++) {
         |    long[] $w = $tbl[$b];
         |    double $proj = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      boolean neg = ($d < ${SigTable.MAX_DIM})
         |        ? ((($w[$d >> 6] >>> ($d & 63)) & 1L) != 0L)
         |        : graft.functions.SigTable.negSign(${seed}L, $b, $d);
         |      double $v = $a.getDouble($d);
         |      $proj += neg ? -$v : $v;
         |    }
         |    if ($proj >= 0) $sig |= (1L << $b);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSigExpr = copy(child = newChild)
}

object HyperplaneSig {
  /** Column-level API — drop-in for FastSig.hyperplaneSigFast. */
  def hyperplaneSig(emb: Column, bits: Int, seed: Long = 42L): Column =
    GraftExpr.toColumn(HyperplaneSigExpr(GraftExpr.toExpr(emb), bits, seed))
}
