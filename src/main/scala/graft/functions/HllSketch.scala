package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftExpr
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic HyperLogLog register for a LONG key — the sketch
  * primitive behind agg_distinct_approx / agg_hll_partitioned.
  *
  * Spark's own approx_count_distinct / hll_sketch_agg estimates are
  * engine-specific (their hash and register layout are not published
  * as SQL-recomputable math), which forced those qids into rows-only
  * checks. This register IS recomputable: hash = splitmix64(key)
  * (exactly FastSig.mix / SigTable.mix), bucket = top `p` bits, rank
  * = leading-zero count of the remaining 64-p bits + 1 (capped at
  * 64-p+1 when the suffix is all zeros). The expression returns
  * `bucket*64 + rank` packed in one long; groupBy(bucket).max(rank)
  * builds the register file, and every downstream quantity — the
  * harmonic sum via exact integer 2^(RMAX-rank) terms, the linear-
  * counting branch — is order-independent arithmetic a DuckDB oracle
  * reproduces bit-for-bit (ulp-proof: the only transcendental, ln in
  * the linear-counting branch, feeds a round-to-integer whose
  * boundary a libm ulp cannot cross).
  *
  * The register file is the SKETCH: per-partition register sets
  * merge by max-per-bucket — groupBy partial aggregation does the
  * map-side combine, and a stored per-(source, day) register table
  * answers any rollup by the same max-merge without rescanning rows.
  */
case class HllRegisterExpr(child: Expression, p: Int)
    extends UnaryExpression {

  require(p >= 4 && p <= 16, s"p=$p outside [4,16]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_register requires BIGINT, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hll_register"

  override def nullSafeEval(input: Any): Any = {
    val h = HllSketch.mix(input.asInstanceOf[Long])
    val bucket = h >>> (64 - p)
    val shifted = h << p
    val rank = if (shifted == 0L) 64 - p + 1
      else java.lang.Long.numberOfLeadingZeros(shifted) + 1
    bucket * 64L + rank
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, k =>
      s"graft.functions.HllSketch.register($k, $p)")

  override protected def withNewChildInternal(
      newChild: Expression): HllRegisterExpr = copy(child = newChild)
}

object HllSketch {

  /** splitmix64 — must match FastSig.mix / SigTable.mix exactly (the
    * DuckDB-recompute contract lives on this function). */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Static form the generated code calls. */
  def register(key: Long, p: Int): Long = {
    val h = mix(key)
    val bucket = h >>> (64 - p)
    val shifted = h << p
    val rank = if (shifted == 0L) 64 - p + 1
      else java.lang.Long.numberOfLeadingZeros(shifted) + 1
    bucket * 64L + rank
  }

  /** Column-level API: packed (bucket, rank) register for `key`. */
  def hllRegister(key: Column, p: Int): Column =
    GraftExpr.toColumn(HllRegisterExpr(GraftExpr.toExpr(key), p))
}
