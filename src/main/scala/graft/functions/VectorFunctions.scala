package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embedding columns
  * (SURVEY.md §2.11 sim_*). The dot-product kernel is the codegen'd
  * ArrayDotProduct Catalyst expression (see ArrayDot) — tight
  * primitive loop, no boxing, whole-stage codegen.
  *
  * Precision contract: cast to double BEFORE multiplying, and
  * accumulate left-to-right — the same sequential order DuckDB's
  * list_cosine_similarity uses on DOUBLE[], so oracle comparisons
  * agree to the last ulp.
  */
object VectorFunctions {

  /** Cast a float embedding to double for precision-stable math. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  def dot(a: Column, b: Column): Column = ArrayDot.arrayDot(a, b)

  def l2Norm(a: Column): Column = ArrayDot.l2Norm(a)

  /** Cosine similarity of two double arrays. Where a norm can be
    * precomputed per side (before a join), prefer
    * dot(a,b)/(na*nb) — same value, one traversal per pair. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Split a packed bit-signature into `nBands` band values for LSH
    * bucketing (band join = candidates agreeing on ≥1 band). */
  def sigBands(sig: Column, bits: Int, nBands: Int): Column = {
    require(bits % nBands == 0,
      s"bits=$bits must divide evenly into $nBands bands — a remainder" +
        " would silently drop the high bits from every band hash")
    val bandBits = bits / nBands
    // -1L, not (1L<<64)-1: Java shifts mod 64, so at bandBits=64 the
    // naive mask is 0 and every band hash collapses to one bucket
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    array((0 until nBands).map { j =>
      struct(lit(j).as("band"),
        (shiftright(sig, j * bandBits).bitwiseAND(lit(mask))).as("bh"))
    }: _*)
  }

  /** Multi-probe band values: for each band, the exact band hash plus
    * every single-bit flip of it. Probing Hamming-≤1 neighbors
    * recovers the recall lost by widening bands (wide bands = small
    * collision probability per band, but tiny candidate volume). The
    * fan-out is (bandBits+1)×nBands narrow (band, bh) rows per vector
    * — a constant factor on a short-key shuffle, never a function of
    * corpus size. */
  def sigBandProbes(sig: Column, bits: Int, nBands: Int): Column = {
    require(bits % nBands == 0,
      s"bits=$bits must divide evenly into $nBands bands")
    val bandBits = bits / nBands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    array((0 until nBands).flatMap { j =>
      val base = shiftright(sig, j * bandBits).bitwiseAND(lit(mask))
      (base +: (0 until bandBits).map(i => base.bitwiseXOR(lit(1L << i))))
        .map(bh => struct(lit(j).as("band"), bh.as("bh")))
    }: _*)
  }
}
