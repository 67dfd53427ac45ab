package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT>/ARRAY<DOUBLE> embedding columns as
  * pure Column expressions (SURVEY.md §2.11 sim_*). No UDFs: the
  * higher-order functions evaluate inside the row pipeline with no
  * serialization boundary, and the whole plan stays AQE/pushdown
  * friendly.
  *
  * Precision contract: cast to double BEFORE multiplying, and
  * accumulate left-to-right — the same sequential order DuckDB's
  * list_cosine_similarity uses on DOUBLE[], so oracle comparisons
  * agree to the last ulp.
  */
object VectorFunctions {

  /** Cast a float embedding to double for precision-stable math. */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Dot product via zip_with + left-fold aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Random-hyperplane LSH signature: `bits` sign-bits packed into a
    * long. Hyperplane b component d is a deterministic ±1 derived from
    * xxhash64(seed, b, d) — reproducible across runs and executors,
    * no driver-side randomness (safe for resume/retry). */
  def hyperplaneSig(emb: Column, bits: Int, seed: Int = 42): Column = {
    val bitCols = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(
          emb,
          transform(sequence(lit(0), size(emb) - 1),
            d => when(pmod(xxhash64(lit(seed), lit(b), d), lit(2)) === 0,
              lit(1.0)).otherwise(lit(-1.0))),
          (x, h) => x * h),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a + b).as("lsh_sig")
  }

  /** Split a packed signature into `nBands` band values for LSH
    * bucketing (band join = candidates agreeing on ≥1 band). */
  def sigBands(sig: Column, bits: Int, nBands: Int): Column = {
    val bandBits = bits / nBands
    val mask = (1L << bandBits) - 1
    array((0 until nBands).map { j =>
      struct(lit(j).as("band"),
        (shiftright(sig, j * bandBits).bitwiseAND(lit(mask))).as("bh"))
    }: _*)
  }
}
