package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable relative-error quantile sketch — the DDSketch
  * construction (Masson, Rim & Lee, VLDB'19): values map to
  * log-spaced buckets at γ^k boundaries with γ = (1+α)/(1-α), so any
  * reported quantile is within relative error α of a true quantile
  * value. Counts are bucket-wise ADDITIVE, which makes the sketch:
  *
  *   - deterministic (no sampling randomness — unlike KLL/GK, two
  *     runs over any partitioning produce the same buckets),
  *   - merge-order independent while under the bucket budget (the
  *     regime the declared query runs in — same "exact regime"
  *     discipline as agg_heavy_hitters), and
  *   - bounded: ≤ maxBuckets entries regardless of row count, with
  *     graceful degradation by collapsing the LOWEST buckets first
  *     (upper quantiles — the usual SLO targets — keep their α).
  *
  * The 100 TB contrast with agg_percentile's exact form: exact
  * per-group percentiles shuffle every value to its group's reducer;
  * the sketch shuffles ≤ maxBuckets counters per group × partition,
  * and the partial-aggregate merge is a bucket-map add.
  *
  * Non-negative inputs only (prices/quantities/latencies); values
  * below MIN_VALUE land in a dedicated zero bucket.
  */
object QuantileSketchAgg {

  val ALPHA = 0.01
  val MAX_BUCKETS = 2048
  val MIN_VALUE = 1e-9

  final class Sketch extends Serializable {
    var zeroCount: Long = 0L
    val buckets = new scala.collection.mutable.HashMap[Int, Long]
  }

  /** n_buckets/zero_count expose the sketch's regime so callers can
    * ASSERT the exact-recompute precondition: a final merged size
    * < maxBuckets proves no partial ever collapsed (collapse leaves a
    * sketch at exactly maxBuckets buckets and merging only adds keys,
    * so any collapsed partial forces the final size ≥ maxBuckets). */
  case class Quantiles(n: Long, p50: Double, p90: Double, p99: Double,
      n_buckets: Long, zero_count: Long)

  def gamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  def bucketOf(x: Double, alpha: Double): Int =
    math.ceil(math.log(x) / math.log(gamma(alpha))).toInt

  /** Point update in place. */
  def update(s: Sketch, x: Double, alpha: Double, maxBuckets: Int): Unit = {
    // Infinity would poison every upper quantile, and values within a
    // factor gamma of Double.MaxValue overflow the gamma^k midpoint —
    // 1e300 is far above any metric this sketch is for
    if (!java.lang.Double.isFinite(x) || x < 0 || x > 1e300)
      throw new IllegalArgumentException(
        s"quantile sketch takes non-negative values below 1e300, got $x")
    if (x < MIN_VALUE) s.zeroCount += 1
    else {
      val k = bucketOf(x, alpha)
      s.buckets.update(k, s.buckets.getOrElse(k, 0L) + 1)
      collapse(s, maxBuckets)
    }
  }

  /** Merge `b` into `a` (bucket-wise add — associative and
    * commutative; collapse only fires past the budget). */
  def mergeInto(a: Sketch, b: Sketch, maxBuckets: Int): Sketch = {
    a.zeroCount += b.zeroCount
    b.buckets.foreach { case (k, v) =>
      a.buckets.update(k, a.buckets.getOrElse(k, 0L) + v)
    }
    collapse(a, maxBuckets)
    a
  }

  /** DDSketch collapsing: fold the LOWEST buckets into the lowest
    * surviving one until within budget — upper quantiles keep their
    * α bound, the collapsed low tail degrades first. One sort + one
    * pass (equivalent to iterated pairwise-lowest collapse, without
    * the O(size) min-scan per evicted bucket — a saturated merge
    * would otherwise pay O(size²)). */
  private def collapse(s: Sketch, maxBuckets: Int): Unit =
    if (s.buckets.size == maxBuckets + 1) {
      // the saturated-update hot path (one bucket over): fold the
      // lowest into the second-lowest with one O(B) two-min scan —
      // no sort per input row
      var lo = Int.MaxValue
      var lo2 = Int.MaxValue
      s.buckets.keysIterator.foreach { k =>
        if (k < lo) { lo2 = lo; lo = k }
        else if (k < lo2) lo2 = k
      }
      val n = s.buckets.remove(lo).getOrElse(0L)
      s.buckets.update(lo2, s.buckets.getOrElse(lo2, 0L) + n)
    } else if (s.buckets.size > maxBuckets) {
      // bulk overflow (merges): one sort + one pass
      val ks = s.buckets.keys.toArray
      java.util.Arrays.sort(ks)
      val excess = s.buckets.size - maxBuckets
      var acc = 0L
      var i = 0
      while (i < excess) {
        acc += s.buckets.remove(ks(i)).getOrElse(0L)
        i += 1
      }
      s.buckets.update(ks(excess), s.buckets.getOrElse(ks(excess), 0L) + acc)
    }

  /** Quantile estimate: the bucket holding the rank-⌈qn⌉ value,
    * reported at its γ-midpoint 2γ^k/(γ+1). */
  def quantile(s: Sketch, q: Double, alpha: Double): Double = {
    val g = gamma(alpha)
    val n = s.zeroCount + s.buckets.valuesIterator.sum
    if (n == 0) return 0.0
    val rank = math.max(1L, math.ceil(q * n).toLong)
    if (rank <= s.zeroCount) return 0.0
    var cum = s.zeroCount
    val it = s.buckets.toSeq.sortBy(_._1).iterator
    while (it.hasNext) {
      val (k, c) = it.next()
      cum += c
      if (cum >= rank) return 2 * math.pow(g, k) / (g + 1)
    }
    0.0 // unreachable: cum reaches n ≥ rank
  }

  def agg(
      alpha: Double = ALPHA,
      maxBuckets: Int = MAX_BUCKETS): Aggregator[Double, Sketch, Quantiles] =
    new Aggregator[Double, Sketch, Quantiles] {
      def zero: Sketch = new Sketch
      def reduce(s: Sketch, x: Double): Sketch = {
        update(s, x, alpha, maxBuckets); s
      }
      def merge(a: Sketch, b: Sketch): Sketch = mergeInto(a, b, maxBuckets)
      def finish(s: Sketch): Quantiles = Quantiles(
        s.zeroCount + s.buckets.valuesIterator.sum,
        quantile(s, 0.50, alpha),
        quantile(s, 0.90, alpha),
        quantile(s, 0.99, alpha),
        s.buckets.size.toLong,
        s.zeroCount)
      def bufferEncoder: Encoder[Sketch] = Encoders.kryo[Sketch]
      def outputEncoder: Encoder[Quantiles] = ExpressionEncoder[Quantiles]()
    }
}
