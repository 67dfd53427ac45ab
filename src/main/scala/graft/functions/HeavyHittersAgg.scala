package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable heavy-hitters (frequent-items) sketch — Misra-Gries with
  * `capacity` counters, the mergeable-summaries form (Agarwal et al.,
  * PODS'12): pointwise-add then truncate to the top `capacity` by
  * subtracting the (capacity+1)-th largest count.
  *
  * Guarantees (n = stream length, C = capacity), preserved under
  * arbitrary partial-aggregation merge order:
  *   - est(x) ≤ true(x) ≤ est(x) + n/(C+1)  for every reported x
  *   - every item with true(x) > n/(C+1) is reported
  *   - if the group's distinct-item count ≤ C, counts are EXACT
  *     (no decrement ever fires) — the regime agg_heavy_hitters runs
  *     in, which is why it can carry a full SQL oracle.
  *
  * This is the 100 TB "top user_ids / domains / tokens per partition"
  * primitive: per-partition sketches are tiny (≤ C entries), merge in
  * the combiner, and never shuffle raw (group, item) pairs — contrast
  * with an exact two-phase agg whose intermediate is one row per
  * DISTINCT (group, item).
  *
  * The update/merge/top kernels are exposed statically so the
  * STREAMING form (StreamingOps.heavyHittersStream — the same sketch
  * as flatMapGroupsWithState state) provably applies identical math:
  * one sketch implementation to audit for both modes.
  */
object HeavyHittersAgg {

  type Sketch = scala.collection.mutable.HashMap[Long, Long]

  case class Hit(item: Long, n: Long)

  /** MG point update in place. */
  def update(b: Sketch, item: Long, capacity: Int): Unit =
    b.get(item) match {
      case Some(v) => b.update(item, v + 1)
      case None if b.size < capacity => b.update(item, 1L)
      case None =>
        // classic MG decrement-all; O(C) but fires only under
        // eviction pressure (never when distinct ≤ C)
        val dead = List.newBuilder[Long]
        b.foreach { case (k, v) =>
          if (v == 1L) dead += k else b.update(k, v - 1)
        }
        dead.result().foreach(b.remove)
    }

  /** Mergeable-summaries merge into `a` (pointwise add, truncate to
    * top `capacity` by subtracting the (C+1)-th largest). */
  def mergeInto(a: Sketch, b: Sketch, capacity: Int): Sketch = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      val vs = a.values.toArray
      java.util.Arrays.sort(vs)
      val cut = vs(vs.length - capacity - 1) // (C+1)-th largest
      val dead = List.newBuilder[Long]
      a.foreach { case (k, v) =>
        if (v - cut <= 0L) dead += k else a.update(k, v - cut)
      }
      dead.result().foreach(a.remove)
    }
    a
  }

  /** Sketch → (count desc, item asc)-ordered hits. */
  def top(b: Sketch): Seq[Hit] = b.toSeq
    .sortBy { case (item, n) => (-n, item) }
    .map { case (item, n) => Hit(item, n) }

  def agg(capacity: Int): Aggregator[Long, Sketch, Seq[Hit]] =
    new Aggregator[Long, Sketch, Seq[Hit]] {
      def zero: Sketch = new Sketch
      def reduce(b: Sketch, item: Long): Sketch = {
        update(b, item, capacity); b
      }
      def merge(a: Sketch, b: Sketch): Sketch = mergeInto(a, b, capacity)
      def finish(b: Sketch): Seq[Hit] = top(b)
      // Catalyst MapType, not kryo: partial sketches cross the shuffle
      // as primitive unsafe arrays instead of reflective kryo blobs —
      // measured ~10% on the sf1.0 events feed, bit-identical results
      def bufferEncoder: Encoder[Sketch] = ExpressionEncoder[Sketch]()
      def outputEncoder: Encoder[Seq[Hit]] = ExpressionEncoder[Seq[Hit]]()
    }
}
