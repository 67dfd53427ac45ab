package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HeavyHittersAgg

/** Misra-Gries heavy-hitters sketch: exact in the distinct≤capacity
  * regime (any partitioning), and the n/(C+1) under-count bound plus
  * guaranteed heavy-item recall in the approximate regime. */
class HeavyHittersSpec extends SparkSpec {

  private def sketchCounts(items: Seq[Long], capacity: Int,
      partitions: Int): Map[Long, Long] = {
    import spark.implicits._
    items.toDF("item").repartition(partitions)
      .select(lit("g").as("g"), col("item"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(HeavyHittersAgg.agg(capacity).toColumn.name("hits"))
      .collect()(0)._2.map(h => h.item -> h.n).toMap
  }

  test("exact regime: distinct <= capacity matches true counts " +
      "under any partitioning") {
    val rnd = new scala.util.Random(7)
    val items = Seq.fill(5000)(rnd.nextInt(40).toLong)
    val truth = items.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    for (parts <- Seq(1, 7, 32)) {
      assert(sketchCounts(items, 64, parts) == truth,
        s"exact regime must be partition-order-independent (p=$parts)")
    }
  }

  test("approximate regime: under-count bounded by n/(C+1), heavy " +
      "items always reported") {
    val rnd = new scala.util.Random(11)
    // one dominant item (40%), a mid item (10%), long uniform tail
    val n = 8000
    val items = Seq.fill(n) {
      val r = rnd.nextDouble()
      if (r < 0.40) 1L
      else if (r < 0.50) 2L
      else 100L + rnd.nextInt(2000)
    }
    val truth = items.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }
    val cap = 8
    val est = sketchCounts(items, cap, 16)
    val bound = n.toDouble / (cap + 1)
    est.foreach { case (item, e) =>
      val t = truth(item)
      assert(e <= t, s"sketch must never over-count ($item: $e > $t)")
      assert(t - e <= bound,
        s"under-count of $item exceeds n/(C+1): $t - $e > $bound")
    }
    // every item with true count above the bound must be reported
    truth.filter(_._2 > bound).keys.foreach { hh =>
      assert(est.contains(hh), s"heavy item $hh missing from sketch")
    }
    assert(est.contains(1L) && est.contains(2L))
  }
}
