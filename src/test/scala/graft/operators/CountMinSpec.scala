package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** agg_count_min: the mergeable Count-Min sketch. Pins the CMS
  * guarantee (est ≥ exact for EVERY key, not just the probed top-10),
  * additive mergeability (disjoint halves sum to the full build —
  * the 100 TB rollup contract), exactness in the collision-free
  * regime, and the fixture-facing qid shape. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def keyed(ids: Seq[Long]) = ids.toDF("user_id")

  /** est for every distinct key via the same build/probe kernels. */
  private def estAll(ids: Seq[Long]): Map[Long, Long] = {
    val df = keyed(ids)
    val regs = RelationalQueries.cmsRegisters(df)
    df.distinct()
      .select(col("user_id"),
        posexplode(RelationalQueries.cmsBuckets(col("user_id")))
          .as(Seq("d", "bucket")))
      .join(broadcast(regs), Seq("d", "bucket"))
      .groupBy(col("user_id")).agg(min(col("cnt")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("CMS guarantee: est >= exact for every key of a skewed " +
      "planted stream") {
    // 400 keys, zipf-ish: key k appears (400/k) times — plenty of
    // collisions at W=256
    val ids = (1L to 400L).flatMap(k => Seq.fill((400 / k).toInt)(k))
    val exact = ids.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = estAll(ids)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS undercounted key $k: ${est(k)} < $n")
    }
    // and the heavy head is not wildly overcounted (sanity, not a
    // probabilistic bound): key 1 has 400 of ~2466 events
    assert(est(1L) - exact(1L) <= ids.size / 10,
      s"head overcount ${est(1L) - exact(1L)}")
  }

  test("mergeability: registers of disjoint halves SUM to the full " +
      "build, element-wise") {
    val ids = (1L to 300L).flatMap(k => Seq.fill(((k % 7) + 1).toInt)(k))
    val (a, b) = ids.splitAt(ids.size / 2)
    def regMap(xs: Seq[Long]) =
      RelationalQueries.cmsRegisters(keyed(xs)).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = regMap(ids)
    val merged = (regMap(a).toSeq ++ regMap(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == full, "element-wise sum of half sketches must " +
      "equal the full sketch")
  }

  test("collision-free regime: a small key set estimates exactly") {
    val ids = Seq(1L, 1L, 1L, 2L, 2L, 3L)
    val est = estAll(ids)
    // 3 keys into 4x256 counters: collisions are possible but this
    // fixed seed/key set is collision-free — if a hash change makes
    // them collide, this pin flags the behavior change loudly
    assert(est == Map(1L -> 3L, 2L -> 2L, 3L -> 1L), s"got $est")
  }

  test("qid shape on the fixture: 10 probed rows, overcount >= 0, " +
      "exact counts descending") {
    val rows = RelationalQueries.aggCountMin(spark, sf)
      .orderBy(col("n_exact").desc, col("user_id")).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, s"CMS undercount on ${r.getLong(0)}")
      assert(r.getLong(2) == r.getLong(1) + r.getLong(3))
    }
  }
}
