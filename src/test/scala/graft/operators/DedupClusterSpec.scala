package graft.operators

import graft.SparkSpec

/** Connected-components clustering and corpus-level span dedup:
  * transitive closure across multiple propagation rounds, keeper
  * selection, and order-preserving span scrubbing. */
class DedupClusterSpec extends SparkSpec {

  test("clustersFrom computes the transitive closure of a long chain") {
    import spark.implicits._
    // path graph 0-1-...-60: diameter 60 — impossible for one-hop
    // propagation inside the 20-round cap, so this proves the
    // pointer-doubling hop converges in O(log diameter).
    // driverMax = 0 forces the DISTRIBUTED path (the driver
    // union-find shortcut would otherwise absorb a fixture this
    // small); the shortcut itself is equality-tested below.
    val chain = (0L until 60L).map(i => (i, i + 1))
    // plus a separate triangle 100-101-102 and an isolated pair
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val pair = Seq((200L, 201L))
    val out = DedupQueries.clustersFrom(
        (chain ++ tri ++ pair).toDF("a", "b"), driverMax = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1)
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster(0L) == (0L to 60L).toSet, "chain is one component")
    assert(byCluster(100L) == Set(100L, 101L, 102L))
    assert(byCluster(200L) == Set(200L, 201L))
    // exactly one keeper per component, and it holds the min id
    val keepers = out.filter(_._3 == 1).map(d => (d._1, d._2))
    assert(keepers.toSet == Set((0L, 0L), (100L, 100L), (200L, 200L)))
    assert(out.count(_._3 == 1) == 3)
  }

  test("clustersFrom of no pairs is empty") {
    import spark.implicits._
    val out = DedupQueries.clustersFrom(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(out.count() == 0)
  }

  test("clustersFrom matches driver-side union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 4) {
      val n = 30 + rnd.nextInt(40)
      val edges = Seq.fill(n) {
        val a = rnd.nextInt(50).toLong
        val b = rnd.nextInt(50).toLong
        if (a < b) (a, b) else (b, a + 1) // avoid self-loops
      }
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val truth = parent.keys.map(x => x -> find(x)).toMap
      // BOTH paths must agree with ground truth and with each other:
      // the driver union-find shortcut (default) and the distributed
      // pointer-doubling loop (driverMax = 0)
      val shortcut = DedupQueries.clustersFrom(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val distributed = DedupQueries
        .clustersFrom(edges.toDF("a", "b"), driverMax = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(shortcut == truth, s"driver path diverges for $edges")
      assert(distributed == truth, s"distributed path diverges for $edges")
    }
  }

  test("the DRIVER_CC_MAX cap routes to the distributed path and " +
    "both paths agree at the boundary") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // routing is observable through the plan: the driver union-find
    // returns a collected local relation, the distributed loop ends
    // on checkpointed RDD leaves. Plant one edge set at the cap and
    // one just over it — same shape, diameter 1 (disjoint pairs), so
    // the over-cap run converges in O(1) rounds instead of walking a
    // 2^20-diameter chain.
    def driverBuilt(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val cap = DedupQueries.DRIVER_CC_MAX.toLong
    def pairs(n: Long) = spark.range(n)
      .select((col("id") * 2).as("a"), (col("id") * 2 + 1).as("b"))
    val atCap = DedupQueries.clustersFrom(pairs(cap))
    assert(driverBuilt(atCap),
      "nEdges == DRIVER_CC_MAX must take the driver union-find")
    val overCap = DedupQueries.clustersFrom(pairs(cap + 8))
    assert(!driverBuilt(overCap),
      "nEdges > DRIVER_CC_MAX must take the distributed loop")
    // both runs must produce the exact pair-graph labels: every node
    // labeled by its even partner, keeper iff it IS the even partner.
    // Asserted distributed (no 2M-row collect).
    for ((out, n) <- Seq((atCap, cap), (overCap, cap + 8))) {
      assert(out.count() == 2 * n)
      assert(out.filter(
        col("cluster_id") =!= col("doc_id") - pmod(col("doc_id"), lit(2)))
        .count() == 0L, "labels must be the even partner")
      assert(out.filter(col("is_keeper") === 1).count() == n)
    }
    // and at the boundary the two paths agree row-for-row on the SAME
    // graph: a mixed graph (chains + pairs) run through both.
    import spark.implicits._
    val mixed = ((0L until 40L).map(i => (i, i + 1)) ++
      (100L until 160L by 2).map(i => (i, i + 1))).toDF("a", "b")
    val viaDriver = DedupQueries.clustersFrom(mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val viaDistributed = DedupQueries.clustersFrom(mixed, driverMax = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(viaDriver.sameElements(viaDistributed))
  }

  test("common spans are scrubbed corpus-wide, order preserved") {
    import spark.implicits._
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // one exact span
    def uniq(tag: String) =
      (1 to 10).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq("u")} $boiler ${uniq("v")}"), // boiler mid-doc
      (2L, s"$boiler ${uniq("w")}"),              // boiler at head
      (3L, uniq("x")),                            // untouched
      (4L, boiler)                                // all-boilerplate
    ).toDF("doc_id", "text")
    val out = DedupQueries.dedupCommonSpansFrom(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val m = out.map(t => t._1 -> t).toMap
    // the shared span is gone from every doc; survivors keep order
    assert(m(1L)._2 == s"${uniq("u")} ${uniq("v")}" && m(1L)._3 == 2)
    assert(m(2L)._2 == uniq("w") && m(2L)._3 == 1)
    assert(m(3L)._2 == uniq("x") && m(3L)._3 == 1)
    // the all-boilerplate doc has nothing left and drops out
    assert(!m.contains(4L) && out.length == 3)
  }

  test("span scrub is invariant under repartitioning") {
    val docs = graft.Tables.documents(spark, sf)
    val base = DedupQueries.dedupCommonSpansFrom(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val repart = DedupQueries.dedupCommonSpansFrom(docs.repartition(7))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(base == repart && base.nonEmpty)
  }
}
