package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** graph_pagerank pins: the integer fixed-point recurrence itself
  * (against an independent driver-side replay over the engine's own
  * edge list), the copy-flood hub shape, mass-conservation bounds,
  * and bit-exact partitioning invariance.
  */
class GraphPagerankSpec extends SparkSpec {

  private def embDf(vecs: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    SimilarityQueries.withNorm(
      vecs.toDF("vec_id", "embedding").withColumn("label", lit("x")))
  }

  private def ranksOf(e: DataFrame): Map[Long, Long] =
    SimilarityQueries.graphPagerankFrom(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("fixed-point recurrence matches an independent driver replay") {
    val e = embDf(Seq(
      0L -> Seq(1.0, 0.0, 0.0), 1L -> Seq(0.9, 0.1, 0.0),
      2L -> Seq(0.0, 1.0, 0.0), 3L -> Seq(0.1, 0.9, 0.0),
      4L -> Seq(0.0, 0.0, 1.0), 5L -> Seq(1.0, 0.0, 0.0)))
    val edges = SimilarityQueries.simKnnJoinFrom(e)
      .select(col("a"), col("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = (0L to 5L).toSet
    val n = nodes.size
    val base = SimilarityQueries.PR_SCALE * 15L / 100L / n
    val deg = edges.groupBy(_._1).map { case (a, es) => a -> es.size.toLong }
    var r = nodes.map(_ -> SimilarityQueries.PR_SCALE / n).toMap
    for (_ <- 1 to SimilarityQueries.PR_ITERS) {
      val contrib = edges.toSeq
        .map { case (a, b) => b -> (85L * r(a)) / (100L * deg(a)) }
        .groupBy(_._1).map { case (b, cs) => b -> cs.map(_._2).sum }
      r = nodes.map(v => v -> (base + contrib.getOrElse(v, 0L))).toMap
    }
    assert(ranksOf(e) == r)
  }

  test("a copy-flood representative out-ranks every member") {
    // 12 verbatim copies of one vector (collapse → rep 0 + star
    // edges both ways) plus two far-away distinct vectors: the rep
    // has in-degree 11, each member receives only the rep's 1/11+
    // share — centrality finds the canonical copy.
    val copies = (0L to 11L).map(i => i -> Seq(1.0, 0.0, 0.0, 0.0))
    val rest = Seq(100L -> Seq(0.0, 1.0, 0.0, 0.0),
      101L -> Seq(0.0, 0.0, 1.0, 0.0))
    val ranks = ranksOf(embDf(copies ++ rest))
    val hub = ranks(0L)
    (1L to 11L).foreach(m => assert(hub > ranks(m),
      s"member $m rank ${ranks(m)} !< hub $hub"))
  }

  test("mass bounds: every rank >= base, total <= PR_SCALE") {
    val e = embDf((0L to 19L).map(i =>
      i -> Seq(math.cos(i * 0.3), math.sin(i * 0.3), 0.1 * (i % 3))))
    val ranks = ranksOf(e)
    val base = SimilarityQueries.PR_SCALE * 15L / 100L / ranks.size
    assert(ranks.values.forall(_ >= base))
    assert(ranks.values.sum <= SimilarityQueries.PR_SCALE)
    // and the graph is non-trivial: someone collected real mass
    assert(ranks.values.max > base)
  }

  test("bit-exact under repartitioning") {
    val vecs = (0L to 29L).map(i =>
      i -> Seq(math.cos(i * 0.7), math.sin(i * 0.7), (i % 5) * 0.2))
    val a = ranksOf(embDf(vecs))
    val b = ranksOf(embDf(vecs).repartition(7))
    assert(a == b)
  }

  test("gate: an isolated-heavy corpus (few edges, many nodes) is " +
      "NOT driver-eligible — both collected sets must fit") {
    val cap = SimilarityQueries.DRIVER_PR_MAX
    // the round-13 hole: edge-only gating would collect 2M vec_ids
    assert(!SimilarityQueries.prDriverEligible(100L, cap + 1, cap))
    assert(!SimilarityQueries.prDriverEligible(cap + 1, 100L, cap))
    assert(SimilarityQueries.prDriverEligible(cap, cap, cap))
  }

  test("isolated-heavy fixture: node gate forces the distributed " +
      "path and it matches the driver loop") {
    import spark.implicits._
    // 30 nodes, only 2 edges: edge term passes driverMax=10, node
    // term must push it onto the distributed loop — which has to
    // produce the identical table the driver loop does
    val vecs = (0L to 29L).map(i => i -> Seq(1.0 + i, 2.0, 3.0))
    val e = embDf(vecs)
    val knn = Seq((0L, 1L, 1.0, 1), (2L, 3L, 1.0, 1))
      .toDF("a", "b", "sim", "rk")
    val dist = SimilarityQueries.pagerankRanks(e, knn, driverMax = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val drv = SimilarityQueries.pagerankRanks(e, knn, driverMax = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.size == 30 && dist == drv)
    // isolated nodes hold exactly the base mass
    val base = SimilarityQueries.PR_SCALE * 15L / 100L / 30
    assert(dist(7L) == base)
  }

  test("empty corpus: empty rank table, not a divide-by-zero") {
    import spark.implicits._
    val e = embDf(Seq(0L -> Seq(0.0, 0.0, 0.0))) // degenerate: norm 0
    val out = SimilarityQueries.graphPagerankFrom(e)
    assert(out.columns.toSeq == Seq("vec_id", "rank_fp"))
    assert(out.count() == 0)
  }

  test("distributed loop == driver shortcut, bit for bit") {
    // driverMax=0 forces the 10-round distributed join loop; the
    // associative floor arithmetic means it must land on EXACTLY the
    // table the collected loop produces
    val vecs = (0L to 24L).map(i =>
      i -> Seq(math.cos(i * 0.5), math.sin(i * 0.5), (i % 4) * 0.3))
    val e = embDf(vecs)
    val knn = SimilarityQueries.simKnnJoinFrom(e)
    val dist = SimilarityQueries.pagerankRanks(e, knn, driverMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val drv = SimilarityQueries.pagerankRanks(e, knn)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == drv)
  }
}

/** dedup_keep_central pins: the keeper really is the highest-rank
  * member (cross-checked against the operator's own rank and cluster
  * tables), clusters match dedup_semantic's components, and a
  * planted copy-flood keeps its representative. */
class KeepCentralSpec extends SparkSpec {

  private def embDf(vecs: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    SimilarityQueries.withNorm(
      vecs.toDF("vec_id", "embedding").withColumn("label", lit("x")))
  }

  test("keeper is the max-rank member of every cluster") {
    val vecs = (0L to 23L).map { i =>
      val g = (i % 3).toDouble // three loose direction groups
      i -> Seq(math.cos(g + i * 0.01), math.sin(g + i * 0.01), 0.05 * g)
    }
    val e = embDf(vecs)
    val out = SimilarityQueries.dedupKeepCentralFrom(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.nonEmpty)
    val ranks = SimilarityQueries.graphPagerankFrom(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = SimilarityQueries.dedupSemanticFrom(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1))
    assert(out.keySet == byCluster.keys.toSet)
    out.foreach { case (cid, (keeper, krank, n)) =>
      val members = byCluster(cid)
      assert(n == members.length)
      val best = members.map(m => (ranks(m), m))
        .sortBy { case (r, m) => (-r, m) }.head
      assert(keeper == best._2 && krank == best._1,
        s"cluster $cid keeper $keeper/$krank vs expected $best")
    }
  }

  test("a copy-flood cluster keeps its representative") {
    val copies = (0L to 9L).map(i => i -> Seq(1.0, 0.0, 0.0))
    val far = Seq(50L -> Seq(0.0, 1.0, 0.0), 51L -> Seq(0.0, 0.0, 1.0))
    val out = SimilarityQueries.dedupKeepCentralFrom(embDf(copies ++ far))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the copy class forms one cluster labeled by its min id 0, and
    // the collapse representative (in-degree 9 hub) is the keeper
    assert(out(0L) == 0L)
  }
}
