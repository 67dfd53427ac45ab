package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** agg_distinct_intersect_kmv: the sketch contracts the oracle gate
  * can't state — MERGEABILITY (per-half sketches roll up to the
  * whole-frame sketch without rescanning rows) and estimator
  * accuracy against the known planted overlap. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("mergeability: K smallest of the union of per-half sketches " +
      "== the whole-frame sketch, source by source") {
    graft.GraftExtensions.register(spark)
    val hashed = graft.Tables.documents(spark, sf)
      .select(col("source"),
        conv(substring(sha2(col("text"), 256), 1, 15), 16, 10)
          .cast("long").as("h"))
    def skMap(df: org.apache.spark.sql.DataFrame) =
      RelationalQueries.kmvSketches(df).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toVector).toMap
    val whole = skMap(hashed)
    val h1 = skMap(hashed.filter(col("h") % 2 === 0))
    val h2 = skMap(hashed.filter(col("h") % 2 =!= 0))
    whole.foreach { case (src, hs) =>
      val merged = (h1.getOrElse(src, Vector.empty) ++
        h2.getOrElse(src, Vector.empty)).distinct.sorted
        .take(RelationalQueries.KMV_K)
      assert(merged == hs,
        s"$src: merged per-half sketches must equal the whole sketch")
    }
  }

  test("estimator accuracy: the mirror-mirror Jaccard estimate is " +
      "within KMV sampling error of the true planted overlap") {
    val rows = RelationalQueries
      .aggDistinctIntersectKmv(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val (nm, est) = rows(("mirror-a", "mirror-b"))
    assert(nm >= 1 && nm <= RelationalQueries.KMV_K)
    // truth: |%15| / |%5 ∪ %3| over the corpus ids
    val d = graft.Tables.documents(spark, sf)
    val n15 = d.filter(col("doc_id") % 15 === 0).count().toDouble
    val nU = d.filter(col("doc_id") % 5 === 0 ||
      col("doc_id") % 3 === 0).count().toDouble
    val truth = n15 / nU
    val k = RelationalQueries.KMV_K.toDouble
    val tol = 4 * math.sqrt(truth * (1 - truth) / k) + 1.0 / k
    assert(math.abs(est - truth) <= tol,
      s"estimate $est vs truth $truth exceeds 4-sigma tolerance $tol")
    // every estimate is a valid probability and every match bounded
    RelationalQueries.aggDistinctIntersectKmv(spark, sf).collect()
      .foreach { r =>
        assert(r.getLong(2) <= RelationalQueries.KMV_K)
        assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      }
  }

  test("small-source exactness: with both sketches exhaustive " +
      "(< K values) the estimator divides by |union|, so the " +
      "estimate IS the exact Jaccard (ADVICE r17: fixed-K divisor " +
      "biased small sources low)") {
    graft.GraftExtensions.register(spark)
    // two planted 10-element sources sharing 5 values — far under K
    val hashed = ((1L to 10L).map(("tiny-a", _)) ++
      (6L to 15L).map(("tiny-b", _))).toDF("source", "h")
    val sk = RelationalQueries.kmvSketches(hashed)
    val a = sk.select(col("source").as("src_a"), col("hs").as("ha"))
    val b = sk.select(col("source").as("src_b"), col("hs").as("hb"))
    val k = RelationalQueries.KMV_K
    val got = a.crossJoin(b).filter(col("src_a") < col("src_b"))
      .withColumn("u", expr(
        s"slice(array_sort(array_distinct(concat(ha, hb))), 1, $k)"))
      .select(
        expr("size(array_intersect(array_intersect(u, ha), hb))")
          .cast("long").as("n_match"),
        expr("size(u)").cast("long").as("k_eff"))
      .as[(Long, Long)].head()
    assert(got == ((5L, 15L)), s"exhaustive sketches: $got")
    // 5/15 = exact |A∩B|/|A∪B|; the old fixed-K form gave 5/64
    assert(math.abs(got._1.toDouble / got._2 - 5.0 / 15.0) < 1e-12)
  }
}
