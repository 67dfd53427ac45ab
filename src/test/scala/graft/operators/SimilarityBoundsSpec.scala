package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ArrayDot.l2Norm

/** The bounds the SimilarityQueries doc-comments promise: centroid
  * count (ivfK), probe width (ivfNProbe), the topCentroids kernel,
  * and the BUCKET_CAP candidate bound on a degenerate
  * identical-vector flood. */
class SimilarityBoundsSpec extends SparkSpec {

  test("ivfK is ceil(sqrt(n)) with floor 4 and cap 65536") {
    assert(SimilarityQueries.ivfK(1L) == 4)
    assert(SimilarityQueries.ivfK(500L) == 23)
    assert(SimilarityQueries.ivfK(1000000L) == 1000)
    assert(SimilarityQueries.ivfK(10000000000L) == 65536)
  }

  test("ivfNProbe scales with k/2, floor 4, cap 64") {
    assert(SimilarityQueries.ivfNProbe(4) == 4)
    assert(SimilarityQueries.ivfNProbe(23) == 12)
    assert(SimilarityQueries.ivfNProbe(256) == 64)
    assert(SimilarityQueries.ivfNProbe(65536) == 64)
  }

  test("topCentroids picks true nearest by cosine with cid tiebreak") {
    val r2 = math.sqrt(2.0) / 2.0
    val cents = Array(
      (1L, Array(1.0, 0.0), 1.0),
      (2L, Array(0.0, 1.0), 1.0),
      (3L, Array(r2, r2), 1.0))
    val v = Seq(0.9, 0.1)
    val nrm = math.sqrt(v.map(x => x * x).sum)
    assert(SimilarityQueries.topCentroids(cents, 2, v, nrm).toSeq == Seq(1L, 3L))
    // a > #centroids: returns all, no sentinel ids
    assert(SimilarityQueries.topCentroids(cents, 5, v, nrm).toSeq ==
      Seq(1L, 3L, 2L))
    // ties broken by smaller cid: duplicate centroid vectors
    val dup = Array((7L, Array(1.0, 0.0), 1.0), (5L, Array(1.0, 0.0), 1.0))
    assert(SimilarityQueries.topCentroids(dup, 1, Seq(1.0, 0.0), 1.0)
      .toSeq == Seq(5L))
    // degenerate inputs are empty, not a crash
    assert(SimilarityQueries.topCentroids(cents, 2, null, 1.0).isEmpty)
    assert(SimilarityQueries.topCentroids(cents, 2, v, 0.0).isEmpty)
  }

  test("Lloyd refinement recovers true cluster means from a rough sample") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two tight clusters around orthogonal axes; the "sample" puts
    // one centroid near each — refinement must move each to its
    // cluster's exact mean (count can only stay or shrink, never grow)
    val c1 = Seq.tabulate(20)(i => (i.toLong, Seq(1.0, 0.01 * i)))
    val c2 = Seq.tabulate(20)(i => (100L + i, Seq(0.01 * i, 1.0)))
    val e = (c1 ++ c2).toDF("vec_id", "emb")
      .withColumn("nrm", graft.functions.ArrayDot.l2Norm(col("emb")))
    val sample = Array(
      (0L, Array(1.0, 0.0), 1.0),
      (100L, Array(0.0, 1.0), 1.0))
    val refined = SimilarityQueries.refineCentroids(spark, e, sample)
      .sortBy(_._1)
    assert(refined.length <= sample.length)
    val m1 = refined.find(_._1 == 0L).get._2
    val m2 = refined.find(_._1 == 100L).get._2
    // exact means: (1.0, avg(0.00..0.19)) and mirrored. Tolerance is
    // the 2^-24 fixed-point grid (round 13: means are exact integer
    // sums of floor(v*2^24 + 0.5), so recovery is within half a grid
    // step ≈ 3e-8 per element, not float-exact)
    val exp = (0 until 20).map(_ * 0.01).sum / 20
    val tol = 1.0 / (1 << 24)
    assert(math.abs(m1(0) - 1.0) < tol && math.abs(m1(1) - exp) < tol)
    assert(math.abs(m2(1) - 1.0) < tol && math.abs(m2(0) - exp) < tol)
    // empty input passes through
    assert(SimilarityQueries.refineCentroids(spark, e,
      Array.empty[(Long, Array[Double], Double)]).isEmpty)
  }

  test("identical-vector flood: candidates bounded AND every member kept") {
    // 1200 copies of one vector all hash to one bucket per band; the
    // join sides are capped at 512 so the in-bucket pairs are at most
    // C(512, 2), and each of the 688 overflow members contributes
    // exactly ONE chained anchor candidate — bounded at
    // C(cap, 2) + (n − cap), never |bucket|², with NO member dropped.
    val emb = Seq.tabulate(8)(i => if (i == 0) 1.0 else 0.1)
    val flood = spark.range(1200).select(col("id").as("vec_id"),
      typedLit(emb).as("emb"))
    val cands = SimilarityQueries.nearEmbeddingCandidates(flood)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cap = 512L
    assert(cands.nonEmpty, "flood members must still pair up")
    assert(cands.length <= cap * (cap - 1) / 2 + (1200 - cap),
      s"flood candidates ${cands.length} exceed the cap+overflow bound")
    // the overflow chains keep EVERY flood member in the candidate
    // graph — the old cap silently dropped members 513..1200
    val present = cands.flatMap(p => Seq(p._1, p._2)).toSet
    assert(present == (0L until 1200L).toSet,
      s"members lost by the cap: ${(0L until 1200L).toSet -- present}")
  }

  test("a flood of DISTINCT near-identical vectors keeps every member") {
    // the shape the exact collapse cannot merge: 1200 DISTINCT
    // vectors jittered so tightly around one point that every
    // hyperplane signature agrees (one bucket per band, >> cap) and
    // every pairwise cosine ≈ 1. Pre-overflow, members past 512
    // silently lost ALL pairs on exactly dedup's target corpus;
    // the chained candidates must keep each one connected through
    // the exact-cosine verify.
    val dim = 8
    import spark.implicits._
    val rows = (0 until 1200).map { i =>
      (i.toLong, Seq.tabulate(dim)(d =>
        (if (d == 0) 1.0 else 0.1) + 1e-9 * ((i * 31 + d * 7) % 97)))
    }
    val df = rows.toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb"), l2Norm(col("emb")).as("nrm"))
    val pairs = SimilarityQueries.dedupNearEmbeddingFrom(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val present = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(present == (0L until 1200L).toSet,
      s"distinct-flood members lost: ${(0L until 1200L).toSet -- present}")
  }

  test("identical-vector flood collapses to star edges in the pair output") {
    // the full dedup path (not just the candidate stage): 1200 copies
    // of one vector — above BUCKET_CAP — must come back as 1199
    // sim=1.0 star edges to the min vec_id, every member present, no
    // C(cap,2) clique and no cap-induced membership loss
    val emb = Seq.tabulate(8)(i => if (i == 0) 1.0 else 0.1)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val flood = spark.range(1200).select(col("id").as("vec_id"),
      typedLit(emb).as("emb"))
      .withColumn("nrm", l2Norm(col("emb")))
    val pairs = SimilarityQueries.dedupNearEmbeddingFrom(flood)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 1199, s"want 1199 star edges, got ${pairs.length}")
    assert(pairs.forall { case (a, _, s) => a == 0L && s == 1.0 })
    assert(pairs.map(_._2).toSet == (1L until 1200L).toSet)
  }

  test("knn join ranks planted twins first") {
    val rnd = new scala.util.Random(43)
    val dim = 16
    val base = Seq.tabulate(150) { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))
    }
    val twins = Seq.tabulate(10) { i =>
      (1000L + i, base(i)._2.map(x => x + 1e-3 * rnd.nextGaussian()))
    }
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (base ++ twins).toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb"), l2Norm(col("emb")).as("nrm"))
    val knn = SimilarityQueries.simKnnJoinFrom(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // each planted twin's rank-1 neighbor should be its source (both
    // directions), for most of the 10 plants (LSH is approximate)
    val rank1 = knn.filter(_._3 == 1).map(t => t._1 -> t._2).toMap
    val hits = (0 until 10).count { i =>
      rank1.get(1000L + i).contains(i.toLong) ||
        rank1.get(i.toLong).contains(1000L + i)
    }
    assert(hits >= 8, s"only $hits/10 twins ranked first")
    // no vector exceeds KNN_K neighbors
    val perA = knn.groupBy(_._1).view.mapValues(_.length)
    assert(perA.values.forall(_ <= 3))
  }

  test("semantic dedup clusters identical-meaning plants with one keeper") {
    val rnd = new scala.util.Random(44)
    // 64-dim: random-noise cosines concentrate near 0 (σ ≈ 1/8), so a
    // noise vector bridging two meanings at ≥ SEM_T cannot occur and
    // any cross-meaning merge is a real defect
    val dim = 64
    // three ORTHOGONAL "meanings" (cross-meaning cosine ≈ 0, so a
    // merge across meanings would be a real bug, not fixture luck),
    // five near-copies each, plus unrelated noise
    val plants = (0 until 3).flatMap { m =>
      val proto = Array.tabulate(dim)(d => if (d == m) 1.0 else 0.0)
      (0 until 5).map(j =>
        ((m * 10 + j).toLong, proto.map(x => x + 1e-3 * rnd.nextGaussian())))
    }
    val noise = Seq.tabulate(100)(i =>
      (500L + i, Array.fill(dim)(rnd.nextGaussian())))
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (plants ++ noise).toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb"), l2Norm(col("emb")).as("nrm"))
    val clusters = SimilarityQueries.dedupSemanticFrom(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // each plant group lands in one cluster keyed by its min id
    for (m <- 0 until 3) {
      val ids = (0 until 5).map(j => (m * 10 + j).toLong).toSet
      val labels = clusters.filter(c => ids.contains(c._1)).map(_._2).toSet
      assert(labels == Set((m * 10).toLong),
        s"meaning $m split into clusters $labels")
    }
    assert(clusters.count(_._3 == 1) >= 3)
  }

  test("zero-norm vectors never enter the knn graph as NaN edges") {
    val rnd = new scala.util.Random(45)
    val dim = 8
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val zeros = Seq.tabulate(5)(i => (900L + i, Array.fill(dim)(0.0)))
    val real = Seq.tabulate(30)(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
    val df = (zeros ++ real).toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb"), l2Norm(col("emb")).as("nrm"))
    val knn = SimilarityQueries.simKnnJoinFrom(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(knn.forall { case (a, b, s) =>
      a < 900 && b < 900 && !s.isNaN })
  }

  test("planted near-duplicates survive the capped LSH") {
    val rnd = new scala.util.Random(42)
    val dim = 16
    val base = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))
    }
    // plant 10 near-dup twins of the first 10 vectors (tiny jitter)
    val twins = Seq.tabulate(10) { i =>
      val src = base(i)._2
      (1000L + i, src.map(x => x + 1e-3 * rnd.nextGaussian()))
    }
    import spark.implicits._
    val df = (base ++ twins).toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb"),
        l2Norm(col("emb")).as("nrm"))
    val pairs = SimilarityQueries.dedupNearEmbeddingFrom(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0 until 10).count { i =>
      pairs.contains((i.toLong, 1000L + i)) ||
        pairs.contains((1000L + i, i.toLong))
    }
    assert(found >= 8, s"only $found/10 planted near-dup pairs recalled")
  }

  test("planted corrupted vectors are flagged as outliers") {
    val rnd = new scala.util.Random(7)
    val dim = 16
    // one tight cluster around a fixed direction: inliers have norm
    // ~1 and centroid cosine ~1
    val center = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.1)
    val inliers = Seq.tabulate(100) { i =>
      (i.toLong, 0, center.map(x => x + 0.01 * rnd.nextGaussian()))
    }
    val blownNorm = (900L, 0, center.map(_ * 25.0)) // corrupted payload
    val wrongDir = (901L, 0, center.map(-_)) // lives opposite the cluster
    import spark.implicits._
    val df = (inliers :+ blownNorm :+ wrongDir)
      .toDF("vec_id", "label", "emb")
      .select(col("vec_id"), col("label"), col("emb"),
        l2Norm(col("emb")).as("nrm"))
    val flagged = SimilarityQueries.embOutliersFrom(df)
      .collect().map(_.getLong(0)).toSet
    assert(flagged.contains(900L), "norm outlier not flagged")
    assert(flagged.contains(901L), "direction outlier not flagged")
    // the tight cluster itself stays clean (tolerate a couple of
    // boundary flags from the corrupted vectors skewing the stats)
    assert((flagged - 900L - 901L).size <= 5,
      s"too many inliers flagged: ${flagged.size - 2}")
  }
}
