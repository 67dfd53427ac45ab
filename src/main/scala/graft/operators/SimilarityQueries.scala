package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.ArrayDot.{arrayDot, l2Norm}
import graft.functions.{FastSig, VectorFunctions}

/** Similarity search over the `embeddings` table (SURVEY.md §2.11).
  *
  * Scale design: brute-force cosine is the exact baseline — a single
  * scan, the query vector broadcast, top-k via TakeOrderedAndProject
  * (per-partition heaps, no global sort). Dot products run through
  * the codegen'd ArrayDotProduct expression; norms are computed once
  * per vector BEFORE any join, so a pair costs exactly one array
  * traversal. The LSH path buckets with one-pass random-hyperplane
  * signatures so candidate generation is an equi-join; at 100 TB only
  * bucket-mates are scored. Pairwise similarity is blocked (label
  * here, LSH bucket in general) — never an unblocked cross join.
  */
object SimilarityQueries {

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", l2Norm(col("emb")))

  /** sim_topk_cosine — exact top-10 nearest to the vec_id=0 embedding.
    * Broadcast 1-row query side; double-precision cosine; rounded sort
    * key + vec_id tiebreak for cross-engine determinism. */
  def simTopkCosine(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(embeddings(s, dir))
    val q = e.filter(col("vec_id") === 0)
      .select(col("emb").as("qv"), col("nrm").as("qn"))
    e.join(broadcast(q))
      .select(col("vec_id"),
        round(arrayDot(col("emb"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  val simTopkCosineSql: String =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
      |           FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id,
      |  round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6)
      |    AS sim
      |FROM embeddings, q
      |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin

  /** sim_pairwise_threshold — all pairs above cosine 0.4 within label
    * blocks: block equi-join + filter; norms precomputed per side. */
  def simPairwiseThreshold(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(embeddings(s, dir))
    val a = e.select(col("label"), col("vec_id").as("a"),
      col("emb").as("ea"), col("nrm").as("na"))
    val b = e.select(col("label"), col("vec_id").as("b"),
      col("emb").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("label"))
      .filter(col("a") < col("b"))
      .withColumn("sim",
        round(arrayDot(col("ea"), col("eb")) / (col("na") * col("nb")), 4))
      .filter(col("sim") >= 0.4)
      .select(col("label"), col("a"), col("b"), col("sim"))
  }

  val simPairwiseThresholdSql: String =
    """SELECT x.label AS label, x.vec_id AS a, y.vec_id AS b,
      |  round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
      |    CAST(y.embedding AS DOUBLE[])), 4) AS sim
      |FROM embeddings x JOIN embeddings y
      |  ON x.label = y.label AND x.vec_id < y.vec_id
      |WHERE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
      |    CAST(y.embedding AS DOUBLE[])), 4) >= 0.4""".stripMargin

  private val SIG_BITS = 64
  private val N_BANDS = 8 // 8-bit bands: 256 buckets/band, not 16
  /** Skew guard: a (band, bh) bucket keeps at most this many members
    * (deterministic first-by-vec_id). Degenerate corpora (millions of
    * identical/zero vectors hashing to one bucket) otherwise make the
    * band self-join quadratic — the same stop-gram discipline as
    * text_containment's maxDf cap. Identical-vector floods are exact
    * dedup's job, not LSH's. */
  private val BUCKET_CAP = 512

  /** sim_ann_lsh — approximate top-10 for the vec_id=0 query via
    * random-hyperplane LSH: 64-bit one-pass signature, 8 bands × 8
    * bits, multi-probe (each band hash plus its 8 single-bit flips)
    * on the broadcast query side. Candidates share a probed bucket
    * with the query; exact cosine re-rank on candidates only. Wide
    * bands bound candidate volume to the probed buckets' population
    * (capped); multi-probe restores recall. Approximate ⇒ rows-only;
    * recall vs brute force property-tested. */
  def simAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(embeddings(s, dir))
      .withColumn("sig", FastSig.hyperplaneSigFast(SIG_BITS)(col("emb")))
    val bands = e.select(col("vec_id"), col("emb"), col("nrm"),
      explode(VectorFunctions.sigBands(col("sig"), SIG_BITS, N_BANDS)).as("bb"))
      .select(col("vec_id"), col("emb"), col("nrm"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))
    // query probes its own buckets plus Hamming-1 neighbors: 72 keys,
    // trivially broadcast
    val qProbes = e.filter(col("vec_id") === 0)
      .select(col("emb").as("qv"), col("nrm").as("qn"),
        explode(VectorFunctions.sigBandProbes(col("sig"), SIG_BITS, N_BANDS))
          .as("bb"))
      .select(col("bb.band").as("band"), col("bb.bh").as("bh"),
        col("qv"), col("qn"))
    bands.join(broadcast(qProbes), Seq("band", "bh"))
      .select(col("vec_id"), col("emb"), col("nrm"), col("qv"), col("qn"))
      .dropDuplicates("vec_id")
      .select(col("vec_id"),
        round(arrayDot(col("emb"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** dedup_near_embedding — embedding-cosine near-dup candidates via
    * LSH bucketing: 64-bit hyperplane signature, 8 bands × 8 bits,
    * multi-probe on one join side (Hamming-≤1 within a band), exact
    * cosine ≥ 0.45 on candidates only. At 100 TB this is the dedup
    * pass for embedding-indexed corpora: candidate volume is bounded
    * by Σ_buckets |bucket|² with |bucket| ≤ BUCKET_CAP — never an
    * all-pairs product, and never quadratic in corpus size the way
    * narrow (4-bit) bands were. Approximate recall ⇒ rows-only;
    * bucket bound property-tested on a skewed fixture. */
  def dedupNearEmbedding(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = withNorm(embeddings(s, dir))
    val sigs = e.select(col("vec_id"),
      FastSig.hyperplaneSigFast(SIG_BITS)(col("emb")).as("sig"))
    // exact band buckets, capped per (band, bh) — deterministic
    // first-BUCKET_CAP members by vec_id (skew guard; see BUCKET_CAP)
    val bands = sigs.select(col("vec_id"),
      explode(VectorFunctions.sigBands(col("sig"), SIG_BITS, N_BANDS)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("band"), col("bh")).orderBy(col("vec_id"))))
      .filter(col("rn") <= BUCKET_CAP)
      .drop("rn")
    // probe side carries Hamming-≤1 band neighbors so a one-bit
    // signature disagreement within a band still collides
    val probes = sigs.select(col("vec_id"),
      explode(VectorFunctions.sigBandProbes(col("sig"), SIG_BITS, N_BANDS))
        .as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    // candidates carry ids only; embeddings re-joined afterwards
    val cands = probes.select(col("band"), col("bh"), col("vec_id").as("a"))
      .join(bands.select(col("band"), col("bh"), col("vec_id").as("b")),
        Seq("band", "bh"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .dropDuplicates("a", "b")
    cands
      .join(e.select(col("vec_id").as("a"), col("emb").as("ea"),
        col("nrm").as("na")), Seq("a"))
      .join(e.select(col("vec_id").as("b"), col("emb").as("eb"),
        col("nrm").as("nb")), Seq("b"))
      .withColumn("sim",
        round(arrayDot(col("ea"), col("eb")) / (col("na") * col("nb")), 4))
      .filter(col("sim") >= 0.45)
      .select(col("a"), col("b"), col("sim"))
  }

  /** Coarse-quantizer size: k = ⌈√n⌉, hard-capped so the broadcast
    * stays bounded no matter the corpus (65,536 × 64-dim doubles ≈
    * 33 MB). √n balances list length (n/k) against probe cost (k). */
  private[operators] def ivfK(n: Long): Int =
    math.min(math.max(4, math.ceil(math.sqrt(n.toDouble)).toLong), 65536L).toInt

  /** Deterministic bounded centroid sample: the k vectors with the
    * smallest hash — a TakeOrderedAndProject (per-partition heaps of
    * size k), so the driver and the broadcast hold exactly
    * min(k, n) rows regardless of corpus size. */
  private[operators] def ivfCentroids(e: DataFrame, k: Int): DataFrame =
    e.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"),
        col("nrm").as("cnrm"))

  /** sim_ann_ivf — IVF-style ANN: a deterministic centroid sample
    * (coarse quantizer) is broadcast; every vector joins its nearest
    * centroid (inverted lists); the query probes the nprobe=3 nearest
    * lists and exact-scores only their members. At 100 TB the
    * centroid table stays broadcast-sized — k = ⌈√n⌉ capped at 65,536
    * (ivfK enforces what this comment promises) — assignment is a
    * map-side broadcast join, and the probe touches ~nprobe/k of the
    * data. The one-scan count() for n is a driver scalar, same
    * discipline as text_tfidf. Approximate ⇒ rows-only; recall and
    * the centroid bound are property-tested. */
  def simAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(embeddings(s, dir))
    val cents = ivfCentroids(e, ivfK(e.count()))
    val sim = arrayDot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm"))
    // inverted lists: nearest centroid per vector (map-side broadcast)
    val assigned = e.join(broadcast(cents))
      .select(col("vec_id"), col("emb"), col("nrm"), col("cid"),
        sim.as("csim"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("csim"), col("cid"))).as("cid"),
        first(col("emb")).as("emb"), first(col("nrm")).as("nrm"))
    // query probes its 3 nearest centroid lists
    val q = e.filter(col("vec_id") === 0)
      .select(col("emb").as("qv"), col("nrm").as("qn"))
    val probes = cents.join(broadcast(q))
      .select(col("cid"),
        (arrayDot(col("cemb"), col("qv")) / (col("cnrm") * col("qn")))
          .as("csim"))
      .orderBy(col("csim").desc, col("cid")).limit(3)
      .select(col("cid"))
    assigned.join(broadcast(probes), Seq("cid"))
      .join(broadcast(q))
      .select(col("vec_id"),
        round(arrayDot(col("emb"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_cosine" -> (simTopkCosine _),
    "sim_pairwise_threshold" -> (simPairwiseThreshold _),
    "sim_ann_lsh" -> (simAnnLsh _),
    "sim_ann_ivf" -> (simAnnIvf _),
    "dedup_near_embedding" -> (dedupNearEmbedding _)
  )

  def oracle: Map[String, String] = Map(
    "sim_topk_cosine" -> simTopkCosineSql,
    "sim_pairwise_threshold" -> simPairwiseThresholdSql
    // sim_ann_lsh: approximate — recall property-tested
  )
}
