package graft.operators

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.embeddings

/** Product-quantization (PQ) sidecar for the persisted IVF vector
  * index — the memory/IO answer for ANN at 100 TB (Jégou, Douze,
  * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
  * 2011; the IVFADC layout FAISS popularized).
  *
  * The exact IVF serve ([[SimilarityQueries.annServeFrom]]) reads the
  * probed lists' FULL vectors: at d=768 float64 that is ~6 KB per
  * member, so probing 0.1% of a 10^10-vector corpus still scans ~60 GB
  * per query. The PQ sidecar stores each member as [[M]] one-byte
  * codes plus its norm (8-16 bytes — a 200-700× read reduction), and a
  * query scores candidates with an asymmetric-distance LUT (one
  * M×[[K]] table of query-to-codeword dot products, computed
  * driver-side in O(K·d) and broadcast) instead of a d-wide dot per
  * member. Recall against the exact serve is pinned in PqIndexSpec;
  * the sidecar is strictly additive — the exact lists stay the source
  * of truth and the refinement path.
  *
  * Layout under the vector-index root (sibling of assignments/):
  *
  *   pq/codebooks/  (sub, code, cent) — M×K sub-quantizer centroids,
  *     ≤ M·K·dsub doubles (d·K total ≈ 128 KB at d=64 — driver-read).
  *   pq/codes/cid=NN/ (vec_id, nrm, code BINARY(M)) — one row per
  *     assignment-list member, partition-pruned by the same probed
  *     cids as the exact serve.
  *
  * Consistency contract: the manifest records the assignments
  * fingerprint the sidecar was encoded from (`pq.fingerprint`). Any
  * ingest/compact/rebuild/repair moves that fingerprint, and the PQ
  * serve then FAILS LOUDLY asking for a sidecar rebuild — serving
  * stale codes would silently miss every vector landed since. Deletes
  * do NOT invalidate the sidecar: tombstones are anti-joined at serve
  * time exactly like the exact path, and compaction (which physically
  * removes them) moves the fingerprint anyway.
  *
  * Training is deterministic: the sample is the [[TrainSample]]
  * vectors with the smallest xxhash64(vec_id) (the ivfCentroids
  * discipline), k-means init is the first K sample subvectors in that
  * hash order, and Lloyd runs a fixed [[LloydIters]] sweeps in fixed
  * array order — two builds over one corpus produce byte-identical
  * codebooks and codes (spec-pinned), so the sidecar can be rebuilt
  * idempotently on any fleet node.
  */
object PqIndex {

  /** Subspaces per vector (code bytes per vector). */
  private[operators] val M = 8

  /** Codewords per subspace — byte-addressable by construction. */
  private[operators] val K = 256

  /** Deterministic training-sample bound: k-means over the sample is
    * driver-side O(TrainSample·K·d·iters) ≈ 1e9 flops at d=64 — build
    * cost, paid once per corpus generation. */
  private[operators] val TrainSample = 8192

  private[operators] val LloydIters = 6

  /** [sub][code][dsub] — ragged when d is not divisible by M. */
  private type Codebooks = Array[Array[Array[Double]]]

  /** Subspace s covers dims [start(s), start(s+1)) — the balanced
    * integer split, never empty while s < min(M, d). */
  private def subStart(d: Int, m: Int, s: Int): Int = (s.toLong * d / m).toInt

  private def nSubs(d: Int): Int = math.min(M, d)

  // ---------------------------------------------------------------
  // training + encoding kernels (pure, deterministic)
  // ---------------------------------------------------------------

  /** Training-grid quantum: sample coordinates snap to v·2²⁴ before
    * Lloyd so the per-cluster means accumulate as EXACT integer sums
    * — the refineCentroids discipline — making the whole codebook
    * training order-independent and replayable in the DuckDB oracle
    * (the step that kept sim_ann_ivf_pq rows-only). The 2⁻²⁴ snap is
    * far below the quantization error PQ itself introduces (K=256
    * codewords per 8-dim subspace), so recall is untouched
    * (spec-pinned). */
  private[operators] val TrainGrid = 16777216.0 // 2^24

  /** Lloyd k-means over one subspace of the GRID-SNAPPED sample; init
    * = first k sample rows, empty clusters keep their previous
    * centroid. Distances run in double over the snapped values (every
    * op an explicitly sequenced l2r IEEE fold); means divide exact
    * integer sums, so no step depends on accumulation order. */
  private def trainSub(sample: Array[Array[Double]], start: Int, end: Int,
      k: Int, iters: Int): Array[Array[Double]] = {
    val dsub = end - start
    val n = sample.length
    val kk = math.max(1, math.min(k, n))
    val cents = Array.tabulate(kk)(i =>
      java.util.Arrays.copyOfRange(sample(i), start, end))
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0
        var bd = Double.MaxValue
        var c = 0
        while (c < kk) {
          var dsq = 0.0
          var j = 0
          while (j < dsub) {
            val diff = sample(i)(start + j) - cents(c)(j)
            dsq += diff * diff
            j += 1
          }
          if (dsq < bd) { bd = dsq; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      // exact integer sums on the 2^24 grid (snapped inputs make the
      // floor a pure re-read of the integer, never a second rounding)
      val sums = Array.ofDim[Long](kk, dsub)
      val cnts = new Array[Int](kk)
      i = 0
      while (i < n) {
        val c = assign(i)
        cnts(c) += 1
        var j = 0
        while (j < dsub) {
          sums(c)(j) +=
            math.floor(sample(i)(start + j) * TrainGrid + 0.5).toLong
          j += 1
        }
        i += 1
      }
      var c = 0
      while (c < kk) {
        if (cnts(c) > 0) {
          var j = 0
          while (j < dsub) {
            cents(c)(j) = (sums(c)(j).toDouble / cnts(c).toDouble) / TrainGrid
            j += 1
          }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** Train all subspaces (JDK parallel stream — the subs are
    * independent and the driver has the cores). */
  private def train(sample: Array[Array[Double]], d: Int): Codebooks = {
    val m = nSubs(d)
    val out = new Array[Array[Array[Double]]](m)
    java.util.stream.IntStream.range(0, m).parallel().forEach { s =>
      out(s) = trainSub(sample, subStart(d, m, s), subStart(d, m, s + 1),
        K, LloydIters)
    }
    out
  }

  /** Nearest codeword per subspace → one byte each. */
  private def encodeOne(cb: Codebooks, d: Int, emb: Seq[Double]): Array[Byte] = {
    val m = cb.length
    val code = new Array[Byte](m)
    val ev = emb.toArray
    var s = 0
    while (s < m) {
      val start = subStart(d, m, s)
      val cents = cb(s)
      val dsub = cents(0).length
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var dsq = 0.0
        var j = 0
        val lim = math.min(dsub, math.max(0, ev.length - start))
        while (j < lim) {
          val diff = ev(start + j) - cents(c)(j)
          dsq += diff * diff
          j += 1
        }
        if (dsq < bd) { bd = dsq; best = c }
        c += 1
      }
      code(s) = best.toByte
      s += 1
    }
    code
  }

  /** ADC lookup table for one query: lut(sub)(code) = <q_sub, cent> so
    * Σ_sub lut(sub)(code(sub)) ≈ <q, v>. O(K·d) once per query. */
  private def buildLut(cb: Codebooks, d: Int, qv: Array[Double])
      : Array[Array[Double]] = {
    val m = cb.length
    Array.tabulate(m) { s =>
      val start = subStart(d, m, s)
      cb(s).map { cent =>
        var dot = 0.0
        var j = 0
        val lim = math.min(cent.length, math.max(0, qv.length - start))
        while (j < lim) { dot += qv(start + j) * cent(j); j += 1 }
        dot
      }
    }
  }

  // ---------------------------------------------------------------
  // sidecar build (maintenance op)
  // ---------------------------------------------------------------

  private def assignmentsFingerprint(root: String): String =
    IndexManifest.pathFingerprint(Paths.get(root, "assignments"))

  /** Whether the sidecar at `root` matches the live assignment lists.
    * Cost note: the fingerprint is a stat-only walk of assignments/ —
    * the same order of work as the file listing every parquet scan of
    * that directory performs at planning time, so the per-serve
    * freshness check adds no new asymptotic cost over the probe scan
    * it guards. */
  def sidecarFresh(root: String): Boolean = {
    val m = IndexManifest.readIfExists(root)
    m.get("pq.fingerprint").contains(assignmentsFingerprint(root))
  }

  /** Build (or rebuild) the PQ sidecar for the IVF index at `root`.
    * A maintenance op: it OVERWRITES pq/codes, which a concurrent PQ
    * serve could be mid-scan over, so it runs under the exclusive
    * lease like every other swap. No-ops when the sidecar is already
    * fresh. Returns the number of encoded assignment rows. */
  def buildSidecar(s: SparkSession, root: String): Long = {
    if (sidecarFresh(root)) return -1L
    IndexLease.withMaintenance(root) { doBuild(s, root) }
  }

  /** Refresh an EXISTING sidecar from inside a maintenance body that
    * already holds the exclusive lease (the lease is not reentrant).
    * The vector maintenance ops (compact/rebuild/repair) call this on
    * commit so a root that HAS a PQ sidecar comes out of scheduled
    * maintenance serveable on both paths, with no manual rebuild
    * step. Roots without a sidecar are untouched; ingest appends stay
    * stale-by-design (a per-batch re-encode would serialize the
    * stream on retraining — the serve's staleness refusal is the
    * guard there, and the next scheduled maintenance heals it). */
  private[operators] def refreshIfPresent(s: SparkSession, root: String): Unit =
    if (IndexManifest.readIfExists(root).contains("pq.m") &&
      !sidecarFresh(root)) { doBuild(s, root); () }

  private def doBuild(s: SparkSession, root: String): Long = {
    MemoBuilds.record("pq_sidecar");
    {
      // fingerprint FIRST: encoding races nothing (the lease excludes
      // appends' journal replays, and appends themselves land batch
      // dirs that would move this fingerprint → stale → rebuild)
      val fp = assignmentsFingerprint(root)
      val asg = s.read.schema(SimilarityQueries.AssignSchema)
        .parquet(s"$root/assignments")
      val sampleRows = asg.dropDuplicates("vec_id")
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(TrainSample)
        .select(col("emb")).collect()
      require(sampleRows.nonEmpty,
        s"vector index at $root has no assignment rows to train PQ on")
      // snap the TRAINING sample to the 2^24 grid (see TrainGrid) —
      // encoding still runs over the raw member embeddings
      val sample = sampleRows.map(_.getSeq[Double](0).toArray
        .map(v => math.floor(v * TrainGrid + 0.5) / TrainGrid))
      val d = sample.iterator.map(_.length).max
      val cb = train(sample, d)
      import s.implicits._
      cb.zipWithIndex.flatMap { case (cents, sub) =>
        cents.zipWithIndex.map { case (cent, code) =>
          (sub, code, cent.toSeq)
        }
      }.toSeq.toDF("sub", "code", "cent")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/pq/codebooks")
      val cbBc = s.sparkContext.broadcast(cb)
      val encodeUdf = udf { (emb: Seq[Double]) =>
        encodeOne(cbBc.value, d, emb)
      }
      asg.select(col("cid"), col("vec_id"), col("nrm"),
          encodeUdf(col("emb")).as("code"))
        .repartition(col("cid"))
        .write.partitionBy("cid").mode("overwrite")
        .parquet(s"$root/pq/codes")
      val n = s.read.schema(CodesSchema).parquet(s"$root/pq/codes").count()
      // manifest key LAST — marks a completed sidecar; a crash before
      // this line leaves pq.fingerprint absent/stale and the next
      // build simply re-encodes (the sidecar is derived data, so the
      // half-written state is never served and needs no journal)
      IndexManifest.update(root, Map(
        "pq.m" -> cb.length.toString, "pq.k" -> K.toString,
        "pq.dim" -> d.toString, "pq.fingerprint" -> fp))
      n
    }
  }

  // serve-time read schema (engine-owned layout — skips footer
  // inference, same discipline as AssignSchema)
  private val CodesSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("nrm", DoubleType),
      StructField("code", BinaryType),
      StructField("cid", LongType)))
  }

  /** Codebooks, memoized per root behind the codebooks-dir
    * fingerprint (the quantizerOf discipline — a sidecar rebuild moves
    * the fingerprint and refreshes the memo). ≤ d·K doubles. */
  private val codebooksCache =
    new BoundedMemo[(Int, Codebooks)](8, "pq_codebooks")

  private def codebooksOf(s: SparkSession, root: String): (Int, Codebooks) = {
    val fp = IndexManifest.pathFingerprint(Paths.get(root, "pq", "codebooks"))
    codebooksCache.get(root, fp).getOrElse {
      val m = IndexManifest.readIfExists(root)
      val d = m.getOrElse("pq.dim",
        sys.error(s"no PQ sidecar at $root — run PqIndex.buildSidecar")).toInt
      val rows = s.read.parquet(s"$root/pq/codebooks")
        .orderBy(col("sub"), col("code")).collect()
      val nSub = rows.iterator.map(_.getInt(0)).max + 1
      val cb: Codebooks = Array.tabulate(nSub) { sub =>
        rows.filter(_.getInt(0) == sub).sortBy(_.getInt(1))
          .map(_.getSeq[Double](2).toArray)
      }
      codebooksCache.put(root, fp, (d, cb))
      (d, cb)
    }
  }

  // ---------------------------------------------------------------
  // serve
  // ---------------------------------------------------------------

  /** Phase 1 as a lazy frame (spec-pinnable plan): the codes-only ADC
    * scan of the probed lists — tombstones anti-joined, soft
    * assignments deduped, top `shortN` vec_ids by ADC score. Builds
    * its own probes and LUT so the serve and the plan spec share one
    * definition. */
  private[operators] def adcShortlistForQuery(
      s: SparkSession, root: String,
      qv: Array[Double], qn: Double, shortN: Int,
      nprobe: Option[Int] = None): DataFrame = {
    val (d, cb) = codebooksOf(s, root)
    val cArr = SimilarityQueries.quantizerOf(s, root)
    val probeCids = SimilarityQueries.topCentroids(cArr,
      nprobe.getOrElse(SimilarityQueries.ivfNProbe(cArr.length)), qv, qn)
    val lutBc = s.sparkContext.broadcast(buildLut(cb, d, qv))
    val scoreUdf = udf { (code: Array[Byte], nrm: Double) =>
      val lut = lutBc.value
      var dot = 0.0
      var sub = 0
      while (sub < lut.length && sub < code.length) {
        dot += lut(sub)(code(sub) & 0xff)
        sub += 1
      }
      if (nrm == 0.0) 0.0 else dot / (qn * nrm)
    }
    val probed = s.read.schema(CodesSchema).parquet(s"$root/pq/codes")
      .filter(col("cid").isin(probeCids.map(Long.box): _*))
    // tombstones win immediately, same as the exact serve
    IndexDeletes.readDeletes(s, root, "vec_id")
      .fold(probed)(dl => probed.join(broadcast(dl), Seq("vec_id"), "left_anti"))
      .dropDuplicates("vec_id")
      .select(col("vec_id"), scoreUdf(col("code"), col("nrm")).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(shortN)
      .select(col("vec_id"))
  }

  /** Shortlist width for the exact-refinement pass, as a multiple of
    * the requested top-k (floor 64): the ADC scan ranks EVERY probed
    * candidate from codes alone, and only this many survivors get
    * their full vector re-read. Chosen from the measured curve on the
    * sf0.1 fixture — pure ADC@10 recalls ~0.48 on near-uniform 64-dim
    * data (quantization noise swamps the tight sim spread), while the
    * top-64 ADC shortlist contains the true top-10 almost always. */
  private[operators] val RefineFactor = 8
  private[operators] val RefineFloor = 64

  /** ANN top-k via asymmetric-distance scoring over the PQ codes of
    * the probed lists, refined by an exact re-rank of the shortlist —
    * the IVFADC-R shape (Jégou et al. 2011 §V; FAISS
    * IndexIVFPQR). Phase 1 reads ~M+8 bytes per probed candidate
    * (codes only) and keeps the top [[RefineFactor]]·k by ADC score;
    * phase 2 re-reads ONLY those vectors' full embeddings from the
    * probed list partitions and ranks them exactly — at 100 TB the
    * candidate scan shrinks 200-700× while the refine fetch is a
    * shortlist-sized point read, so serve IO is codes-shaped, not
    * corpus-shaped. Refuses loudly on a stale sidecar. Leased entry
    * point: [[IndexServe.annTopKPq]] (the shortlist collect below
    * executes inside the facade's serve lease). */
  private[operators] def annTopKPqFrom(
      s: SparkSession, root: String,
      qv: Array[Double], qn: Double, topK: Int = 10,
      nprobe: Option[Int] = None): DataFrame = {
    import s.implicits._
    require(sidecarFresh(root),
      s"PQ sidecar at $root is stale or absent (assignments changed " +
        "since it was encoded) — serving it would miss every vector " +
        "landed since; run PqIndex.buildSidecar(root) and retry")
    val cArr = SimilarityQueries.quantizerOf(s, root)
    val probeCids = SimilarityQueries.topCentroids(cArr,
      nprobe.getOrElse(SimilarityQueries.ivfNProbe(cArr.length)), qv, qn)
    val shortN = math.max(topK * RefineFactor, RefineFloor)
    val shortlist = adcShortlistForQuery(s, root, qv, qn, shortN, nprobe)
      .collect().map(_.getLong(0))
    // phase 2: exact cosine over the shortlist's full vectors — a
    // point read from the SAME probed partitions, ≤ shortN rows
    val q = Seq((qv.toSeq, qn)).toDF("qv", "qn")
    s.read.schema(SimilarityQueries.AssignSchema)
      .parquet(s"$root/assignments")
      .filter(col("cid").isin(probeCids.map(Long.box): _*))
      .filter(col("vec_id").isin(shortlist.map(Long.box): _*))
      .dropDuplicates("vec_id")
      .join(broadcast(q))
      .select(col("vec_id"),
        round(graft.functions.ArrayDot.arrayDot(col("emb"), col("qv")) /
          (col("nrm") * col("qn")), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(topK)
  }

  /** Batch form: ANN top-k for EVERY query in `queries` (query_id,
    * qv, qn) from the PQ codes in TWO jobs total — the amortized
    * concurrent-serve shape ([[SimilarityQueries.annServeBatchFrom]]'s
    * compressed twin). Phase 1 is ONE codes scan pruned to the union
    * of all probed lists, per-query routing via a broadcast (cid,
    * query_id) join, ADC scoring against a broadcast query_id→LUT map,
    * and a per-query shortlist from the TopKPerGroup heap operator.
    * Phase 2 is ONE pruned full-vector fetch filtered to the union
    * shortlist, re-joined to its queries by broadcast, exact cosine,
    * per-query top-k. Per-query results are hash-identical to N
    * single [[annTopKPqFrom]] serves (same LUT, same fold order, same
    * tie-breaks — spec-pinned). */
  private[operators] def annTopKPqBatchFrom(
      s: SparkSession, root: String,
      queries: DataFrame, topK: Int = 10,
      nprobe: Option[Int] = None): DataFrame = {
    import s.implicits._
    graft.GraftExtensions.register(s)
    require(sidecarFresh(root),
      s"PQ sidecar at $root is stale or absent — run " +
        "PqIndex.buildSidecar(root) and retry")
    val (d, cb) = codebooksOf(s, root)
    val cArr = SimilarityQueries.quantizerOf(s, root)
    val np = nprobe.getOrElse(SimilarityQueries.ivfNProbe(cArr.length))
    val qRows = queries
      .select(col("query_id").cast("long"), col("qv"), col("qn"))
      .collect().map { r =>
        (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2))
      }
    val probePairs = qRows.toSeq.flatMap { case (id, qv, qn) =>
      SimilarityQueries.topCentroids(cArr, np, qv, qn)
        .map(cid => (cid, id))
    }
    val luts: Map[Long, (Array[Array[Double]], Double)] =
      qRows.map { case (id, qv, qn) => id -> (buildLut(cb, d, qv), qn) }.toMap
    val lutBc = s.sparkContext.broadcast(luts)
    val adcUdf = udf { (qid: Long, code: Array[Byte], nrm: Double) =>
      val (lut, qn) = lutBc.value(qid)
      var dot = 0.0
      var sub = 0
      while (sub < lut.length && sub < code.length) {
        dot += lut(sub)(code(sub) & 0xff)
        sub += 1
      }
      if (nrm == 0.0) 0.0 else dot / (qn * nrm)
    }
    val probes = probePairs.toDF("cid", "query_id")
    val cids = probePairs.map(_._1).distinct
    val probed = s.read.schema(CodesSchema).parquet(s"$root/pq/codes")
      .filter(col("cid").isin(cids.map(Long.box): _*))
    val live = IndexDeletes.readDeletes(s, root, "vec_id")
      .fold(probed)(dl => probed.join(broadcast(dl), Seq("vec_id"), "left_anti"))
    val shortN = math.max(topK * RefineFactor, RefineFloor)
    val shortPairs = graft.plans.TopKPerGroup.topKPerGroup(
      live.join(broadcast(probes), Seq("cid"))
        .dropDuplicates("query_id", "vec_id")
        .select(col("query_id"), col("vec_id"),
          adcUdf(col("query_id"), col("code"), col("nrm")).as("adc")),
      keys = Seq("query_id"),
      orderBy = Seq(("adc", false), ("vec_id", true)), k = shortN)
      .select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val shortIds = shortPairs.map(_._2).distinct
    val shortDf = shortPairs.toSeq.toDF("query_id", "vec_id")
    val qDf = qRows.toSeq.map { case (id, qv, qn) => (id, qv.toSeq, qn) }
      .toDF("query_id", "qv", "qn")
    val fetched = s.read.schema(SimilarityQueries.AssignSchema)
      .parquet(s"$root/assignments")
      .filter(col("cid").isin(cids.map(Long.box): _*))
      .filter(col("vec_id").isin(shortIds.map(Long.box): _*))
      .dropDuplicates("vec_id")
      .join(broadcast(shortDf), Seq("vec_id"))
      .join(broadcast(qDf), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(graft.functions.ArrayDot.arrayDot(col("emb"), col("qv")) /
          (col("nrm") * col("qn")), 6).as("sim"))
    graft.plans.TopKPerGroup.topKPerGroup(fetched,
      keys = Seq("query_id"),
      orderBy = Seq(("sim", false), ("vec_id", true)), k = topK)
  }

  // ---------------------------------------------------------------
  // declared qids
  // ---------------------------------------------------------------

  private def builtRoot(s: SparkSession, dir: String): String = {
    val root = SimilarityQueries.buildVectorIndex(s, dir)
    buildSidecar(s, root)
    root
  }

  /** sim_ann_ivf_pq — sim_ann_ivf_indexed's answer served from the PQ
    * codes: same probes, ADC scores instead of exact cosine.
    * Approximate ⇒ rows-only; recall vs the exact serve, determinism,
    * staleness refusal and delete visibility are pinned in
    * PqIndexSpec. */
  def simAnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val root = builtRoot(s, dir)
    val e = SimilarityQueries.withNorm(embeddings(s, dir))
    val qRows = e.filter(col("vec_id") === 0)
      .select(col("emb"), col("nrm")).collect()
    if (qRows.isEmpty)
      return e.select(col("vec_id"), lit(0.0).as("sim")).limit(0)
    IndexServe.annTopKPq(s, root,
      qRows(0).getSeq[Double](0).toArray, qRows(0).getDouble(1))
  }

  /** sim_ann_pq_serve_batch — the compressed concurrent-serve shape:
    * the sim_ann_serve_batch query table answered from the PQ codes
    * in two jobs (one codes scan + one shortlist fetch). Approximate
    * ⇒ rows-only; per-query hash parity with N single PQ serves and
    * the one-scan plan are pinned in PqIndexSpec. */
  def simAnnPqServeBatch(s: SparkSession, dir: String): DataFrame = {
    val root = builtRoot(s, dir)
    val e = SimilarityQueries.withNorm(embeddings(s, dir))
    IndexServe.annTopKPqBatch(s, root,
      e.filter(col("vec_id").isin(
        SimilarityQueries.ANN_BATCH_IDS.map(Long.box): _*))
        .select(col("vec_id").as("query_id"),
          col("emb").as("qv"), col("nrm").as("qn")))
  }

  /** sim_ann_pq_audit — the sidecar's INVARIANT facts, all exactly
    * recomputable: every live assignment row encoded exactly once
    * (per (cid, vec_id)), every code exactly M bytes, norms copied
    * bit-exactly from the lists, fingerprint fresh. The float
    * codebooks ride Lloyd order and stay spec-pinned; the INTEGRITY of
    * the derived artifact is oracle-checked — the vector twin of
    * multimodal_decode_audit's split. */
  def simAnnPqAudit(s: SparkSession, dir: String): DataFrame = {
    val root = builtRoot(s, dir)
    val m = IndexManifest.readIfExists(root)
    val mSubs = m("pq.m").toInt
    val codes = s.read.schema(CodesSchema).parquet(s"$root/pq/codes")
    val asg = s.read.schema(SimilarityQueries.AssignSchema)
      .parquet(s"$root/assignments")
      .select(col("cid"), col("vec_id"), col("nrm").as("anrm"))
    val joined = codes.join(asg, Seq("cid", "vec_id"), "full_outer")
    joined.agg(
        countDistinct(col("vec_id")).as("n_vectors"),
        (count(lit(1)) === count(col("code")) &&
          count(lit(1)) === count(col("anrm"))).as("codes_complete"),
        (min(length(col("code"))) === mSubs &&
          max(length(col("code"))) === mSubs).as("code_width_ok"),
        (max(abs(col("nrm") - col("anrm"))) === 0.0).as("nrm_parity"))
      .withColumn("sidecar_fresh", lit(sidecarFresh(root)))
  }

  /** Degeneracy mirrors the assign kernel (null / zero-norm vectors
    * never enter the lists); the booleans are engine-computed facts
    * the oracle pins as TRUE — same convention as snk_vector_index. */
  val simAnnPqAuditSql: String =
    """SELECT
      |  (SELECT count(DISTINCT vec_id) FROM embeddings
      |   WHERE embedding IS NOT NULL
      |     AND list_sum(list_transform(embedding, x -> x * x)) > 0)
      |    AS n_vectors,
      |  TRUE AS codes_complete,
      |  TRUE AS code_width_ok,
      |  TRUE AS nrm_parity,
      |  TRUE AS sidecar_fresh""".stripMargin

  // ---------------------------------------------------------------
  // full recompute oracles (DuckDB)
  // ---------------------------------------------------------------

  /** The l2r fold Σ f(j) for j = 1..`len` — the shape every kernel
    * loop in this file compiles to (sequenced adds, no re-ordering). */
  private def foldSql(len: String, term: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(" +
      s"range(1, $len + 1), j -> $term)), (a, x) -> a + x)"

  /** Shared CTE suffix replaying the PQ sidecar on top of the IVF
    * build CTEs ([[SimilarityQueries.ivfBuildSqlCtes]]): the
    * xxhash64-ordered grid-snapped training sample, the full
    * [[LloydIters]]-sweep per-subspace Lloyd in ONE recursive CTE
    * (assignment argmin via min(struct) over the identical l2r
    * distance fold; per-(code, dim) EXACT 2²⁴-grid integer means;
    * empty codewords carried via the map-merge against the previous
    * state), and the per-member encoding of the probed lists — every
    * step an op-for-op mirror of [[trainSub]]/[[encodeOne]], which is
    * why the training sample is snapped to the grid in the first
    * place (see [[TrainGrid]]). */
  private def pqSqlCtes: String = {
    val signed = SimilarityQueries.signedXxhash64Sql("vec_id")
    val dsq = foldSql("len(c.cw)",
      "(v.sv[j] - c.cw[j]) * (v.sv[j] - c.cw[j])")
    s"""av AS MATERIALIZED (SELECT vec_id, any_value(emb) AS emb
       |  FROM asg2 JOIN nd USING (vec_id) GROUP BY vec_id),
       |smp AS MATERIALIZED (SELECT
       |    row_number() OVER (ORDER BY h, vec_id) AS rid,
       |    list_transform(emb,
       |      v -> floor(v * $TrainGrid + 0.5) / $TrainGrid) AS emb
       |  FROM (SELECT vec_id, emb, $signed AS h FROM av)
       |  ORDER BY h, vec_id LIMIT $TrainSample),
       |pqp AS (SELECT max(len(emb)) AS d,
       |    least($M, max(len(emb))) AS m,
       |    least($K, count(*)) AS kk
       |  FROM smp),
       |sub AS (SELECT s, 1 + (s * d) // m AS lo, ((s + 1) * d) // m AS hi
       |  FROM pqp, unnest(range(0, m)) t(s)),
       |svec AS MATERIALIZED (SELECT rid, s, list_slice(emb, lo, hi) AS sv
       |  FROM smp, sub),
       |cb(it, s, code, cw) AS (
       |  SELECT 0, s, rid, sv
       |  FROM svec WHERE rid <= (SELECT kk FROM pqp)
       |  UNION ALL
       |  SELECT o.it + 1, o.s, o.code, coalesce(m.cemb, o.cw)
       |  FROM (SELECT it, s, code, cw FROM cb
       |        WHERE it < $LloydIters) o
       |  LEFT JOIN (
       |    SELECT s2, code, list(el ORDER BY j) AS cemb
       |    FROM (
       |      SELECT s2, code, j,
       |        (CAST(sum(ve) AS DOUBLE) / CAST(count(*) AS DOUBLE))
       |          / $TrainGrid AS el
       |      FROM (
       |        SELECT s2, (b).code AS code,
       |          unnest(range(1, len(sv) + 1)) AS j,
       |          CAST(floor(unnest(sv) * $TrainGrid + 0.5) AS BIGINT)
       |            AS ve
       |        FROM (
       |          SELECT v.rid, v.s AS s2, v.sv,
       |            min(struct_pack(d := $dsq, code := c.code)) AS b
       |          FROM svec v
       |          JOIN (SELECT s, code, cw FROM cb
       |                WHERE it < $LloydIters) c
       |            ON v.s = c.s
       |          GROUP BY v.rid, v.s, v.sv
       |        )
       |      ) GROUP BY s2, code, j
       |    ) GROUP BY s2, code) m
       |    ON m.s2 = o.s AND m.code = o.code),
       |cw AS (SELECT b.s, u.lo, b.code, b.cw
       |  FROM cb b JOIN sub u USING (s) WHERE b.it = $LloydIters)""".stripMargin
  }

  /** Encoding + ADC + refine for ONE query CTE `q(qv, qn)` against
    * probed members `mem(vec_id, emb, nrm)` — the [[annTopKPqFrom]]
    * two-phase serve. */
  private def pqServeTailSql: String = {
    // fold lengths clamp to the vector's remaining dims (the
    // [[encodeOne]]/[[buildLut]] `lim`): a ragged short embedding
    // must contribute zero for its missing dims, not NULL the whole
    // distance via DuckDB's out-of-range list indexing
    val encDsq = foldSql(
      "least(len(c.cw), greatest(0, len(m.emb) - c.lo + 1))",
      "(m.emb[c.lo - 1 + j] - c.cw[j]) * (m.emb[c.lo - 1 + j] - c.cw[j])")
    val lutDot = foldSql(
      "least(len(c.cw), greatest(0, len(q.qv) - c.lo + 1))",
      "q.qv[c.lo - 1 + j] * c.cw[j]")
    s"""enc AS (SELECT m.vec_id, c.s,
       |    min(struct_pack(d := $encDsq, code := c.code)) AS b
       |  FROM mem m, cw c GROUP BY m.vec_id, c.s),
       |lut AS (SELECT c.s, c.code, $lutDot AS dot
       |  FROM cw c, q),
       |adc AS (SELECT e.vec_id,
       |    list_reduce(list_prepend(0.0, list(l.dot ORDER BY e.s)),
       |      (a, x) -> a + x) / (q.qn * any_value(m.nrm)) AS adc
       |  FROM enc e
       |  JOIN lut l ON l.s = e.s AND l.code = (e.b).code
       |  JOIN mem m ON m.vec_id = e.vec_id, q
       |  GROUP BY e.vec_id, q.qn),
       |short AS (SELECT vec_id FROM adc
       |  ORDER BY adc DESC, vec_id LIMIT ${10 * RefineFactor}),
       |fin AS (SELECT m.vec_id,
       |    round(${foldSql("least(len(m.emb), len(q.qv))",
              "m.emb[j] * q.qv[j]")}
       |      / (m.nrm * q.qn), 6) AS sim
       |  FROM short JOIN mem m USING (vec_id), q)""".stripMargin
  }

  /** sim_ann_ivf_pq oracle: IVF build → PQ train → encode → ADC
    * shortlist → exact refine, all replayed (hash equality on the
    * served rows — previously rows-only for the float-Lloyd
    * codebooks; the grid-snapped trainer closed that). */
  lazy val simAnnIvfPqSql: String =
    s"""WITH RECURSIVE ${SimilarityQueries.ivfBuildSqlCtes},
       |$pqSqlCtes,
       |q AS (SELECT emb AS qv, nrm AS qn FROM nd WHERE vec_id = 0),
       |probes AS (SELECT c.cid
       |  FROM (SELECT qv AS emb, qn AS nrm FROM q) v,
       |    cents c
       |  WHERE c.cnrm > 0 AND v.nrm > 0
       |  ORDER BY ${SimilarityQueries.ivfDotSql} / (v.nrm * c.cnrm)
       |    DESC, c.cid
       |  LIMIT (SELECT np FROM nprb)),
       |mem AS MATERIALIZED (SELECT v.vec_id, v.emb, v.nrm FROM nd v
       |  WHERE v.vec_id IN (
       |    SELECT DISTINCT vec_id FROM asg2 JOIN probes USING (cid))),
       |$pqServeTailSql
       |SELECT vec_id, sim FROM fin
       |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin

  /** sim_ann_pq_serve_batch oracle: the same chain per query id —
    * per-query probes at the serve width, ONE shared codebook/encode
    * replay, per-query ADC shortlist (row_number ≤ shortN over
    * (adc DESC, vec_id) — the TopKPerGroup order), per-query exact
    * top-10. */
  lazy val simAnnPqServeBatchSql: String = {
    val ids = SimilarityQueries.ANN_BATCH_IDS.mkString(", ")
    // same ragged-length clamp as [[pqServeTailSql]]
    val qDot = foldSql(
      "least(len(c.cw), greatest(0, len(q.qv) - c.lo + 1))",
      "q.qv[c.lo - 1 + j] * c.cw[j]")
    val encDsq = foldSql(
      "least(len(c.cw), greatest(0, len(m.emb) - c.lo + 1))",
      "(m.emb[c.lo - 1 + j] - c.cw[j]) * (m.emb[c.lo - 1 + j] - c.cw[j])")
    s"""WITH RECURSIVE ${SimilarityQueries.ivfBuildSqlCtes},
       |$pqSqlCtes,
       |qs AS (SELECT vec_id AS query_id, emb AS qv, nrm AS qn
       |  FROM nd WHERE vec_id IN ($ids)),
       |probes AS (SELECT query_id, cid FROM (
       |    SELECT q.query_id, c.cid,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${foldSql("least(len(q.qv), len(c.cemb))",
                "c.cemb[j] * q.qv[j]")}
       |          / (q.qn * c.cnrm) DESC, c.cid) AS rn
       |    FROM qs q, cents c WHERE c.cnrm > 0 AND q.qn > 0)
       |  WHERE rn <= (SELECT np FROM nprb)),
       |mem AS MATERIALIZED (SELECT v.vec_id, v.emb, v.nrm FROM nd v
       |  WHERE v.vec_id IN (
       |    SELECT DISTINCT a.vec_id
       |    FROM asg2 a JOIN probes p USING (cid))),
       |enc AS (SELECT m.vec_id, c.s,
       |    min(struct_pack(d := $encDsq, code := c.code)) AS b
       |  FROM mem m, cw c GROUP BY m.vec_id, c.s),
       |lut AS (SELECT q.query_id, c.s, c.code, $qDot AS dot
       |  FROM cw c, qs q),
       |pairs AS (SELECT DISTINCT p.query_id, a.vec_id
       |  FROM probes p JOIN asg2 a USING (cid)),
       |adc AS (SELECT pr.query_id, pr.vec_id,
       |    list_reduce(list_prepend(0.0, list(l.dot ORDER BY e.s)),
       |      (a, x) -> a + x)
       |      / (any_value(q.qn) * any_value(m.nrm)) AS adc
       |  FROM pairs pr
       |  JOIN enc e ON e.vec_id = pr.vec_id
       |  JOIN lut l ON l.query_id = pr.query_id AND l.s = e.s
       |    AND l.code = (e.b).code
       |  JOIN mem m ON m.vec_id = pr.vec_id
       |  JOIN qs q ON q.query_id = pr.query_id
       |  GROUP BY pr.query_id, pr.vec_id),
       |short AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY adc DESC, vec_id) AS rn
       |    FROM adc) WHERE rn <= ${10 * RefineFactor}),
       |fin AS (SELECT s.query_id, s.vec_id,
       |    round(${foldSql("least(len(m.emb), len(q.qv))",
              "m.emb[j] * q.qv[j]")}
       |      / (m.nrm * q.qn), 6) AS sim
       |  FROM short s JOIN mem m USING (vec_id)
       |  JOIN qs q ON q.query_id = s.query_id)
       |SELECT query_id, vec_id, sim FROM (
       |  SELECT query_id, vec_id, sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, vec_id) AS rk
       |  FROM fin) WHERE rk <= 10""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_ivf_pq" -> (simAnnIvfPq _),
    "sim_ann_pq_serve_batch" -> (simAnnPqServeBatch _),
    "sim_ann_pq_audit" -> (simAnnPqAudit _)
  )

  def oracle: Map[String, String] = Map(
    "sim_ann_ivf_pq" -> simAnnIvfPqSql,
    "sim_ann_pq_serve_batch" -> simAnnPqServeBatchSql,
    "sim_ann_pq_audit" -> simAnnPqAuditSql
  )
}
