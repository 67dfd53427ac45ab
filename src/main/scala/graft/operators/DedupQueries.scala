package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.{FastSig, TextFunctions}

/** Deduplication operators over `documents` (SURVEY.md §2.11): exact
  * hash dedup, blocked n-gram Jaccard, MinHash+LSH, SimHash — the
  * dedup half of a training-data pipeline.
  *
  * Scale design: every near-dup path is candidate-generation by
  * EQUI-join (block key / LSH band / SimHash band) followed by exact
  * verification on the candidates only — never an all-pairs product.
  * Band joins carry only (band, hash, doc_id); shingle sets are
  * re-joined for the (small) candidate set afterwards, so the wide
  * arrays never ride through the shuffle. Signatures are one-pass
  * kernels (FastSig), hashed shingles are sorted long arrays with
  * merge-join Jaccard.
  */
object DedupQueries {

  private val SHINGLE_K = 3
  private val NUM_PERM = 16
  private val N_BANDS = 4
  private val JACCARD_T = 0.8

  /** dedup_exact — content-hash dedup: one keeper (min doc_id) per
    * distinct text, with multiplicity. Single hash agg on sha256. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    dedupExactFrom(documents(s, dir))

  /** Shared core — pipeline_clean_corpus derives its stage-1 keeper
    * set from this same aggregate, so the exact-dedup rule lives in
    * one place. */
  private[graft] def dedupExactFrom(docs: DataFrame): DataFrame =
    docs
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val dedupExactSql: String =
    """SELECT sha256(text) AS content_hash, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY sha256(text)""".stripMargin

  /** Skew guard for the prefix block: a block keeps only its first
    * BLOCK_CAP docs by doc_id, so the self-join is ≤ C(BLOCK_CAP, 2)
    * pairs per block no matter how boilerplate-heavy the corpus — a
    * million docs sharing one 32-char prefix would otherwise be an
    * all-pairs product. Members past the cap lose their pairs, the
    * same documented trade as BUCKET_CAP in dedup_near_embedding
    * (identical-text floods are exact dedup's job). Mirrored verbatim
    * in the DuckDB oracle so the hash-compare sees the same drop. */
  private val BLOCK_CAP = 256

  private def shingled(s: SparkSession, dir: String): DataFrame =
    shingledFrom(documents(s, dir))

  private def shingledFrom(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      substring(col("text"), 1, 32).as("blk"),
      FastSig.hashedShingles(SHINGLE_K)(col("text")).as("shin"))

  /** dedup_ngram_jaccard — exact word-3-gram Jaccard over candidate
    * pairs blocked on a text prefix (cheap, high-recall block for
    * near-identical docs), blocks capped at BLOCK_CAP members. The
    * window's hash-partitioning on blk is the same key the self-join
    * shuffles on, so the cap adds no extra exchange. Jaccard over
    * hashed shingle sets — same value as string sets modulo 2⁻⁶⁴
    * collisions ⇒ oracle-checked. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    dedupNgramJaccardFrom(documents(s, dir))

  /** DataFrame-level core (doc_id, text) so the skew-fixture test can
    * drive an oversized block through the cap directly. */
  /** The load-bearing skew cap: first BLOCK_CAP members per block by
    * doc_id — ONE definition for the full self-join and the
    * incremental near stage (both oracles mirror it verbatim). */
  private def capBlocks(d: DataFrame): DataFrame =
    SkewUtils.capPerKey(d, Seq("blk"), "doc_id", BLOCK_CAP)

  private[graft] def dedupNgramJaccardFrom(docs: DataFrame): DataFrame = {
    val d = capBlocks(shingledFrom(docs))
    val a = d.select(col("blk"), col("doc_id").as("a"), col("shin").as("sa"))
    val b = d.select(col("blk"), col("doc_id").as("b"), col("shin").as("sb"))
    a.join(b, Seq("blk"))
      .filter(col("a") < col("b"))
      .withColumn("jac",
        round(FastSig.jaccardSorted(col("sa"), col("sb")), 4))
      .filter(col("jac") >= JACCARD_T)
      .select(col("a"), col("b"), col("jac"))
  }

  val dedupNgramJaccardSql: String =
    s"""WITH d0 AS (
      |  SELECT doc_id, substr(text, 1, 32) AS blk,
      |    list_distinct(CASE WHEN len(string_split(text,' ')) < 3
      |      THEN [text]
      |      ELSE list_transform(
      |        generate_series(1, len(string_split(text,' ')) - 2),
      |        i -> string_split(text,' ')[i] || ' ' ||
      |             string_split(text,' ')[i+1] || ' ' ||
      |             string_split(text,' ')[i+2]) END) AS shin
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, blk, shin FROM (
      |    SELECT d0.*, row_number() OVER
      |      (PARTITION BY blk ORDER BY doc_id) AS rn FROM d0)
      |  WHERE rn <= $BLOCK_CAP)
      |SELECT x.doc_id AS a, y.doc_id AS b,
      |  round(CAST(len(list_intersect(x.shin, y.shin)) AS DOUBLE) /
      |        len(list_distinct(list_concat(x.shin, y.shin))), 4) AS jac
      |FROM d x JOIN d y ON x.blk = y.blk AND x.doc_id < y.doc_id
      |WHERE round(CAST(len(list_intersect(x.shin, y.shin)) AS DOUBLE) /
      |      len(list_distinct(list_concat(x.shin, y.shin))), 4) >= 0.8""".stripMargin

  /** Exact-content collapse shared by the signature-LSH near-dup
    * paths (simhash / minhash): one representative (min doc_id) per
    * distinct text. Verbatim duplicates are precisely the corpus LSH
    * band buckets choke on — identical texts share EVERY band, so a
    * dup-heavy corpus (dedup's own target) piles whole copy-classes
    * into single buckets and an uncapped self-join goes |class|²
    * (measured 72× time for 10× data on the replicated sf1.0 fixture
    * before this stage existed). Collapsing first means banding sees
    * one row per CONTENT; copy-class members re-enter the output as
    * linear STAR edges to their representative (rep < member since
    * rep = min id), which preserves exactly the connected components
    * of the old intra-class cliques at O(n) instead of O(n²) edges —
    * cluster membership is fully recoverable, only the redundant
    * transitive pairs are gone. Returns (d0 = doc_id/text/ch,
    * reps = ch/doc_id). */
  private def exactCollapse(docs: DataFrame): (DataFrame, DataFrame) = {
    val d0 = docs.select(col("doc_id"), sha2(col("text"), 256).as("ch"))
    // the representative CARRIES its text out of the aggregate
    // (first() is safe: every text in a ch-group is identical by
    // construction, so whichever partial wins yields the same value)
    // — no join back against the corpus, and partial aggregation
    // collapses a verbatim flood map-side before it ever shuffles
    val reps = docs.select(col("doc_id"), col("text"),
        sha2(col("text"), 256).as("ch"))
      .groupBy(col("ch"))
      .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
    (d0, reps)
  }

  /** The member→representative star edges of [[exactCollapse]], with
    * a caller-chosen score column for the (identical-content) pair. */
  private def starEdges(d0: DataFrame, reps: DataFrame,
      score: org.apache.spark.sql.Column): DataFrame =
    d0.join(reps.select(col("ch"), col("doc_id").as("a")), Seq("ch"))
      .filter(col("doc_id") =!= col("a"))
      .select(col("a"), col("doc_id").as("b"), score)

  /** dedup_near_minhash — exact-collapse, then MinHash(16 perms) +
    * LSH(4 bands × 4 rows) over the representatives: candidates =
    * rep pairs sharing ≥1 band bucket (equi-join on (band, bandhash),
    * ids only); verified with exact Jaccard ≥ 0.8 after re-joining
    * shingle sets for the candidates; copy-class members appear as
    * jac=1.0 star edges to their representative. Catches near-dups
    * regardless of edit position (no prefix-block assumption).
    * Oracle: full DuckDB HUGEINT recompute of the splitmix shingle
    * fold, permutations, bands, and verify ([[dedupNearMinhashSql]]);
    * component-level recall vs the exact Jaccard ground truth is
    * additionally property-tested. */
  def dedupNearMinhash(s: SparkSession, dir: String): DataFrame =
    dedupNearMinhashFrom(documents(s, dir))

  /** Band-bucket cap for the MinHash rep join — same layered flood
    * guard as simhash: verbatim copies never reach the bands (exact
    * collapse), distinct near-identical floods (e.g. texts sharing
    * one shingle SET at different repetition counts) cap at 512 with
    * members past it CHAINED to in-cap anchors through the same
    * exact-Jaccard verify, so no member silently loses its
    * component. */
  private val MINHASH_BAND_CAP = 512

  private[graft] def dedupNearMinhashFrom(docs: DataFrame): DataFrame = {
    val (d0, reps) = exactCollapse(docs)
    // NOT checkpointed (unlike dedup_simhash's 16-byte sig frame): the
    // shingle arrays are token-sized per row, and materializing them
    // measured SLOWER (1.1 → 2.0 s) than letting the three consumers
    // recompute the fold over the runtime-reused collapse exchange.
    val d = shingledFrom(reps.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("shin"))
    val (bands, overflow) = SkewUtils.capPerKeyWithOverflow(
      d.select(col("doc_id"),
        posexplode(FastSig.bandHashes(N_BANDS)(
          FastSig.minhashSig(NUM_PERM)(col("shin")))))
        .toDF("doc_id", "band", "bh"),
      Seq("band", "bh"), "doc_id", MINHASH_BAND_CAP)
    val cands = bands.select(col("band"), col("bh"), col("doc_id").as("a"))
      .join(bands.select(col("band"), col("bh"), col("doc_id").as("b")),
        Seq("band", "bh"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .unionByName(overflow)
      .dropDuplicates("a", "b")
    cands
      .join(d.select(col("doc_id").as("a"), col("shin").as("sa")), Seq("a"))
      .join(d.select(col("doc_id").as("b"), col("shin").as("sb")), Seq("b"))
      .withColumn("jac",
        round(FastSig.jaccardSorted(col("sa"), col("sb")), 4))
      .filter(col("jac") >= JACCARD_T)
      .select(col("a"), col("b"), col("jac"))
      .unionByName(starEdges(d0, reps, lit(1.0).as("jac")))
  }

  /** Band-bucket cap for the SimHash rep join. After the exact
    * collapse buckets hold DISTINCT texts only, so saturating it
    * takes ≥512 distinct near-identical contents agreeing on a
    * 16-bit band — a templated/permuted-corpus shape. Members past
    * the cap are NOT dropped (capPerKeyWithOverflow): each chains
    * rank-minus-cap as one extra candidate pair through the same
    * Hamming verify — candidate-level connectivity, with a
    * component splitting only where a chain link fails the verify
    * (the motivating permuted/templated shapes verify at hamming 0,
    * spec-pinned). Candidate work stays bounded at
    * buckets × (cap² + overflow). */
  private val SIMHASH_BAND_CAP = 512

  /** dedup_simhash — exact-collapse, then 64-bit SimHash with
    * 4×16-bit band candidates over the representatives, verified by
    * Hamming distance ≤ 6; copy-class members appear as hamming=0
    * star edges to their representative. Near-identical docs differ
    * in few bits; banding guarantees candidates for distance ≤ 3 and
    * catches most ≤ 6. Oracle: full DuckDB recompute of the murmur3
    * token hashes, bit-majority signature, bands, and Hamming verify
    * ([[dedupSimhashSql]]). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    dedupSimhashFrom(documents(s, dir))

  private[graft] def dedupSimhashFrom(docs: DataFrame): DataFrame = {
    val (d0, reps) = exactCollapse(docs)
    // Checkpointed: three consumers (band explode, the two Hamming
    // verify joins) otherwise each re-ran the collapse + the 64-bit
    // SimHash fold over the full texts (guide §7.2 — profiled 3×
    // ~200 ms single-task recomputes per call at sf0.1). 16 bytes a
    // row; ContextCleaner-reclaimed.
    val d = reps.select(col("doc_id"),
      TextFunctions.simhash64(TextFunctions.tokens(col("text")))
        .as("sig"))
      .localCheckpoint(false)
    // ids only through the cap window — the verify re-joins sigs for
    // the surviving candidates, so the sig never rides the exchange
    val (bands, overflow) = SkewUtils.capPerKeyWithOverflow(
      d.select(col("doc_id"),
        explode(graft.functions.VectorFunctions.sigBands(col("sig"), 64, 4))
          .as("bb"))
        .select(col("doc_id"),
          col("bb.band").as("band"), col("bb.bh").as("bh")),
      Seq("band", "bh"), "doc_id", SIMHASH_BAND_CAP)
    val bucketCands = bands
      .select(col("band"), col("bh"), col("doc_id").as("a"))
      .join(bands.select(col("band"), col("bh"), col("doc_id").as("b")),
        Seq("band", "bh"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
    // overflow chains go through the SAME verify as bucket candidates
    bucketCands.unionByName(overflow)
      .dropDuplicates("a", "b")
      .join(d.select(col("doc_id").as("a"), col("sig").as("siga")),
        Seq("a"))
      .join(d.select(col("doc_id").as("b"), col("sig").as("sigb")),
        Seq("b"))
      .withColumn("hamming",
        TextFunctions.hamming64(col("siga"), col("sigb")))
      .filter(col("hamming") <= 6)
      .select(col("a"), col("b"), col("hamming"))
      .unionByName(starEdges(d0, reps, lit(0).as("hamming")))
  }

  /** Iteration bound for connected-components label propagation.
    * Each round propagates labels one edge hop AND one
    * pointer-doubling hop (label-of-label), so rounds grow with
    * log₂(component diameter): 20 rounds covers any component a real
    * corpus can produce. If the cap is ever hit unconverged the
    * operator throws rather than return silently wrong labels. */
  private val CC_MAX_ITERS = 20

  /** dedup_cluster_cc — connected components over the verified
    * near-dup pairs (the oracle-green n-gram-Jaccard pairs as edges):
    * every doc in a component gets the component's min doc_id as its
    * cluster label, and the label-holder is the keeper — pairs→
    * clusters is the step that turns pairwise dedup into "keep one
    * per duplicate group" in a training pipeline.
    *
    * Scale design: min-label propagation with pointer doubling —
    * per round, a node takes the min of its own label, its
    * neighbors' labels (one equi-join), and its label's label (one
    * self-join: the path-halving shortcut), then one min-agg; every
    * shuffle is on the node key. Labels only decrease, so
    * convergence is detected by an unchanged label sum; the doubling
    * hop makes rounds O(log diameter), hard-capped at CC_MAX_ITERS
    * (throws if unconverged — never silently wrong labels).
    * localCheckpoint here truncates the per-round lineage of a
    * 16-byte-per-edge-endpoint frontier — bounded by the pair count,
    * not by data partitions (unlike the snk_upsert case round 2
    * flagged). */
  def dedupClusterCc(s: SparkSession, dir: String): DataFrame =
    clustersFrom(
      dedupNgramJaccardFrom(documents(s, dir)).select(col("a"), col("b")))

  /** Edge-count ceiling for the driver union-find shortcut: 2²⁰ pairs
    * ≈ 16 MB collected — far under driver headroom, far over any
    * near-dup pair set a healthy dedup produces per run. Above it the
    * distributed pointer-doubling loop runs; below it the iterative
    * loop's per-round job latency (2 joins + agg + sum × O(log d)
    * rounds) would dominate the actual work, so the driver computes
    * the SAME components in one pass (equality property-tested). */
  private[graft] val DRIVER_CC_MAX = 1 << 20

  /** Pairs (a, b) → (doc_id, cluster_id, is_keeper); exposed for the
    * chain-diameter and transitivity tests. `driverMax` is overridden
    * to 0 in tests to force the distributed path. */
  private[graft] def clustersFrom(pairs: DataFrame,
      driverMax: Long = DRIVER_CC_MAX): DataFrame = {
    val edges = pairs.select(col("a").as("x"), col("b").as("y"))
      .union(pairs.select(col("b").as("x"), col("a").as("y")))
      .persist()
    val nEdges = edges.count() / 2
    if (nEdges <= driverMax) {
      val spark = pairs.sparkSession
      import spark.implicits._
      // collect from the PERSISTED doubled frame (x<=y keeps each
      // undirected edge once, and both copies of a self-loop) —
      // collecting `pairs` would recompute the expensive upstream
      // candidate join the count() just materialized into the cache
      val es = edges.filter(col("x") <= col("y"))
        .select(col("x").cast("long"), col("y").cast("long"))
        .as[(Long, Long)].collect()
      edges.unpersist()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent(c); parent.update(c, r); c = nxt
        }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // min-label union: the component root is its min member, the
        // exact labels the distributed loop converges to
        if (ra < rb) parent.update(rb, ra)
        else if (rb < ra) parent.update(ra, rb)
      }
      val rows = parent.keys.toSeq.sorted.map { v =>
        val r = find(v)
        (v, r, if (v == r) 1 else 0)
      }
      return spark.createDataFrame(rows)
        .toDF("doc_id", "cluster_id", "is_keeper")
    }
    var labels = edges.groupBy(col("x")).agg(min(col("y")).as("mn"))
      .select(col("x"), least(col("x"), col("mn")).as("lbl"))
      .localCheckpoint()
    def labelSum(df: DataFrame): Long = {
      val row = df.agg(sum(col("lbl"))).first()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
    var tot = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < CC_MAX_ITERS) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("x", "y"), "y")
        .select(col("x"), col("lbl"))
      // pointer doubling: x also adopts label(label(x)), halving
      // chain depth every round — O(log diameter) total rounds
      val viaLabels = labels
        .join(labels.select(col("x").as("lbl"), col("lbl").as("lbl2")),
          "lbl")
        .select(col("x"), col("lbl2").as("lbl"))
      val next = viaNeighbors
        .union(viaLabels)
        .union(labels.select(col("x"), col("lbl")))
        .groupBy(col("x")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      val nt = labelSum(next)
      converged = nt == tot
      tot = nt
      // release the previous round's checkpoint blocks — only the
      // newest labels table is ever read again, and CC_MAX_ITERS
      // pinned copies would otherwise sit in executor storage
      labels.unpersist()
      labels = next
      it += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected-components did not converge in $CC_MAX_ITERS rounds")
    labels.select(col("x").as("doc_id"), col("lbl").as("cluster_id"),
      (col("x") === col("lbl")).cast("int").as("is_keeper"))
  }

  val dedupClusterCcSql: String =
    s"""WITH RECURSIVE pairs AS (SELECT a, b FROM ($dedupNgramJaccardSql) p),
       |edges AS (SELECT a AS x, b AS y FROM pairs
       |          UNION SELECT b AS x, a AS y FROM pairs),
       |reach(x, r) AS (
       |  SELECT x, x AS r FROM (SELECT DISTINCT x FROM edges) n
       |  UNION
       |  SELECT e.x, reach.r FROM edges e JOIN reach ON e.y = reach.x)
       |SELECT x AS doc_id, min(r) AS cluster_id,
       |  CAST(x = min(r) AS INT) AS is_keeper
       |FROM reach GROUP BY x""".stripMargin

  /** dedup_keep_best — near-dup cluster resolution by QUALITY: where
    * dedup_cluster_cc keeps the min-id member (cheap, arbitrary),
    * production dedup keeps the BEST member of each duplicate
    * cluster — highest composite quality, doc_id tiebreak. Reports
    * each cluster's keeper, its quality, and the member count.
    *
    * Scale shape: the cluster table is pairs-sized (tiny next to the
    * corpus); quality joins in on doc_id and one window per cluster
    * ranks members — cluster sizes bound the window partitions, and
    * a healthy dedup has small clusters by construction. */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(s, dir)
    val clusters = clustersFrom(
      dedupNgramJaccardFrom(docs).select(col("a"), col("b")))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    // join FIRST, score after: quality costs three token passes per
    // doc, and only cluster members (pairs-sized) need it — scoring
    // the whole corpus before the join would be a wasted full pass
    clusters.join(docs, Seq("doc_id"))
      .withColumn("quality", TextQueries.QualityScore.quality)
      .withColumn("rk", row_number().over(w))
      .groupBy(col("cluster_id"))
      .agg(max(when(col("rk") === 1, col("doc_id"))).as("keeper_id"),
        max(when(col("rk") === 1, col("quality"))).as("best_quality"),
        count(lit(1)).as("n_members"))
  }

  val dedupKeepBestSql: String =
    s"""WITH cc AS (SELECT doc_id, cluster_id
       |  FROM ($dedupClusterCcSql) z),
       |q AS (SELECT doc_id,
       |  ${TextQueries.QualityScore.QUALITY_SQL} AS quality
       |  FROM documents),
       |r AS (
       |  SELECT cluster_id, cc.doc_id, quality, row_number() OVER (
       |    PARTITION BY cluster_id ORDER BY quality DESC, cc.doc_id) AS rk
       |  FROM cc JOIN q ON cc.doc_id = q.doc_id)
       |SELECT cluster_id,
       |  max(CASE WHEN rk = 1 THEN doc_id END) AS keeper_id,
       |  max(CASE WHEN rk = 1 THEN quality END) AS best_quality,
       |  count(*) AS n_members
       |FROM r GROUP BY cluster_id""".stripMargin

  /** Span width (words) for corpus-level span dedup. */
  private val SPAN_W = 10

  /** dedup_common_spans — C4-style repetition removal at corpus
    * level: split every doc into non-overlapping SPAN_W-word spans,
    * drop every span occurring in more than one distinct document,
    * reassemble the survivors in original order (C4 discards any
    * three-sentence span occurring more than once; the unit here is a
    * 10-word span because the synthetic corpus has no sentence
    * boundaries).
    *
    * Scale design: spans ride two shuffles on the same key (hash agg
    * for document frequency, then left-anti join) — no window over
    * unbounded partitions, no collect. The reassembly agg is bounded
    * by original doc length. Docs whose every span is boilerplate
    * drop out of the result on both engines. */
  def dedupCommonSpans(s: SparkSession, dir: String): DataFrame =
    dedupCommonSpansFrom(documents(s, dir))

  private[graft] def dedupCommonSpansFrom(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    val nSpans = ceil(size(ws) / lit(SPAN_W.toDouble)).cast("int")
    val spans = docs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nSpans - 1),
          i => array_join(slice(ws, i * SPAN_W + 1, lit(SPAN_W)), " "))))
      .toDF("doc_id", "pos", "span")
    val common = spans.groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > 1)
      .select(col("span"))
    spans.join(common, Seq("span"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("span")))),
            x => x.getField("span")), " ").as("text_clean"),
        count(lit(1)).as("n_kept"))
  }

  val dedupCommonSpansSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |s AS (SELECT doc_id,
       |  unnest(generate_series(0, CAST(ceil(len(ws)/$SPAN_W.0) AS INT) - 1)) AS pos,
       |  ws FROM w),
       |spans AS (SELECT doc_id, pos,
       |  array_to_string(ws[pos*$SPAN_W+1 : pos*$SPAN_W+$SPAN_W], ' ') AS span
       |  FROM s),
       |common AS (SELECT span FROM spans GROUP BY span
       |           HAVING count(DISTINCT doc_id) > 1),
       |kept AS (SELECT spans.* FROM spans
       |         WHERE span NOT IN (SELECT span FROM common))
       |SELECT doc_id, string_agg(span, ' ' ORDER BY pos) AS text_clean,
       |  count(*) AS n_kept
       |FROM kept GROUP BY doc_id""".stripMargin

  /** Word-n-gram width for benchmark decontamination: 8 words sits in
    * the 8–13-gram window LLM corpus builds use to purge training
    * docs that overlap an evaluation benchmark (test-set leakage). */
  private val DECON_N = 8

  /** Deterministic stand-in benchmark membership over the synthetic
    * corpus: every 19th doc plays the held-out eval set. */
  private val BENCH_MOD = 19

  /** dedup_decontaminate — benchmark decontamination: flag every
    * corpus document sharing at least one word-8-gram with the
    * benchmark (eval) set, with the count of distinct shared grams —
    * the train/test-overlap purge step of an LLM data pipeline.
    *
    * Scale design: the benchmark side of the join is an eval suite —
    * megabytes, not terabytes — so its DISTINCT hashed grams are
    * BROADCAST and the corpus side streams map-side: no shuffle of
    * the corpus gram explosion at all, the whole operator is one
    * scan + broadcast-join + partial agg. Grams travel as xxhash64
    * longs (8 bytes), never as strings; docs shorter than the gram
    * width contribute their whole text (exact-match semantics). */
  def dedupDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    dedupDecontaminateFrom(
      docs.filter(col("doc_id") % BENCH_MOD === 0),
      docs.filter(col("doc_id") % BENCH_MOD =!= 0))
  }

  private[graft] def dedupDecontaminateFrom(
      bench: DataFrame, corpus: DataFrame): DataFrame = {
    // FastSig.hashedShingles: one-pass rolling-hash kernel, already
    // per-doc-distinct — no interpreted higher-order transform, no
    // per-gram string allocation (the first cut did array_join per
    // gram and cost 2× in bench)
    val grams = FastSig.hashedShingles(DECON_N)(col("text"))
    val bg = bench.select(explode(grams).as("gh")).distinct()
    val cg = corpus.select(col("doc_id"), explode(grams).as("gh"))
    cg.join(broadcast(bg), Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  val dedupDecontaminateSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(CASE WHEN len(ws) < $DECON_N THEN [text]
       |    ELSE list_distinct(list_transform(
       |      generate_series(1, len(ws) - ${DECON_N - 1}),
       |      i -> array_to_string(ws[i:i+${DECON_N - 1}], ' '))) END) AS gram
       |  FROM t),
       |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % $BENCH_MOD = 0)
       |SELECT g.doc_id AS doc_id, count(*) AS n_hits
       |FROM g JOIN bg USING (gram)
       |WHERE g.doc_id % $BENCH_MOD <> 0
       |GROUP BY g.doc_id""".stripMargin

  /** dedup_incremental — dedup a NEW batch against the existing
    * corpus without ever comparing corpus×corpus: every fresh doc is
    * flagged exact-dup (content hash exists in the corpus) and
    * near-dup (min corpus doc sharing its prefix block with word-
    * 3-gram Jaccard ≥ 0.8, else null). This is how a 100 TB pipeline
    * actually runs dedup day to day — the full-corpus self-join
    * happens once at bootstrap; afterwards each increment pays
    * |increment| × (bounded candidates), not |corpus|².
    *
    * Scale design: the exact check is a hash semi-join (corpus side
    * reduced to DISTINCT 32-byte hashes); near-dup candidates come
    * from the same prefix-block equi-join as dedup_ngram_jaccard
    * with BOTH sides block-capped, so a boilerplate-heavy increment
    * can't go quadratic. The fresh batch is modeled as every 10th
    * doc (doc_id % 10 == 7). */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    dedupIncrementalFrom(
      docs.filter(col("doc_id") % 10 =!= 7),
      docs.filter(col("doc_id") % 10 === 7))
  }

  /** Shared near-dup stage of BOTH incremental variants: block-capped
    * fresh×old shingle Jaccard → min old partner per fresh doc. Kept
    * in one place so the bloom variant's "result-identical" invariant
    * is structural, not a convention. */
  private def incrementalNearStage(
      old: DataFrame, fresh: DataFrame): DataFrame = {
    def capped(df: DataFrame): DataFrame = capBlocks(df)
    capped(shingledFrom(fresh))
      .select(col("blk"), col("doc_id").as("n"), col("shin").as("sn"))
      .join(capped(shingledFrom(old))
        .select(col("blk"), col("doc_id").as("o"), col("shin").as("so")),
        Seq("blk"))
      .filter(round(FastSig.jaccardSorted(col("sn"), col("so")), 4)
        >= JACCARD_T)
      .groupBy(col("n"))
      .agg(min(col("o")).as("near_dup_of"))
      .withColumnRenamed("n", "doc_id")
  }

  /** Shared final assembly of both incremental variants. */
  private def incrementalResult(
      fresh: DataFrame, exact: DataFrame, near: DataFrame): DataFrame =
    fresh.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("exact_dup"), lit(0)).as("exact_dup"),
        col("near_dup_of"))

  private[graft] def dedupIncrementalFrom(
      old: DataFrame, fresh: DataFrame): DataFrame = {
    val oldHashes = old.select(sha2(col("text"), 256).as("h")).distinct()
    val exact = fresh
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(oldHashes, Seq("h"), "left_semi")
      .select(col("doc_id"), lit(1).as("exact_dup"))
    incrementalResult(fresh, exact,
      incrementalNearStage(old, fresh))
  }

  /** dedup_incremental_bloom — the SAME result as dedup_incremental
    * (byte-identical, shared oracle SQL) with the exact stage
    * restructured around a broadcast Bloom filter, the shape a 100 TB
    * incremental run wants:
    *
    *   plain:  fresh ⋉ DISTINCT(sha256 over corpus)   — the distinct
    *           is a corpus-wide agg shuffle and the semi-join shuffles
    *           both sides on h.
    *   bloom:  (1) one scan-aggregate builds a mergeable Bloom sketch
    *           of corpus hashes (spark.util.sketch, treeAggregate
    *           under the hood — no shuffle, driver gets ~1.2 MB/1M
    *           docs at 1% fpp); (2) fresh hashes are prefiltered by
    *           the broadcast sketch — only true dups + ~1% false
    *           positives survive; (3) the surviving candidate set is
    *           tiny, so CONFIRMATION is a map-side broadcast semi-join
    *           against one more corpus scan. Zero corpus-wide
    *           shuffles; false positives are eliminated exactly.
    *
    * The near-dup stage is shared with dedup_incremental. */
  private[graft] def dedupIncrementalBloomFrom(
      old: DataFrame, fresh: DataFrame,
      expectedOldItems: Long = -1L): DataFrame = {
    val spark = old.sparkSession
    val oldH = old.select(sha2(col("text"), 256).as("h"))
    // bloom sizing: a production run passes the known corpus row
    // stat via expectedOldItems; the default falls back to one
    // count() pass (a real scan when `old` carries filters — avoid
    // it at scale by passing the stat)
    val expected = if (expectedOldItems > 0) expectedOldItems
      else math.max(old.count(), 1L)
    val bloom = oldH.stat.bloomFilter("h", expected, 0.01)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    // null-safe: sha2 of a null text is null; the plain variant's
    // semi-join ignores null h, so the prefilter must too (a bare
    // mightContainString(null) would NPE the whole job)
    val mightContain = udf((h: String) =>
      h != null && bloomBc.value.mightContainString(h))
    val freshH = fresh.select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val candH = freshH.filter(mightContain(col("h")))
      .select(col("h")).distinct()
    val confirmed = oldH
      .join(broadcast(candH), Seq("h"), "left_semi")
      .distinct()
    val exact = freshH
      .join(broadcast(confirmed), Seq("h"), "left_semi")
      .select(col("doc_id"), lit(1).as("exact_dup"))
    incrementalResult(fresh, exact,
      incrementalNearStage(old, fresh))
  }

  def dedupIncrementalBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    dedupIncrementalBloomFrom(
      docs.filter(col("doc_id") % 10 =!= 7),
      docs.filter(col("doc_id") % 10 === 7))
  }

  val dedupIncrementalSql: String =
    s"""WITH d0 AS (
       |  SELECT doc_id, text, substr(text, 1, 32) AS blk,
       |    list_distinct(CASE WHEN len(string_split(text,' ')) < 3
       |      THEN [text]
       |      ELSE list_transform(
       |        generate_series(1, len(string_split(text,' ')) - 2),
       |        i -> string_split(text,' ')[i] || ' ' ||
       |             string_split(text,' ')[i+1] || ' ' ||
       |             string_split(text,' ')[i+2]) END) AS shin
       |  FROM documents),
       |old AS (SELECT doc_id, text, blk, shin FROM (
       |    SELECT d0.*, row_number() OVER
       |      (PARTITION BY blk ORDER BY doc_id) AS rn
       |    FROM d0 WHERE doc_id % 10 <> 7) WHERE rn <= $BLOCK_CAP),
       |freshc AS (SELECT doc_id, blk, shin FROM (
       |    SELECT d0.*, row_number() OVER
       |      (PARTITION BY blk ORDER BY doc_id) AS rn
       |    FROM d0 WHERE doc_id % 10 = 7) WHERE rn <= $BLOCK_CAP),
       |oldh AS (SELECT DISTINCT sha256(text) AS h
       |         FROM documents WHERE doc_id % 10 <> 7),
       |near AS (SELECT f.doc_id, min(o.doc_id) AS near_dup_of
       |  FROM freshc f JOIN old o ON f.blk = o.blk
       |  WHERE round(CAST(len(list_intersect(f.shin, o.shin)) AS DOUBLE) /
       |        len(list_distinct(list_concat(f.shin, o.shin))), 4) >= 0.8
       |  GROUP BY f.doc_id)
       |SELECT f.doc_id AS doc_id,
       |  CAST(CASE WHEN oh.h IS NOT NULL THEN 1 ELSE 0 END AS INT)
       |    AS exact_dup,
       |  near.near_dup_of AS near_dup_of
       |FROM (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7) f
       |LEFT JOIN oldh oh ON sha256(f.text) = oh.h
       |LEFT JOIN near ON near.doc_id = f.doc_id""".stripMargin

  // ---- DuckDB recompute oracles for the signature-LSH ops ----
  //
  // The same full-recompute pattern text_fingerprint proved out
  // (TextQueries.winnowFpCte): the signatures are plain Java integer
  // folds, so DuckDB re-derives them in HUGEINT modular arithmetic —
  // signatures, band keys, candidate join, verify, star edges — and
  // the pair sets hash-compare exactly. One honest boundary: the
  // engine caps band buckets at 512 with overflow chaining
  // (SkewUtils.capPerKeyWithOverflow); the oracle recomputes the
  // UNCAPPED join, which is identical while no bucket of distinct
  // representatives exceeds the cap — true by construction at oracle
  // scale (the fixture holds fewer distinct texts than the cap), and
  // the flood/no-loss behavior past the cap stays property-tested.

  /** splitmix64 finalizer over the UNSIGNED [0, 2^64) domain carried
    * in HUGEINT. 64×64-bit products would overflow the signed 128-bit
    * HUGEINT, so each multiply is split at 2^32:
    * z*C mod 2^64 = (z*C_lo + (z*C_hi mod 2^32)*2^32) mod 2^64. */
  private[operators] def mix64Sql(x: String): String = {
    val M = "18446744073709551616::HUGEINT"
    def mulmod(y: String, hi: Long, lo: Long): String =
      s"((($y * $lo::HUGEINT) + ((($y * $hi::HUGEINT) % 4294967296::HUGEINT)" +
        s" * 4294967296::HUGEINT)) % $M)"
    val z1 = s"((($x) + 11400714819323198485::HUGEINT) % $M)"
    val y1 = s"(xor($z1, $z1 >> 30))"
    val z2 = mulmod(y1, 3210233709L, 484763065L)  // 0xbf58476d1ce4e5b9
    val y2 = s"(xor($z2, $z2 >> 27))"
    val z3 = mulmod(y2, 2496678331L, 321982955L)  // 0x94d049bb133111eb
    s"(xor($z3, $z3 >> 31))"
  }

  /** One murmur3-32 block mix (the Scala MurmurHash3 kernel
    * simhash64 tokenizes with), as a list_reduce lambda body over
    * accumulator `h` and char-pair word `k` — all values held in
    * [0, 2^32), where 32×32-bit products fit HUGEINT natively. */
  private def mix32Sql: String = {
    val M = "4294967296::HUGEINT"
    val k1 = s"((k * 3432918353::HUGEINT) % $M)"          // * 0xcc9e2d51
    val k2 = s"(((($k1 * 32768::HUGEINT) % $M)) | ($k1 >> 17))" // rotl 15
    val k3 = s"(($k2 * 461845907::HUGEINT) % $M)"          // * 0x1b873593
    val h1 = s"(xor(h, $k3))"
    val h2 = s"(((($h1 * 8192::HUGEINT) % $M)) | ($h1 >> 19))"  // rotl 13
    s"((($h2 * 5::HUGEINT) + 3864292196::HUGEINT) % $M)"   // *5 + 0xe6546b64
  }

  /** dedup_simhash oracle: per-token murmur3 over code points
    * (TextFunctions.murmur3TokenHash — pair mix, odd-tail mixLast,
    * length finalize; code-point addressing matches DuckDB's
    * unicode()/substr for ALL of Unicode) spread to 64
    * bits by the xorshift the engine uses, per-bit majority vote into
    * the 64-bit signature, 4×16-bit band join, Hamming ≤ 6 verify,
    * plus the copy-class star edges. */
  private[graft] val dedupSimhashSql: String = {
    val pairs = "list_transform(range(1, length(t), 2), i -> " +
      "((unicode(substr(t, CAST(i AS INT), 1))::HUGEINT * 65536::HUGEINT) + " +
      "unicode(substr(t, CAST(i AS INT) + 1, 1))::HUGEINT))"
    // seed = MurmurHash3.stringSeed = 0xf7ca7fd2
    val red = s"list_reduce(list_prepend(4157243346::HUGEINT, $pairs), " +
      s"(h, k) -> $mix32Sql)"
    // mixLast of the unpaired trailing char (odd-length tokens)
    val m32 = "4294967296::HUGEINT"
    val lc = "unicode(substr(t, length(t), 1))::HUGEINT"
    val lk1 = s"(($lc * 3432918353::HUGEINT) % $m32)"
    val lk2 = s"(((($lk1 * 32768::HUGEINT) % $m32)) | ($lk1 >> 17))"
    val lk3 = s"(($lk2 * 461845907::HUGEINT) % $m32)"
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
       |reps AS (SELECT min(doc_id) AS doc_id, text FROM base GROUP BY text),
       |t0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM reps),
       |m AS (SELECT doc_id, t,
       |  (CASE WHEN length(t) % 2 = 1 THEN xor($red, $lk3)
       |   ELSE $red END) AS h FROM t0),
       |f1 AS (SELECT doc_id, xor(h, length(t)::HUGEINT) AS h FROM m),
       |f2 AS (SELECT doc_id, xor(h, h >> 16) AS h FROM f1),
       |g1 AS (SELECT doc_id,
       |  (h * 2246822507::HUGEINT) % $m32 AS h FROM f2),
       |g2 AS (SELECT doc_id, xor(h, h >> 13) AS h FROM g1),
       |g3 AS (SELECT doc_id,
       |  (h * 3266489909::HUGEINT) % $m32 AS h FROM g2),
       |g4 AS (SELECT doc_id, xor(h, h >> 16) AS h FROM g3),
       |s1 AS (SELECT doc_id, xor(h,
       |  (h * 2097152::HUGEINT) % 18446744073709551616::HUGEINT) AS h
       |  FROM g4),
       |s2 AS (SELECT doc_id, xor(h, h >> 35) AS h FROM s1),
       |s3 AS (SELECT doc_id, xor(h,
       |  (h * 16::HUGEINT) % 18446744073709551616::HUGEINT)
       |  % 18446744073709551616::HUGEINT AS h FROM s2),
       |hl AS (SELECT doc_id, list(h) AS hs FROM s3 GROUP BY doc_id),
       |sg AS (SELECT doc_id, list_sum(list_transform(range(0, 64), b ->
       |    CASE WHEN list_sum(list_transform(hs, hh ->
       |        CASE WHEN (hh >> CAST(b AS INT)) & 1::HUGEINT = 1::HUGEINT
       |        THEN 1 ELSE -1 END)) > 0
       |    THEN (1::HUGEINT << CAST(b AS INT)) ELSE 0::HUGEINT END)) AS sig
       |  FROM hl),
       |bands AS (
       |  SELECT sg.doc_id, bx.band,
       |    (sg.sig >> CAST(bx.band * 16 AS INT)) & 65535::HUGEINT AS bh
       |  FROM sg CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bx),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |    AND x.doc_id < y.doc_id),
       |ver AS (
       |  SELECT c.a, c.b,
       |    CAST(bit_count(CAST(xor(sa.sig, sb.sig) AS BIGINT)) AS INT)
       |      AS hamming
       |  FROM cand c
       |  JOIN sg sa ON sa.doc_id = c.a
       |  JOIN sg sb ON sb.doc_id = c.b)
       |SELECT a, b, hamming FROM ver WHERE hamming <= 6
       |UNION ALL
       |SELECT r.doc_id AS a, mm.doc_id AS b, 0 AS hamming
       |FROM base mm JOIN reps r
       |  ON mm.text = r.text AND mm.doc_id <> r.doc_id""".stripMargin
  }

  /** dedup_near_minhash oracle: the splitmix char fold over 3-word
    * shingles (word boundaries as the engine's 0x1f marker mixed in
    * through the SAME reduce lambda), 16 signed-min permutations,
    * 4-row band folds, band join, exact-Jaccard ≥ 0.8 verify over the
    * recomputed shingle sets, plus the copy-class star edges. */
  private[graft] val dedupNearMinhashSql: String = {
    val M = "18446744073709551616::HUGEINT"
    // p * 0xc2b2ae3d27d4eb4f under Java's wrapping long multiply
    val permMasks = (0 until NUM_PERM).map { p =>
      (BigInt(p) * BigInt("c2b2ae3d27d4eb4f", 16)).mod(BigInt(2).pow(64))
    }
    val perms = permMasks.map(m => s"$m::HUGEINT").mkString("[", ", ", "]")
    val lam = s"(a, c) -> ${mix64Sql("xor(a, c)")}"
    // flat per-shingle value stream: chars of the 3 words with the
    // 0x1f boundary marker appended after each — byte-identical to
    // hashString(w, h) chained with mix(h ^ 0x1f)
    val flat = "flatten(list_transform([ws[CAST(i AS INT)], " +
      "ws[CAST(i AS INT)+1], ws[CAST(i AS INT)+2]], w -> " +
      "list_append(list_transform(range(1, length(w)+1), c -> " +
      "unicode(substr(w, CAST(c AS INT), 1))::HUGEINT), 31::HUGEINT)))"
    val codesText = "list_transform(range(1, length(text)+1), c -> " +
      "unicode(substr(text, CAST(c AS INT), 1))::HUGEINT)"
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
       |reps AS (SELECT min(doc_id) AS doc_id, text FROM base GROUP BY text),
       |rw AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM reps),
       |shin AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) < 3 THEN
       |      [list_reduce(list_prepend(7::HUGEINT, $codesText), $lam)]
       |    ELSE list_distinct(list_transform(range(1, len(ws) - 1), i ->
       |      list_reduce(list_prepend(7::HUGEINT, $flat), $lam)))
       |    END AS sh FROM rw),
       |sh1 AS (SELECT doc_id, unnest(sh) AS h FROM shin),
       |pv AS (
       |  SELECT doc_id, p, v - (CASE WHEN v >= 9223372036854775808::HUGEINT
       |      THEN $M ELSE 0::HUGEINT END) AS sv
       |  FROM (
       |    SELECT s.doc_id, pm.p, ${mix64Sql("xor(s.h, pm.m)")} AS v
       |    FROM sh1 s CROSS JOIN
       |      (SELECT unnest(range(0, $NUM_PERM)) AS p,
       |              unnest($perms) AS m) pm)),
       |sig AS (SELECT doc_id, p, min(sv) AS sv FROM pv GROUP BY doc_id, p),
       |usig AS (
       |  SELECT doc_id, list(((sv::HUGEINT % $M) + $M) % $M ORDER BY p)
       |    AS us
       |  FROM sig GROUP BY doc_id),
       |bands AS (
       |  SELECT u.doc_id, b.band,
       |    list_reduce(list_prepend(b.band::HUGEINT,
       |      u.us[(b.band*4+1):(b.band*4+4)]), $lam) AS bh
       |  FROM usig u CROSS JOIN (SELECT unnest(range(0, $N_BANDS)) AS band) b),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.bh = y.bh
       |    AND x.doc_id < y.doc_id),
       |ver AS (
       |  SELECT c.a, c.b,
       |    round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |          len(list_distinct(list_concat(sa.sh, sb.sh))), 4) AS jac
       |  FROM cand c
       |  JOIN shin sa ON sa.doc_id = c.a
       |  JOIN shin sb ON sb.doc_id = c.b)
       |SELECT a, b, jac FROM ver WHERE jac >= $JACCARD_T
       |UNION ALL
       |SELECT r.doc_id AS a, mm.doc_id AS b, 1.0 AS jac
       |FROM base mm JOIN reps r
       |  ON mm.text = r.text AND mm.doc_id <> r.doc_id""".stripMargin
  }

  /** Sliding token-window width for cross-document exact-substring
    * dedup. Published pipelines (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better") excise repeated
    * ≥50-token substrings; 10 matches this corpus' passage scale (and
    * dedup_common_spans' unit) so the fixtures actually exercise the
    * excision path. Width is the only tuning knob. */
  private[graft] val SUBSTR_K = 10

  /** text_substring_dedup_global — cross-document exact-substring
    * dedup, the Lee-et-al. pass: any SUBSTR_K-token window occurring
    * in ≥2 distinct documents is excised from every position except
    * the globally first (min (doc_id, pos)); overlapping/adjacent
    * excisions coalesce into maximal runs and each doc's survivors
    * reassemble in order. Closes the granularity gap between
    * text_line_dedup_global (whole lines), dedup_common_spans
    * (aligned non-overlapping spans), and the doc-level dedups:
    * a repeated passage is caught at ANY token offset.
    *
    * Scale design: grams travel as xxhash64 longs (8 bytes — the
    * dedup_decontaminate discipline; a 64-bit collision over 10¹²
    * grams is a ~3% once-per-corpus event whose worst case is one
    * spurious excision, the approximation Lee et al. themselves
    * accept), and ride the dedup_common_spans shape: one map-side
    * gram explode, a hash agg for (df, global-min winner) — groupBy,
    * NEVER a window on the hot gram key — then one hash join back.
    * Everything after is per-doc bounded: removal starts collect per
    * doc (≤ token count, the reassembly bound common_spans already
    * carries), runs coalesce in one codegen'd fold, and the excision
    * is a pure per-row expression. Oracle: full recompute on the
    * LITERAL gram strings (no hash trusted), gaps-and-islands
    * coalescing, identical reassembly. */
  def textSubstringDedupGlobal(s: SparkSession, dir: String): DataFrame =
    textSubstringDedupGlobalFrom(documents(s, dir))

  private[graft] def textSubstringDedupGlobalFrom(
      docs: DataFrame): DataFrame = {
    val k = SUBSTR_K
    val ws = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val g = ws
      .filter(size(col("ws")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(ws) - $k),
           |  p -> xxhash64(array_join(slice(ws, p + 1, $k), ' ')))"""
          .stripMargin)))
      .toDF("doc_id", "pos", "h")
    // ONE aggregate gives both the cross-doc test and the keeper:
    // min(struct(doc_id, pos)) IS the global (doc_id, pos) argmin
    val dup = g.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"),
        min(struct(col("doc_id"), col("pos"))).as("w"))
      .filter(col("df") >= 2)
      .select(col("h"), col("w.doc_id").as("wd"), col("w.pos").as("wp"))
    val runs = g.join(dup, Seq("h"))
      .filter(!(col("doc_id") === col("wd") && col("pos") === col("wp")))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
      .select(col("doc_id"), expr(
        s"""aggregate(starts,
           |  cast(array() as array<struct<rs: int, re: int>>),
           |  (acc, p) -> IF(
           |    size(acc) > 0 AND p <= element_at(acc, -1).re + 1,
           |    concat(slice(acc, 1, size(acc) - 1),
           |      array(named_struct('rs', element_at(acc, -1).rs,
           |                         're', p + $k - 1))),
           |    concat(acc,
           |      array(named_struct('rs', p, 're', p + $k - 1)))))"""
          .stripMargin).as("runs"))
    ws.join(runs, Seq("doc_id"), "left")
      .withColumn("runs", coalesce(col("runs"),
        expr("cast(array() as array<struct<rs: int, re: int>>)")))
      // always-true, but it REFERENCES the joined side: without it,
      // a bare count() over this frame lets Catalyst eliminate the
      // whole left join (the runs side is key-unique and otherwise
      // unprojected) and the benchmark would measure a documents
      // scan instead of the operator (observed: 0.3 s vs ~60 s of
      // real work at sf10). Every real consumer reads the stats or
      // the cleaned text, so this costs them nothing.
      .filter(size(col("runs")) >= 0)
      .select(col("doc_id"),
        expr("""array_join(transform(
          |  filter(sequence(0, size(ws) - 1),
          |    i -> NOT exists(runs, r -> i >= r.rs AND i <= r.re)),
          |  i -> element_at(ws, i + 1)), ' ')""".stripMargin)
          .as("text_deduped"),
        (size(col("ws")) -
          expr("aggregate(runs, 0, (a, r) -> a + r.re - r.rs + 1)"))
          .cast("long").as("n_kept"),
        expr("aggregate(runs, 0, (a, r) -> a + r.re - r.rs + 1)")
          .cast("long").as("n_removed"),
        size(col("runs")).cast("long").as("n_runs"))
  }

  /** text_substring_dedup_global oracle — the identical pass on the
    * LITERAL gram strings: sliding K-windows, cross-doc test, global
    * (doc_id, pos) keeper via row_number, gaps-and-islands run
    * coalescing, covered-index excision, in-order reassembly. */
  val textSubstringDedupGlobalSql: String = {
    val k = SUBSTR_K
    s"""WITH ws AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |g AS (
       |  SELECT doc_id, i AS pos,
       |    array_to_string(w[i + 1 : i + $k], ' ') AS gram
       |  FROM ws, unnest(generate_series(0, len(w) - $k)) AS t(i)
       |  WHERE len(w) >= $k),
       |dup AS (SELECT gram FROM g GROUP BY gram
       |        HAVING count(DISTINCT doc_id) >= 2),
       |r0 AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY gram
       |      ORDER BY doc_id, pos) AS rk
       |  FROM g WHERE gram IN (SELECT gram FROM dup)),
       |rm AS (SELECT doc_id, pos FROM r0 WHERE rk > 1),
       |r1 AS (
       |  SELECT doc_id, pos AS rs, pos + $k - 1 AS re,
       |    max(pos + $k - 1) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |  FROM rm),
       |r2 AS (
       |  SELECT doc_id, rs, re,
       |    sum(CASE WHEN pmax IS NULL OR rs > pmax + 1
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY rs) AS grp
       |  FROM r1),
       |runs AS (SELECT doc_id, grp, min(rs) AS rs, max(re) AS re
       |         FROM r2 GROUP BY 1, 2),
       |rl AS (
       |  SELECT doc_id,
       |    flatten(list(generate_series(rs, re))) AS cov,
       |    sum(re - rs + 1) AS n_rm, count(*) AS nr
       |  FROM runs GROUP BY doc_id)
       |SELECT ws.doc_id,
       |  coalesce(array_to_string(list_transform(
       |    list_filter(range(len(w)),
       |      i -> cov IS NULL OR NOT list_contains(cov, i)),
       |    i -> w[i + 1]), ' '), '') AS text_deduped,
       |  CAST(len(w) - coalesce(n_rm, 0) AS BIGINT) AS n_kept,
       |  CAST(coalesce(n_rm, 0) AS BIGINT) AS n_removed,
       |  CAST(coalesce(nr, 0) AS BIGINT) AS n_runs
       |FROM ws LEFT JOIN rl USING (doc_id)""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "text_substring_dedup_global" -> (textSubstringDedupGlobal _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_near_minhash" -> (dedupNearMinhash _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_cluster_cc" -> (dedupClusterCc _),
    "dedup_keep_best" -> (dedupKeepBest _),
    "dedup_common_spans" -> (dedupCommonSpans _),
    "dedup_decontaminate" -> (dedupDecontaminate _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_incremental_bloom" -> (dedupIncrementalBloom _)
  )

  def oracle: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "text_substring_dedup_global" -> textSubstringDedupGlobalSql,
    "dedup_keep_best" -> dedupKeepBestSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_cluster_cc" -> dedupClusterCcSql,
    "dedup_common_spans" -> dedupCommonSpansSql,
    "dedup_decontaminate" -> dedupDecontaminateSql,
    "dedup_incremental" -> dedupIncrementalSql,
    // the bloom variant is result-identical by construction (no false
    // negatives; false positives exactly confirmed) — same oracle
    "dedup_incremental_bloom" -> dedupIncrementalSql,
    // full HUGEINT recomputes (signatures + bands + verify + stars);
    // recall/flood behavior past the band cap stays property-tested
    "dedup_near_minhash" -> dedupNearMinhashSql,
    "dedup_simhash" -> dedupSimhashSql
  )
}
