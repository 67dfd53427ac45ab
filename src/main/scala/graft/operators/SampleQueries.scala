package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Deterministic corpus sampling (SURVEY §2.11 extension family) —
  * the subsampling a training-data pipeline actually ships:
  * content-hash sampling, not rand(). rand()-based sampling is
  * neither reproducible across runs nor stable under
  * repartition/retry; hashing a key is both, and it composes — the
  * same document lands in the same split on every engine and every
  * rerun, which is what dataset versioning needs at 100 TB. All pure
  * narrow transforms (no shuffle for the fraction sample; one
  * bounded window shuffle for the stratified quota).
  */
object SampleQueries {

  /** Modulus of [[hashBucket]] — the bucket domain [0, 1000). */
  private[graft] val HASH_BUCKETS = 1000

  /** Stable cross-engine sample bucket in [0, 1000): the first 6 hex
    * chars of sha256(key) as an int. sha256 hex is identical
    * everywhere, so the oracle reproduces the exact row set. */
  private[graft] def hashBucket(key: org.apache.spark.sql.Column) =
    conv(substring(sha2(key.cast("string"), 256), 1, 6), 16, 10)
      .cast("bigint") % HASH_BUCKETS

  /** sample_hash_fraction — reproducible 10% document sample by
    * content-hash bucket. Narrow (scan + filter): at 100 TB this is
    * a pushdown-friendly predicate, no shuffle, and the SAME rows
    * come back on every engine, run, and partitioning. */
  def sampleHashFraction(s: SparkSession, dir: String): DataFrame =
    sampleHashFractionFrom(documents(s, dir))

  /** Stateless core of sample_hash_fraction — a pure narrow
    * predicate, so it runs unchanged on a STREAMING DataFrame (no
    * state, no watermark) and the sampled stream is row-identical to
    * the batch sample of the same data (StreamingSpec asserts it).
    * Deterministic sampling composing across batch and streaming is
    * exactly why hash buckets beat rand() for dataset versioning. */
  private[graft] def sampleHashFractionFrom(docs: DataFrame): DataFrame =
    docs
      .withColumn("bucket", hashBucket(col("doc_id")))
      .filter(col("bucket") < 100)
      .select(col("doc_id"), col("lang"), col("bucket"))

  val sampleHashFractionSql: String =
    """SELECT doc_id, lang,
      |  CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 6)
      |    AS BIGINT) % 1000 AS bucket
      |FROM documents
      |WHERE CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 6)
      |    AS BIGINT) % 1000 < 100""".stripMargin

  /** sample_weighted — weighted sampling WITHOUT replacement by the
    * Efraimidis–Spirakis A-ES construction (exponential-jump form):
    * each doc draws key = -ln(u)/w with u a DETERMINISTIC uniform
    * from its content hash and w = n_chars; the k smallest keys are
    * a weighted sample without replacement. The training-data use:
    * quality- or length-weighted corpus draws that are reproducible
    * across engines, runs, and partitionings — rand() would version
    * nothing. Scale shape: pure narrow arithmetic (sha2 + ln per
    * row, no shuffle) into a TakeOrderedAndProject top-k; the key is
    * rounded (8 dp, +1e-9 both engines) before ordering so the
    * selected set is engine-stable, doc_id tiebreak. */
  /** ONE definition of the A-ES key (Spark SQL form): uniform u in
    * (0,1) from the first 8 sha256 hex digits of doc_id, key =
    * -ln(u)/n_chars, rounded (+1e-9, 8 dp). The batch query, the
    * streaming reservoir (StreamingOps.weightedReservoirStream), and
    * the parity test all use THIS string so the three cannot drift. */
  private[graft] val AES_KEY_SQL: String =
    """round(-ln((conv(substring(sha2(cast(doc_id AS string), 256),
      |  1, 8), 16, 10) + 0.5d) / 4294967296d)
      |  / cast(n_chars AS double) + 1e-9, 8)""".stripMargin

  def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      // a NULL or non-positive weight has no defined draw — and a
      // NULL key would sort NULLS FIRST on Spark but NULLS LAST in
      // DuckDB, splitting the top-k cutoff across engines
      .filter(col("n_chars").isNotNull && col("n_chars") > 0)
      .selectExpr("doc_id", "cast(n_chars AS bigint) AS w",
        s"$AES_KEY_SQL AS key")
      .orderBy(col("key"), col("doc_id"))
      .limit(20)

  val sampleWeightedSql: String =
    """SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
      |  round(-ln((CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)),
      |      1, 8) AS BIGINT) + 0.5) / 4294967296.0)
      |    / CAST(n_chars AS DOUBLE) + 1e-9, 8) AS key
      |FROM documents
      |WHERE n_chars IS NOT NULL AND n_chars > 0
      |ORDER BY key, doc_id
      |LIMIT 20""".stripMargin

  /** sample_stratified — exact per-language quota (12 docs/lang),
    * hash-ordered so the quota is reproducible, not first-seen. One
    * window shuffle on the stratum key; the per-group state is the
    * rank counter, so skewed strata cost nothing beyond their row
    * count. The training-data use: balance languages/sources in a
    * mixture without a nondeterministic sampleBy. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("bucket"), col("doc_id"))
    documents(s, dir)
      .withColumn("bucket", hashBucket(col("doc_id")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 12)
      .select(col("lang"), col("doc_id"), col("bucket"), col("rk"))
  }

  val sampleStratifiedSql: String =
    """WITH b AS (
      |  SELECT lang, doc_id,
      |    CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 6)
      |      AS BIGINT) % 1000 AS bucket
      |  FROM documents),
      |r AS (
      |  SELECT lang, doc_id, bucket, row_number() OVER
      |    (PARTITION BY lang ORDER BY bucket, doc_id) AS rk FROM b)
      |SELECT lang, doc_id, bucket, rk FROM r WHERE rk <= 12""".stripMargin

  /** sample_split — deterministic train/val/test assignment from the
    * same bucket (98/1/1): every row tagged, no row dropped, stable
    * under reruns. The split column is what a 100 TB pipeline writes
    * as a partition key so downstream readers prune to their split. */
  def sampleSplit(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("bucket", hashBucket(col("doc_id")))
      .withColumn("split",
        when(col("bucket") < 980, "train")
          .when(col("bucket") < 990, "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("bucket")).as("min_bucket"),
        max(col("bucket")).as("max_bucket"))

  val sampleSplitSql: String =
    """WITH b AS (
      |  SELECT CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 6)
      |      AS BIGINT) % 1000 AS bucket
      |  FROM documents)
      |SELECT CASE WHEN bucket < 980 THEN 'train'
      |            WHEN bucket < 990 THEN 'val'
      |            ELSE 'test' END AS split,
      |  count(*) AS n_docs, min(bucket) AS min_bucket,
      |  max(bucket) AS max_bucket
      |FROM b GROUP BY 1""".stripMargin

  /** Temperature exponent for mixture re-weighting — the α of
    * p_i^α multilingual-sampling (α<1 upweights low-resource
    * languages; α=0.3 is the published CC100/XLM-R setting). */
  private[graft] val ALPHA = 0.3

  /** sample_temperature — temperature-scaled language-mixture weights:
    * per-language token counts → natural share p = n/Σn and the
    * α-tempered sampling weight q = n^α/Σn^α (total^α cancels, so q
    * is computed from raw counts — no intermediate normalization).
    * This is the table a mixture builder multiplies against its token
    * budget to decide how much of each language to draw.
    *
    * Scale shape: ONE map-side-combined hash agg collapses the corpus
    * to |langs| rows; the Σ join is a broadcast of a 1-row aggregate.
    * Nothing downstream of the first agg scales with corpus size. */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame =
    temperatureWeightsFrom(
      documents(s, dir)
        .select(col("lang"), size(split(col("text"), " ")).as("n_tok"))
        .groupBy(col("lang"))
        .agg(sum(col("n_tok")).as("n_tokens")))

  /** The weight formula on an already-aggregated (lang, n_tokens)
    * frame — the ONE definition of p and q; pipeline_build_mixture
    * reuses it over its survivor counts so the tempering rule cannot
    * drift between the standalone and composed operators. */
  private[graft] def temperatureWeightsFrom(perLang: DataFrame): DataFrame = {
    val tot = perLang.agg(
      sum(col("n_tokens")).as("n_total"),
      sum(pow(col("n_tokens"), lit(ALPHA))).as("z"))
    perLang.join(broadcast(tot))
      .select(col("lang"), col("n_tokens"),
        round(col("n_tokens") / col("n_total") + lit(1e-9), 4).as("p"),
        round(pow(col("n_tokens"), lit(ALPHA)) / col("z") + lit(1e-9), 4)
          .as("q"))
  }

  val sampleTemperatureSql: String =
    // CAST(sum(..) AS BIGINT): DuckDB's sum(BIGINT) returns HUGEINT,
    // which the driver's hasher renders differently from Spark's int64.
    s"""WITH pl AS (
       |  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT)
       |    AS n_tokens
       |  FROM documents GROUP BY lang),
       |tot AS (SELECT sum(n_tokens) AS n_total,
       |  sum(power(CAST(n_tokens AS DOUBLE), $ALPHA)) AS z FROM pl)
       |SELECT lang, n_tokens,
       |  round(CAST(n_tokens AS DOUBLE) / n_total + 1e-9, 4) AS p,
       |  round(power(CAST(n_tokens AS DOUBLE), $ALPHA) / z + 1e-9, 4) AS q
       |FROM pl CROSS JOIN tot""".stripMargin

  /** Per-language token budget for sample_token_budget. A FIXED
    * integer budget (not weights × budget): the cutoff must be
    * bit-reproducible across engines, and an integer threshold over
    * an integer running sum is — whereas a pow()-derived budget can
    * straddle a floor() boundary between libm implementations. A
    * production mixture run feeds the (rounded) sample_temperature
    * weights in as per-language constants the same way. */
  private[graft] val LANG_BUDGET = 2500L

  /** sample_token_budget — budget-bounded mixture draw: per language,
    * take documents in deterministic hash order until the token
    * budget is spent (a doc is kept iff it STARTS under budget, so
    * the draw overshoots by at most one document — the standard
    * packing rule). Reports per-language kept docs/tokens against
    * budget; the same plan minus the final agg yields the kept rows.
    *
    * Scale shape: one window shuffle on the language key with O(1)
    * running-sum state; skewed languages cost their row count, no
    * more. The hash order makes the draw a versioned dataset: same
    * rows on every engine, run, and partitioning. */
  def sampleTokenBudget(s: SparkSession, dir: String): DataFrame =
    tokenBudgetKeptFrom(documents(s, dir))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_tok")).as("n_tokens_kept"))
      .withColumn("budget", lit(LANG_BUDGET))

  /** The kept ROWS of the budget draw (lang, doc_id, n_tok, bucket)
    * from any (doc_id, lang, text) frame — the ONE packing rule,
    * reproduced by the streaming admission operator (StreamingSpec
    * asserts stream==batch parity) and reused over the survivor set
    * by pipeline_build_mixture. Runs as the two-pass distributed
    * prefix-sum draw ([[BudgetDraw.keptByBudget]]): ranges over the
    * hash-bucket order, per-range local cumsums + a broadcast
    * per-range offset — bit-identical rows to the per-lang window
    * form (BudgetDrawSpec) with no single-partition window and only
    * the budget-reachable ranges shuffled. */
  private[graft] def tokenBudgetKeptFrom(docs: DataFrame): DataFrame =
    BudgetDraw.keptByBudget(
      docs.select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        hashBucket(col("doc_id")).as("bucket")),
      groupCols = Seq("lang"),
      rangeId = BudgetDraw.bucketRange(col("bucket"), HASH_BUCKETS),
      orderCols = Seq(col("bucket"), col("doc_id")),
      tokCol = "n_tok", budget = LANG_BUDGET)

  val sampleTokenBudgetSql: String =
    s"""WITH b AS (
       |  SELECT lang, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 6)
       |      AS BIGINT) % 1000 AS bucket
       |  FROM documents),
       |c AS (
       |  SELECT lang, n_tok, sum(n_tok) OVER (PARTITION BY lang
       |    ORDER BY bucket, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM b)
       |SELECT lang, count(*) AS n_docs_kept,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens_kept,
       |  $LANG_BUDGET AS budget
       |FROM c WHERE cum - n_tok < $LANG_BUDGET GROUP BY lang""".stripMargin

  /** Explicit checksum modulus: the content sum is defined as
    * Σ h_i mod 2^62, NOT a raw LONG sum. At 100 TB (trillions of rows
    * × 48-bit values) a raw int64 sum overflows and Spark wraps while
    * DuckDB's HUGEINT doesn't — the "engine-independent fingerprint"
    * would diverge exactly when it matters. Summing in DECIMAL(38,0)
    * (Spark) / HUGEINT (DuckDB) and taking an explicit modulus makes
    * the value well-defined at ANY row count: 2^88 worst-case sum is
    * far inside both 38-digit decimal and int128. */
  private[graft] val CHECKSUM_MOD = 4611686018427387904L // 2^62

  /** agg_dataset_checksum — order-independent dataset fingerprint:
    * per language, the row count, token total, and a content checksum
    * (SUM of per-row sha256-derived longs mod 2^62 — commutative, so
    * the value is independent of partitioning, task order, and row
    * order). The dataset-versioning primitive: two pipelines (or two
    * engines, or two runs) producing the same checksum row agree on
    * the full content without moving or sorting a byte of it.
    *
    * Scale shape: one map-side-combined hash agg to |langs| rows —
    * checksum cost is the scan itself. */
  def aggDatasetChecksum(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        // first 12 hex chars = 48 bits per row; overflow-safety comes
        // from the DECIMAL(38,0) accumulator + explicit modulus below,
        // not from assuming a bounded row count
        conv(substring(sha2(col("text"), 256), 1, 12), 16, 10)
          .cast("decimal(38,0)").as("h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        (sum(col("h")) % lit(CHECKSUM_MOD)).cast("long").as("content_sum"))

  val aggDatasetChecksumSql: String =
    // CAST(sum AS BIGINT): DuckDB sums BIGINT into HUGEINT, which the
    // driver's hasher renders differently from Spark's int64; the
    // content sum additionally takes the explicit 2^62 modulus so the
    // fingerprint is engine-independent at any scale.
    s"""SELECT lang, count(*) AS n_docs,
       |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |  CAST(sum(CAST('0x' || substr(sha256(text), 1, 12) AS BIGINT))
       |    % $CHECKSUM_MOD AS BIGINT) AS content_sum
       |FROM documents GROUP BY lang""".stripMargin

  /** Shard count for a full per-epoch schedule: one shard per
    * ~`targetDocsPerShard` docs, so each (epoch, shard) window sorts a
    * bounded row count REGARDLESS of corpus size — window parallelism
    * scales with the data instead of a fixed divisor funneling
    * corpus/8 rows through one reducer at 100 TB. */
  def epochShuffleShards(corpusDocs: Long,
      targetDocsPerShard: Long = 1L << 20): Int = {
    require(targetDocsPerShard > 0)
    // overflow-safe ceiling division (corpusDocs may be Long.MaxValue)
    val ceil = corpusDocs / targetDocsPerShard +
      (if (corpusDocs % targetDocsPerShard > 0) 1L else 0L)
    math.max(1L, math.min(1L << 20, ceil)).toInt
  }

  /** The deterministic multi-epoch schedule over any doc frame: every
    * epoch visits every doc in a DIFFERENT but reproducible order.
    * Order key = sha256(epoch || ':' || doc_id) — reshuffles per
    * epoch, identical on every engine/run/partitioning (rand() is
    * none of those). The hash splits into `nShards` SHARDS and ranks
    * within (epoch, shard): fully parallel windows whose groups are
    * corpus/nShards, and the loader streams shards in order — exactly
    * the layout snk_train_shards writes. Size nShards with
    * [[epochShuffleShards]]; `headPerShard` (None = full schedule)
    * pins only each stream's head, which Spark executes as a
    * WindowGroupLimit partial top-k (no full sort materialized). */
  def epochShuffleFrom(docs: DataFrame, nEpochs: Int, nShards: Int,
      headPerShard: Option[Int]): DataFrame = {
    require(nEpochs > 0 && nShards > 0)
    val s = docs.sparkSession
    val epochs = s.range(0, nEpochs.toLong).toDF("epoch")
    val keyed = docs
      .select(col("doc_id")).crossJoin(broadcast(epochs))
      .withColumn("okey",
        sha2(concat(col("epoch").cast("string"), lit(":"),
          col("doc_id").cast("string")), 256))
      .withColumn("shard",
        (conv(substring(col("okey"), 1, 6), 16, 10)
          .cast("bigint") % nShards).cast("int"))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("okey"), col("doc_id"))
    val ranked = keyed.withColumn("rank", row_number().over(w))
    headPerShard.fold(ranked)(h => ranked.filter(col("rank") <= h))
      .select(col("epoch"), col("shard"), col("rank"), col("doc_id"))
  }

  /** sample_epoch_shuffle — the declared schedule: 3 epochs, the head
    * of each shard stream pinned so the oracle checks real order, not
    * just membership. nShards is pinned to 8 HERE to keep the oracle
    * byte-stable; production callers size it via epochShuffleShards
    * so the window groups stay bounded at any corpus size. */
  def sampleEpochShuffle(s: SparkSession, dir: String): DataFrame =
    epochShuffleFrom(documents(s, dir), nEpochs = 3, nShards = 8,
      headPerShard = Some(5))
      .orderBy(col("epoch"), col("shard"), col("rank"))

  val sampleEpochShuffleSql: String =
    """WITH k AS (
      |  SELECT e.epoch, d.doc_id,
      |    sha256(CAST(e.epoch AS VARCHAR) || ':' ||
      |      CAST(d.doc_id AS VARCHAR)) AS okey
      |  FROM documents d, (SELECT unnest(generate_series(0, 2)) AS epoch) e),
      |r AS (
      |  SELECT epoch,
      |    CAST(CAST('0x' || substr(okey, 1, 6) AS BIGINT) % 8 AS INT)
      |      AS shard,
      |    doc_id, okey
      |  FROM k)
      |SELECT epoch, shard,
      |  CAST(row_number() OVER (PARTITION BY epoch, shard
      |    ORDER BY okey, doc_id) AS INT) AS rank,
      |  doc_id
      |FROM r
      |QUALIFY rank <= 5
      |ORDER BY epoch, shard, rank""".stripMargin

  /** Expected per-cluster draw for sample_cluster_balanced. */
  private val CB_TARGET = 32L

  /** sample_cluster_balanced — topic-balanced subsampling: draw
    * ~[[CB_TARGET]] vectors per k-means cluster regardless of
    * cluster size (the mixture-balancing step SemDeDup-style
    * pipelines run after clustering: big topics are downsampled,
    * small topics kept whole, so no topic dominates the epoch).
    * Admission is per-cluster hash-rate: a member survives iff
    * bucket(vec_id)·|cluster| < 1000·TARGET — the integer cross
    * -multiplied form of bucket/1000 < TARGET/|cluster|, exact with
    * no float-rate boundary rows. Expected draw = TARGET per
    * cluster (whole cluster when |cluster| ≤ TARGET); binomial
    * variance is the price of the scan-shaped plan.
    *
    * Scale design: the cluster-size table is k rows (broadcast); the
    * decision is then a pure narrow predicate on the assignment scan
    * — no window, no global sort, no shuffle of corpus rows at all
    * (contrast sample_stratified's per-stratum window, fine at k
    * strata but a sort bottleneck if a cluster holds half the
    * corpus). Deterministic under rerun/repartition/engine because
    * the bucket is content-hash, and the whole chain — converged
    * centroids, assignment, sizes, admission — replays in the
    * oracle. */
  def sampleClusterBalanced(s: SparkSession, dir: String): DataFrame = {
    val assign = SimilarityQueries.embKmeansAssign(s, dir)
      .select(col("vec_id"), col("cid"))
    val sizes = assign.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_cluster"))
    assign.join(broadcast(sizes), Seq("cid"))
      .withColumn("bucket", hashBucket(col("vec_id")))
      .filter(col("bucket") * col("n_cluster") < lit(1000L * CB_TARGET))
      .select(col("cid"), col("vec_id"), col("bucket"), col("n_cluster"))
  }

  /** sample_cluster_balanced oracle — the converged-assignment chain
    * ([[SimilarityQueries.embKmeansAssignSql]]) as a derived table,
    * then the same integer admission predicate. */
  val sampleClusterBalancedSql: String =
    s"""WITH a AS (SELECT vec_id, cid
       |  FROM (${SimilarityQueries.embKmeansAssignSql}) z),
       |sz AS (SELECT cid, count(*) AS n_cluster FROM a GROUP BY cid),
       |b AS (SELECT a.cid, a.vec_id, sz.n_cluster,
       |  CAST('0x' || substr(sha256(CAST(a.vec_id AS VARCHAR)), 1, 6)
       |    AS BIGINT) % 1000 AS bucket
       |  FROM a JOIN sz USING (cid))
       |SELECT cid, vec_id, bucket, n_cluster FROM b
       |WHERE bucket * n_cluster < 1000 * $CB_TARGET""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_cluster_balanced" -> (sampleClusterBalanced _),
    "agg_dataset_checksum" -> (aggDatasetChecksum _),
    "sample_hash_fraction" -> (sampleHashFraction _),
    "sample_stratified" -> (sampleStratified _),
    "sample_weighted" -> (sampleWeighted _),
    "sample_split" -> (sampleSplit _),
    "sample_temperature" -> (sampleTemperature _),
    "sample_token_budget" -> (sampleTokenBudget _),
    "sample_epoch_shuffle" -> (sampleEpochShuffle _)
  )

  def oracle: Map[String, String] = Map(
    "sample_cluster_balanced" -> sampleClusterBalancedSql,
    "agg_dataset_checksum" -> aggDatasetChecksumSql,
    "sample_hash_fraction" -> sampleHashFractionSql,
    "sample_stratified" -> sampleStratifiedSql,
    "sample_weighted" -> sampleWeightedSql,
    "sample_split" -> sampleSplitSql,
    "sample_temperature" -> sampleTemperatureSql,
    "sample_token_budget" -> sampleTokenBudgetSql,
    "sample_epoch_shuffle" -> sampleEpochShuffleSql
  )
}
