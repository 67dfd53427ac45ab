package graft.operators

import java.nio.file.Paths

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import graft.Tables._
import graft.functions.TextFunctions

/** Text-analysis operators over the `documents` table (SURVEY.md
  * §2.11): per-doc stats, term frequencies, quality scoring, language
  * ID, fingerprinting — the text half of a training-data pipeline.
  * All oracle-checked queries are pure expressions; heuristic ops
  * (langid, winnowing) are declared rows-only and unit-tested.
  */
object TextQueries {

  /** Adjacent word pairs from a BOUND split array, one pass: zip_with
    * against the tail shifted by one. The tail is 1 shorter, so the
    * last pair carries b = null — callers filter it. 1 << 30, not
    * Int.MaxValue: slice computes start+length in int and MaxValue
    * overflows it to an empty slice. Shared by textCooccurrence and
    * textBigramLogprob so the overflow workaround lives once. */
  private[operators] def adjacentPairs(ws: Column): Column =
    zip_with(ws, slice(ws, 2, 1 << 30),
      (a, b) => struct(a.as("a"), b.as("b")))

  /** Sentence-boundary regex (RE2 ∩ java.util.regex subset): runs of
    * non-terminators with an optional trailing terminator. The ONE
    * definition behind fn_sentence_split and text_sentence_dedup and
    * both their oracles — a segmentation change must not desync them. */
  private[operators] val SENT_RE = "[^.!?]+[.!?]?"

  /** text_stats — per-language corpus statistics: doc counts, char
    * lengths, word counts, BPE-ish token counts. Single hash agg. */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    documents(s, dir)
      .select(col("lang"), col("n_chars"),
        size(toks).as("n_words"),
        TextFunctions.bpeishCount(col("text")).as("n_tokens"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        // +1e-9 pre-round on BOTH engines (the file-wide convention):
        // an average landing exactly on a .xx5 boundary otherwise
        // rounds differently between Spark's decimal-string HALF_UP
        // and DuckDB's binary-double round
        round(avg(col("n_chars")) + lit(1e-9), 2).as("avg_chars"),
        round(avg(col("n_words")) + lit(1e-9), 2).as("avg_words"),
        round(avg(col("n_tokens")) + lit(1e-9), 2).as("avg_tokens"),
        max(col("n_chars")).as("max_chars"))
  }

  val textStatsSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  round(avg(n_chars) + 1e-9, 2) AS avg_chars,
      |  round(avg(len(string_split(text, ' '))) + 1e-9, 2) AS avg_words,
      |  round(avg(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))
      |    + 1e-9, 2) AS avg_tokens,
      |  max(n_chars) AS max_chars
      |FROM documents GROUP BY lang""".stripMargin

  /** text_tokens_tf — term frequencies: top-10 terms per language
    * (count DESC, term ASC tiebreak — total order for hash-compare).
    * Explode → two-phase hash agg → windowed top-k. */
  def textTokensTf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("term"))
    documents(s, dir)
      .select(col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk"), col("term"), col("cnt"))
  }

  val textTokensTfSql: String =
    """SELECT lang, rk, term, cnt FROM (
      |  SELECT lang, term, cnt,
      |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rk
      |  FROM (
      |    SELECT lang, t.term, count(*) AS cnt
      |    FROM documents, unnest(string_split(text, ' ')) AS t(term)
      |    WHERE len(t.term) > 0
      |    GROUP BY lang, t.term))
      |WHERE rk <= 10""".stripMargin

  /** text_quality — composite quality score per doc: length saturation
    * + stopword ratio + vocabulary diversity (the length/punct/stopword
    * heuristics of LLM data curation), all as expressions. */
  /** The composite quality score as a reusable expression over
    * (text, n_chars) — shared by text_quality, text_quality_filter
    * and pipeline_clean_corpus so all three agree bit-for-bit.
    * +1e-9 pre-round on BOTH engines: composite weights can land
    * exactly on a .00005 boundary where Spark (decimal-string
    * HALF_UP) and DuckDB (binary-double) round differently. */
  private[operators] object QualityScore {
    private val toks = TextFunctions.tokens(col("text"))
    private val stop = typedLit(Seq("the", "a", "of", "and", "to", "in"))
    private val nWords = size(toks).cast("double")
    val stopRatio: Column =
      size(filter(toks, t => array_contains(stop, t))).cast("double") / nWords
    val diversity: Column =
      size(array_distinct(toks)).cast("double") / nWords
    val lenScore: Column =
      least(col("n_chars").cast("double") / 500.0, lit(1.0))
    val quality: Column =
      round(lenScore * 0.4 + stopRatio * 0.3 + diversity * 0.3 + 1e-9, 4)

    /** The SAME composite score as DuckDB SQL — the ONE definition
      * every quality-scoring oracle interpolates (a weight change
      * must not desync an oracle from the Spark expression; grep
      * QUALITY_SQL for the current call sites rather than trusting
      * a count here). */
    val QUALITY_SQL: String =
      "round(least(CAST(n_chars AS DOUBLE)/500.0, 1.0)*0.4 + " +
        "(CAST(len(list_filter(string_split(text,' '), " +
        "w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE) " +
        "/ len(string_split(text,' ')))*0.3 + " +
        "(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) " +
        "/ len(string_split(text,' ')))*0.3 + 1e-9, 4)"
  }

  def textQuality(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      round(QualityScore.lenScore, 4).as("len_score"),
      round(QualityScore.stopRatio, 4).as("stop_ratio"),
      round(QualityScore.diversity, 4).as("diversity"),
      QualityScore.quality.as("quality"))

  val textQualitySql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS len_score,
      |    CAST(len(list_filter(string_split(text,' '),
      |      w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE)
      |      / len(string_split(text,' ')) AS stop_ratio,
      |    CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
      |      / len(string_split(text,' ')) AS diversity
      |  FROM documents)
      |SELECT doc_id, round(len_score,4) AS len_score,
      |  round(stop_ratio,4) AS stop_ratio, round(diversity,4) AS diversity,
      |  round(len_score*0.4 + stop_ratio*0.3 + diversity*0.3 + 1e-9, 4) AS quality
      |FROM t""".stripMargin

  /** text_tfidf — corpus-weighted top terms per language: term
    * frequency × inverse document frequency, two hash aggs + a
    * broadcast of the (tiny) doc-count, windowed top-5. */
  def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    val nDocs = docs.count() // tiny scalar; driver-side by design
    val terms = docs
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(TextFunctions.tokens(col("text"))))
          .as("term"))
      .filter(length(col("term")) > 0)
    val df = terms.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val tf = terms.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(df, Seq("term"))
      .withColumn("tfidf",
        round(col("tf") * log(lit(nDocs.toDouble) / col("df")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("term"), col("tfidf"))
  }

  val textTfidfSql: String =
    """WITH terms AS (
      |  SELECT DISTINCT doc_id, lang, t.term
      |  FROM documents, unnest(string_split(text, ' ')) AS t(term)
      |  WHERE len(t.term) > 0),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
      |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term),
      |tf AS (SELECT lang, term, count(*) AS tf FROM terms GROUP BY lang, term),
      |scored AS (
      |  SELECT lang, tf.term,
      |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
      |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
      |SELECT lang, rk, term, tfidf FROM (
      |  SELECT lang, term, tfidf,
      |    row_number() OVER (PARTITION BY lang ORDER BY tfidf DESC, term) AS rk
      |  FROM scored)
      |WHERE rk <= 5""".stripMargin

  /** text_bm25 — Okapi BM25 retrieval scoring (the Lucene idf form:
    * ln(1 + (N-df+0.5)/(df+0.5)); k1=1.2, b=0.75) of every document
    * against a fixed query, global top-20. The scale shape: the term
    * explode is filtered to the |q|=3 query terms BEFORE any
    * aggregation, so the only wide operation carries ≤ |q| rows per
    * document — df and the corpus stats (N, avgdl) then join back as
    * provably bounded broadcasts (|q| rows and 1 row). The global
    * top-k is orderBy+limit → TakeOrderedAndProject, a per-partition
    * heap + driver merge of 20 rows, never a full sort. Ordering and
    * the cutoff use the ROUNDED score (+1e-9, 4dp, both engines) with
    * doc_id tiebreak, so the selected set is engine-stable. */
  def textBm25(s: SparkSession, dir: String): DataFrame =
    bm25Top(s, dir, 20)

  /** The BM25 scan-time pipeline with a caller-chosen pool size —
    * textBm25 IS bm25Top(_, _, 20); the hybrid-fusion operator
    * ([[SimilarityQueries.simHybridRrf]]) takes a deeper pool. */
  private[operators] def bm25Top(
      s: SparkSession, dir: String, k: Int): DataFrame = {
    val docs = documents(s, dir)
    val dl = docs.select(col("doc_id"),
      size(TextFunctions.tokens(col("text"))).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .filter(col("term").isin(BM25_QUERY: _*)) // prune pre-shuffle
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    tf.join(broadcast(df), Seq("term")) // ≤ |query| rows — bounded
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats)) // 1 row — bounded
      .withColumn("part", bm25Part)
      .groupBy(col("doc_id"), col("dl"))
      .agg(round(sum(col("part")) + lit(1e-9), 4).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .select(col("doc_id"), col("dl").cast("long").as("dl"),
        col("n_terms_hit"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  private[operators] val BM25_QUERY = Seq("spark", "vector", "stream")
  private val BM25_K1 = 1.2
  private val BM25_B = 0.75

  /** The BM25 per-(doc, term) partial score — shared verbatim by the
    * scan-time form (textBm25) and the index-served form
    * (textBm25Indexed) so the two paths cannot drift. */
  private def bm25Part: Column =
    log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
      col("tf") * lit(BM25_K1 + 1) /
      (col("tf") + lit(BM25_K1) *
        (lit(1 - BM25_B) + lit(BM25_B) * col("dl") / col("avgdl")))

  /** Term → index bucket. String.hashCode is a fixed public algorithm
    * (JLS §String.hashCode), so the write side (partition column) and
    * the serve side (literal bucket list for a query's terms) always
    * agree, with no driver-side Spark job to compute buckets. */
  private[operators] val IDX_BUCKETS = 64
  private def idxBucketOf(t: String): Int =
    Math.floorMod(if (t == null) 0 else t.hashCode, IDX_BUCKETS)
  private val idxBucket = udf { t: String => idxBucketOf(t) }

  /** snk_text_index / text_bm25_indexed / stream_index_upsert share
    * this layout: a persisted inverted index — the "build once, serve
    * many" artifact a 100 TB retrieval deployment actually queries.
    * All parquet:
    *
    *   postings/bucket=NN/batch_id=M/ (term, doc_id, tf, dl) —
    *     term-bucketed postings with the doc-length norm DENORMALIZED
    *     in (the norms-with-postings layout): serving never joins a
    *     corpus-sized doc table. batch_id scopes each ingest batch to
    *     its own partition, so a replayed batch OVERWRITES itself
    *     instead of double-appending — exactly-once via layout.
    *   terms/bucket=NN/    (term, df) — per-term document frequency.
    *   stats/batch_id=M/   (n_docs, sum_dl) — summable per-batch
    *     corpus stats; serving folds them (avgdl = Σsum_dl / Σn_docs).
    *
    * A batch build is appendToIndex(all docs, batch 0); the streaming
    * sink calls the same function per micro-batch — one write kernel
    * to audit for both modes (the upsertSink pattern). */
  /** One build per corpus per JVM — "build once, serve many" IS the
    * index's contract. Bench force-builds both indexes during its
    * untimed warmup, so every indexed qid (sink audit and serve
    * paths alike) measures its own cost rather than whichever qid
    * happens to run first paying the build. The memo key includes a
    * cheap file-stat fingerprint of the corpus, so a fixture
    * regenerated in place builds a NEW index instead of silently
    * serving a stale one; memoized temp roots are removed at JVM
    * exit. Tests that need fresh roots call appendToIndex directly. */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def buildTextIndex(s: SparkSession, dir: String): String = {
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    indexCache.computeIfAbsent(s"$dir|$fp", { _ =>
      MemoBuilds.record("text_index")
      val root = java.nio.file.Files
        .createTempDirectory("graft-textindex").toString
      IndexManifest.registerTempRoot(root)
      buildTextIndexAt(s, dir, root)
    })
  }

  /** Testing hook: drop the per-JVM build memos (e.g. after deleting
    * a memoized root). Serving state is otherwise all on disk. */
  private[graft] def invalidateIndexCache(): Unit = indexCache.clear()

  /** Build the inverted index into a CALLER-CHOSEN durable root and
    * stamp it with a manifest — the cross-session deployment contract
    * (the per-JVM memo above only simulates it). A later session
    * serves via [[openTextIndex]] with no rebuild. The manifest lands
    * LAST, so it marks a completed build. */
  def buildTextIndexAt(s: SparkSession, dir: String, root: String): String = {
    appendToIndex(documents(s, dir).select(col("doc_id"), col("text")),
      root, batchId = 0L)
    IndexManifest.write(root, "text-bm25", Map(
      "n_buckets" -> IDX_BUCKETS.toString,
      "corpus" -> dir,
      "corpus_fingerprint" -> IndexManifest.corpusFingerprint(dir, "documents")))
    root
  }

  /** Reopen a durable index root built by [[buildTextIndexAt]] —
    * possibly by an earlier session/JVM. Verifies the manifest and the
    * engine constants the serve path depends on (bucket pruning
    * recomputes term buckets at serve time, so a bucket-count mismatch
    * would silently drop postings). Returns the root for
    * [[bm25ServeFrom]] / [[bm25ServeBatchFrom]]. */
  def openTextIndex(root: String): String = {
    IndexManifest.open(root, "text-bm25",
      Map("n_buckets" -> IDX_BUCKETS.toString))
    // a compaction that crashed mid-swap replays to completion here,
    // under the exclusive maintenance lease — the replay moves live
    // dirs (one manifest read when no journal entry exists)
    IndexRecovery.replayPendingLeased(root)
    root
  }

  /** Merge one batch of NEW documents into the index at `root`.
    * Per-batch cost is proportional to the batch plus the size of the
    * TOUCHED term buckets (df refresh reads only those partitions),
    * never to the corpus text. Every write is a dynamic partition
    * overwrite scoped by this batch's keys, so replaying a batch id
    * (streaming retry) is idempotent. Assumes doc_ids are new —
    * upstream dedup (dedup_incremental / stream_dedup) owns that. */
  private[graft] def appendToIndex(
      docs: DataFrame, root: String, batchId: Long): Unit = {
    // An unreplayed crashed compaction MUST replay before this append
    // lands new batch dirs: the eventual replay's marker-driven prune
    // deletes every live part dir absent from its staged set — which
    // would include the dirs this append is about to write. One
    // manifest read when nothing is pending; the replay itself runs
    // under the exclusive maintenance lease (it moves live dirs).
    IndexRecovery.replayPendingLeased(root)
    // Replaying a batch id that compaction folded away would dynamic-
    // overwrite partitions now holding the MERGED corpus — data loss,
    // not a double count. Fail loudly instead (compaction is a
    // quiesce-time op; a post-compaction stream restarts above mx).
    // Guard on EVERY folded subdir, not just postings: a delete-aware
    // compaction folds stats/doclens through the DELETE batch's id,
    // which can sit above the postings fold point — an ingest batch
    // between the two would clobber the folded stats row.
    Seq("postings", "stats", "doclens").foreach { d =>
      val ct = IndexCompaction.compactedThrough(root, d)
      require(batchId > ct,
        s"batch $batchId replays into an index compacted through $ct " +
          s"at $d — its partitions were folded into the compacted " +
          "segment; restart the stream with batch ids above the " +
          "compaction point")
    }
    // A real trigger can deliver an empty batch; writing it would
    // leave a postings dir with no data files, and the read-back
    // below would die on schema inference. One extra execution of an
    // EMPTY batch lineage is free — skip outright.
    if (docs.isEmpty) return
    val s = docs.sparkSession
    val dl = docs.select(col("doc_id"),
      size(TextFunctions.tokens(col("text"))).cast("double").as("dl"))
    docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .join(dl, Seq("doc_id"))
      .withColumn("bucket", idxBucket(col("term")))
      .withColumn("batch_id", lit(batchId))
      .repartition(IDX_BUCKETS, col("bucket"))
      .write.partitionBy("bucket", "batch_id")
      .option("partitionOverwriteMode", "dynamic").mode("overwrite")
      .parquet(s"$root/postings")
    // everything below derives from the WRITTEN postings (pruned to
    // this batch's partitions), never re-running the tokenize lineage
    val mine = s.read.parquet(s"$root/postings")
      .filter(col("batch_id") === batchId)
    val touched = mine.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ IDX_BUCKETS values
    // df refresh: recompute ONLY the buckets this batch touched (a
    // partition-pruned read across all batches) and swap exactly
    // those terms/ partitions
    s.read.parquet(s"$root/postings")
      .filter(col("bucket").isin(touched: _*))
      .groupBy(col("bucket"), col("term"))
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
      .repartition(math.max(touched.size, 1), col("bucket"))
      .write.partitionBy("bucket")
      .option("partitionOverwriteMode", "dynamic").mode("overwrite")
      .parquet(s"$root/terms")
    // per-doc (doc_id, dl) pairs are replicated across a doc's terms —
    // distinct recovers exactly one row per doc (split() always yields
    // ≥1 token, so no doc is absent from postings). Persisted as the
    // doclens/ sidecar: ~16 bytes per doc, the table that lets a later
    // DELETE price its stats correction without a corpus-wide postings
    // scan (deleteFromTextIndex). Stats then derive from the WRITTEN
    // sidecar — one lineage, guaranteed agreement.
    mine.select(col("doc_id"), col("dl")).distinct()
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic").mode("overwrite")
      .parquet(s"$root/doclens")
    s.read.parquet(s"$root/doclens")
      .filter(col("batch_id") === batchId)
      .agg(count(lit(1)).cast("double").as("n_docs"),
        sum(col("dl")).as("sum_dl"))
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic").mode("overwrite")
      .parquet(s"$root/stats")
  }

  /** Delete documents from the index at `root` — the takedown/GDPR
    * path (see [[IndexDeletes]] for the tombstone design). O(|ids| +
    * |doclens|) work, never a postings scan:
    *
    *   - the ids are priced against the doclens/ sidecar (one tiny
    *     row per doc) to find which are LIVE and what document length
    *     each carried; already-tombstoned and never-ingested ids
    *     contribute nothing (delete is idempotent by content).
    *   - tombstones land in `deletes/batch_id=D/`; serving anti-joins
    *     them and recomputes query-term df from live postings.
    *   - a NEGATIVE summable stats row (−n_docs, −sum_dl) lands in
    *     `stats/batch_id=D/` — the existing serve-time stats fold then
    *     yields live-corpus n_docs/avgdl with no serve-path change.
    *
    * Delete batches share the ingest stream's monotone batch-id space.
    * Replays are safe: the "newly deleted" set is computed against
    * every OTHER batch's tombstones, so a replay recomputes and
    * overwrites exactly its first attempt's partitions. Returns the
    * number of newly tombstoned (live) docs. Pre-sidecar roots (built
    * before doclens existed) fall back to deriving (doc_id, dl) from
    * a postings scan, and PARTIALLY covered sidecars derive just their
    * uncovered batches (see [[docLengthsOf]]) — correct either way,
    * just not sidecar-cheap.
    *
    * Crash-ordering: tombstones land BEFORE the negative stats row on
    * purpose — a crash between the two fails SAFE for takedown
    * semantics (the docs are already invisible; n_docs/avgdl ride
    * slightly high until repair) where the opposite order would keep
    * serving supposedly-deleted docs. The skew self-heals on the
    * stream's checkpoint replay, and even without a replay the next
    * [[compactTextIndex]] re-derives the folded stats row from the
    * live doclens rather than trusting the per-batch rows. */
  def deleteFromTextIndex(s: SparkSession, root: String,
      ids: DataFrame, batchId: Long): Long = {
    // same pre-append discipline as appendToIndex: replay any crashed
    // compaction (leased — the replay moves live dirs) before landing
    // tombstone/stats dirs a later replay's prune would otherwise
    // delete
    IndexRecovery.replayPendingLeased(root)
    Seq("postings", "stats", "doclens", IndexDeletes.Subdir).foreach { d =>
      val ct = IndexCompaction.compactedThrough(root, d)
      require(batchId > ct,
        s"delete batch $batchId replays into an index compacted " +
          s"through $ct at $d — restart above the compaction point")
    }
    val doclens = docLengthsOf(s, root)
      .getOrElse(return 0L) // nothing ingested yet — nothing can be live
    val others = IndexDeletes.readDeletesExcept(s, root, "doc_id", batchId)
    val newly = others.foldLeft(
      doclens.join(broadcast(ids.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_semi")) { (d, t) =>
      d.join(broadcast(t), Seq("doc_id"), "left_anti")
    }.cache()
    try {
      val n = newly.count()
      if (n == 0) return 0L
      IndexDeletes.writeTombstones(newly, root, "doc_id", batchId)
      newly.agg((-count(lit(1))).cast("double").as("n_docs"),
        (-sum(col("dl"))).as("sum_dl"))
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic").mode("overwrite")
        .parquet(s"$root/stats")
      n
    } finally newly.unpersist()
  }

  /** The (doc_id, dl) pairs of every ingested document — None when
    * nothing was ever ingested. The doclens/ sidecar is the cheap
    * source, but its mere EXISTENCE is not full coverage: a root with
    * pre-sidecar ingest batches plus one post-upgrade append holds a
    * PARTIAL sidecar, and trusting it would make deletes of old-batch
    * docs silent no-ops (no doclens row → no tombstone → "0 deleted").
    * Coverage is priced by batch ids (directory names, no data read):
    * postings batches absent from doclens/ get their pairs re-derived
    * from exactly those postings partitions — cost proportional to the
    * uncovered batches, never the covered corpus. */
  private def docLengthsOf(s: SparkSession, root: String)
      : Option[DataFrame] = {
    val dlDir = java.nio.file.Paths.get(root, "doclens")
    val poDir = java.nio.file.Paths.get(root, "postings")
    val hasDl = IndexDeletes.hasParquet(dlDir)
    val hasPo = IndexDeletes.hasParquet(poDir)
    if (!hasDl && !hasPo) return None
    if (!hasDl) // pre-sidecar root: recover everything from postings
      return Some(s.read.parquet(s"$root/postings")
        .select(col("doc_id"), col("dl")).distinct())
    val base = s.read.parquet(s"$root/doclens")
      .select(col("doc_id"), col("dl"))
    val missing =
      if (!hasPo) Nil
      else (IndexCompaction.listBatchIds(poDir).toSet --
        IndexCompaction.listBatchIds(dlDir).toSet).toSeq
    if (missing.isEmpty) Some(base)
    else Some(base.unionByName(
      s.read.parquet(s"$root/postings")
        .filter(col("batch_id").isin(missing.map(Long.box): _*))
        .select(col("doc_id"), col("dl")).distinct()))
  }

  /** Make a partially-covered doclens/ sidecar whole: derive the
    * (doc_id, dl) rows of every postings batch the sidecar is missing
    * and land them under their own batch partitions. Run by
    * [[compactTextIndex]] BEFORE its folds — compaction relabels every
    * folded row to one batch id, which would otherwise make the
    * batch-id coverage check above read a still-partial sidecar as
    * complete forever after. No-op on fully covered and on wholly
    * pre-sidecar roots (the latter keep their documented
    * postings-scan fallback until an append writes the first sidecar
    * batch). */
  private[operators] def backfillDoclens(s: SparkSession,
      root: String): Unit = {
    val dlDir = java.nio.file.Paths.get(root, "doclens")
    val poDir = java.nio.file.Paths.get(root, "postings")
    if (!IndexDeletes.hasParquet(dlDir) ||
      !IndexDeletes.hasParquet(poDir)) return
    val missing = (IndexCompaction.listBatchIds(poDir).toSet --
      IndexCompaction.listBatchIds(dlDir).toSet).toSeq
    if (missing.isEmpty) return
    s.read.parquet(s"$root/postings")
      .filter(col("batch_id").isin(missing.map(Long.box): _*))
      .select(col("doc_id"), col("dl"), col("batch_id"))
      .distinct()
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic").mode("overwrite")
      .parquet(s"$root/doclens")
  }

  /** snk_text_index — build the inverted index and audit the written
    * postings. Unlike the other sinks, the audit is fully
    * oracle-checkable: postings are exact whitespace-token counts. */
  def snkTextIndex(s: SparkSession, dir: String): DataFrame = {
    val root = buildTextIndex(s, dir)
    s.read.parquet(s"$root/postings")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("term")).as("n_terms"),
        count(lit(1)).as("n_postings"),
        sum(col("tf")).cast("long").as("total_tf"))
  }

  val snkTextIndexSql: String =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  GROUP BY 1, 2)
      |SELECT count(DISTINCT doc_id) AS n_docs,
      |  count(DISTINCT term) AS n_terms,
      |  count(*) AS n_postings,
      |  CAST(sum(tf) AS BIGINT) AS total_tf
      |FROM tf""".stripMargin

  /** Compact the inverted index at `root`: fold every (bucket,
    * batch_id) postings partition into one file per bucket and the
    * per-batch stats rows into a single summed row — the maintenance
    * op that pays down streamed ingest's small-files debt (see
    * [[IndexCompaction]] for the crash-safe journal). terms/ is
    * already one partition per bucket (each append refreshes touched
    * buckets in place) and needs no folding — UNLESS tombstones are
    * pending. Serve results are byte-identical before and after —
    * pinned in IndexCompactionSpec.
    *
    * Pending tombstones (deleteFromTextIndex) are applied physically
    * here: the postings and doclens folds anti-join them out (forced
    * even over a single batch), the stats fold sums the deletes'
    * negative rows away, terms/ df is rebuilt from the live postings,
    * and the tombstones are cleared LAST — a crash at any earlier
    * point leaves tombstones in place and serving correct (an
    * anti-join of already-removed rows is a no-op). */
  def compactTextIndex(s: SparkSession, root: String)
      : Seq[IndexCompaction.CompactStats] = IndexLease.withMaintenance(root) {
    // a partially-covered sidecar must be made whole BEFORE the folds:
    // the fold relabels every row to one batch id, after which the
    // coverage gap could never be detected again (see backfillDoclens)
    backfillDoclens(s, root)
    val del = IndexDeletes.readDeletes(s, root, "doc_id")
    def dropDeleted(df: DataFrame): DataFrame =
      del.fold(df)(d => df.join(broadcast(d), Seq("doc_id"), "left_anti"))
    val hasDoclens = IndexDeletes.hasParquet(
      java.nio.file.Paths.get(root, "doclens"))
    // the folded stats row is re-DERIVED from the live doclens rather
    // than summed from the per-batch rows whenever the sidecar exists:
    // a delete that crashed between its tombstone write and its
    // negative stats row leaves the per-batch sum skewed, and folding
    // that sum would make the skew permanent — the sidecar is the
    // ground truth the per-batch rows merely cache. Pre-sidecar roots
    // keep the summing fold (their rows are the only record).
    val statsMerge: DataFrame => DataFrame =
      if (hasDoclens)
        _ => dropDeleted(s.read.parquet(s"$root/doclens"))
          .agg(count(lit(1)).cast("double").as("n_docs"),
            sum(col("dl")).as("sum_dl"))
      else
        _.groupBy().agg(
          sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    val stats = Seq(
      IndexCompaction.compact(s, root, "postings", Seq("bucket"),
        merge = dropDeleted, force = del.isDefined),
      IndexCompaction.compact(s, root, "stats", Nil,
        merge = statsMerge, force = del.isDefined)) ++
      // pre-sidecar roots have no doclens/ to fold
      (if (hasDoclens)
        Seq(IndexCompaction.compact(s, root, "doclens", Nil,
          merge = dropDeleted, force = del.isDefined))
      else Nil)
    if (del.isDefined) {
      // deleted docs no longer count toward df: rebuild terms/ from
      // the now-live postings (compaction already paid a corpus-wide
      // rewrite; this is one more bounded aggregate over it), then
      // clear the tombstones — the LAST step, see the scaladoc
      s.read.parquet(s"$root/postings")
        .groupBy(col("bucket"), col("term"))
        .agg(countDistinct(col("doc_id")).cast("double").as("df"))
        .repartition(col("bucket"))
        .write.partitionBy("bucket")
        // static on purpose: this is a FULL replace — a bucket whose
        // every posting was deleted must lose its terms partition too
        // (dynamic mode would leave it stale)
        .option("partitionOverwriteMode", "static")
        .mode("overwrite")
        .parquet(s"$root/terms")
      IndexDeletes.fenceAndClear(root)
    }
    stats
  }

  /** The snk_text_index_compact fixture: the corpus streamed in as
    * three disjoint batches (split by doc_id mod 3 — union == corpus),
    * then compacted. Memoized per JVM like every sink fixture; the
    * qid times the audit, the specs own behavior. */
  private val compactedRootCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def ensureCompactedTextRoot(
      s: SparkSession, dir: String): String = {
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    compactedRootCache.computeIfAbsent(s"$dir|$fp", { _ =>
      MemoBuilds.record("text_root_compacted")
      val root = java.nio.file.Files
        .createTempDirectory("graft-textindex-compact").toString
      IndexManifest.registerTempRoot(root)
      val docs = documents(s, dir).select(col("doc_id"), col("text"))
      (0 to 2).foreach { b =>
        appendToIndex(docs.filter(pmod(col("doc_id"), lit(3)) === b),
          root, batchId = b.toLong)
      }
      compactTextIndex(s, root)
      root
    })
  }

  /** snk_text_index_compact — stream the corpus in as three batches,
    * compact, audit. The postings audit must equal snk_text_index's
    * (compaction moves bytes, never changes content) and exactly ONE
    * batch partition may remain — both facts oracle-checked. */
  def snkTextIndexCompact(s: SparkSession, dir: String): DataFrame = {
    val root = ensureCompactedTextRoot(s, dir)
    s.read.parquet(s"$root/postings")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("term")).as("n_terms"),
        count(lit(1)).as("n_postings"),
        sum(col("tf")).cast("long").as("total_tf"),
        countDistinct(col("batch_id")).as("n_batch_parts"))
  }

  val snkTextIndexCompactSql: String =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  GROUP BY 1, 2)
      |SELECT count(DISTINCT doc_id) AS n_docs,
      |  count(DISTINCT term) AS n_terms,
      |  count(*) AS n_postings,
      |  CAST(sum(tf) AS BIGINT) AS total_tf,
      |  CAST(1 AS BIGINT) AS n_batch_parts
      |FROM tf""".stripMargin

  /** The snk_text_index_delete fixture: the corpus streamed in as
    * three batches, then every doc_id ≡ 3 (mod 7) tombstoned as delete
    * batch 3 — the takedown arriving mid-stream. Memoized per JVM like
    * every sink fixture; the qid times the serve-visible audit, the
    * lifecycle specs own behavior. */
  private val deletedRootCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def ensureDeletedTextRoot(
      s: SparkSession, dir: String): String = {
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    deletedRootCache.computeIfAbsent(s"$dir|$fp", { _ =>
      MemoBuilds.record("text_root_deleted")
      val root = java.nio.file.Files
        .createTempDirectory("graft-textindex-del").toString
      IndexManifest.registerTempRoot(root)
      val docs = documents(s, dir).select(col("doc_id"), col("text"))
      (0 to 2).foreach { b =>
        appendToIndex(docs.filter(pmod(col("doc_id"), lit(3)) === b),
          root, batchId = b.toLong)
      }
      deleteFromTextIndex(s, root,
        docs.filter(pmod(col("doc_id"), lit(7)) === 3).select("doc_id"),
        batchId = 3L)
      root
    })
  }

  /** snk_text_index_delete — tombstone deletes on the persisted
    * inverted index (see [[deleteFromTextIndex]]): audit what a
    * SERVE-time reader sees after the delete batch — the live postings
    * (tombstones anti-joined, exactly the serve path's view) must
    * equal an index over the never-deleted corpus, and the tombstone
    * count is the planted id set. Fully oracle-checked: DuckDB
    * recomputes the live index from `documents` minus the deleted
    * ids, so a tombstone that leaks into (or over-hides from) the
    * serve view goes hash-red. */
  def snkTextIndexDelete(s: SparkSession, dir: String): DataFrame = {
    val root = ensureDeletedTextRoot(s, dir)
    val del = IndexDeletes.readDeletes(s, root, "doc_id")
      .getOrElse(sys.error(s"delete fixture at $root lost its tombstones"))
    s.read.parquet(s"$root/postings")
      .join(broadcast(del), Seq("doc_id"), "left_anti")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("term")).as("n_terms"),
        count(lit(1)).as("n_postings"),
        sum(col("tf")).cast("long").as("total_tf"))
      .crossJoin(broadcast(del.agg(count(lit(1)).as("n_tombstones"))))
  }

  val snkTextIndexDeleteSql: String =
    """WITH live AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3),
      |tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM live)
      |  GROUP BY 1, 2)
      |SELECT count(DISTINCT doc_id) AS n_docs,
      |  count(DISTINCT term) AS n_terms,
      |  count(*) AS n_postings,
      |  CAST(sum(tf) AS BIGINT) AS total_tf,
      |  (SELECT count(*) FROM documents WHERE doc_id % 7 = 3)
      |    AS n_tombstones
      |FROM tf""".stripMargin

  /** text_bm25_indexed — the SAME top-20 as text_bm25, served from
    * the persisted index instead of a corpus scan: the query's term
    * buckets prune to a known directory subset (PartitionFilters on
    * bucket + pushed row-group filter on term), df and the corpus
    * stats arrive as ≤|q|-row and 1-row broadcasts, and the norm (dl)
    * rides the postings — at serve time NOTHING corpus-sized is
    * scanned, joined, or shuffled. Oracle: text_bm25's SQL verbatim;
    * PlanShapeSpec pins the pruned-serve shape and TextIndexSpec pins
    * exact row parity with the scan-time form. */
  def textBm25Indexed(s: SparkSession, dir: String): DataFrame =
    IndexServe.bm25TopK(s, buildTextIndex(s, dir))

  // Serve-time read schemas. The index layouts are engine-owned (see
  // the layout scaladoc above), so declaring them skips parquet
  // footer-inference at plan time — a fixed ~50 ms per read per serve
  // call that a high-QPS tier pays on every request.
  private val PostingsSchema = StructType(Seq(
    StructField("term", StringType), StructField("doc_id", LongType),
    StructField("tf", DoubleType), StructField("dl", DoubleType),
    StructField("bucket", IntegerType), StructField("batch_id", LongType)))
  private val TermsSchema = StructType(Seq(
    StructField("term", StringType), StructField("df", DoubleType),
    StructField("bucket", IntegerType)))
  private val StatsSchema = StructType(Seq(
    StructField("n_docs", DoubleType), StructField("sum_dl", DoubleType),
    StructField("batch_id", LongType)))

  /** The live-corpus (n_docs, avgdl) fold, memoized per root behind a
    * stats-dir fingerprint: the fold is one tiny aggregate, but as a
    * broadcast subquery it costs a whole Spark job on EVERY serve
    * call. The fingerprint (file count/bytes/max-mtime — stat-only)
    * moves whenever an ingest, delete, or compaction touches stats/,
    * so the memo can never serve a stale fold over a changed index;
    * delete-correctness is free because deletes land NEGATIVE rows in
    * the same fold. */
  private val statsCache =
    new BoundedMemo[(Double, Double)](64, "text_stats")

  private def liveTextStats(
      s: SparkSession, root: String): (Double, Double) = {
    val fp = IndexManifest.pathFingerprint(Paths.get(root, "stats"))
    statsCache.get(root, fp).getOrElse {
      val r = s.read.schema(StatsSchema).parquet(s"$root/stats")
        .agg(sum(col("n_docs")), sum(col("sum_dl"))).collect().head
      val v =
        if (r.isNullAt(0) || r.getDouble(0) == 0.0) (0.0, 1.0)
        else (r.getDouble(0), r.getDouble(1) / r.getDouble(0))
      statsCache.put(root, fp, v)
      v
    }
  }

  /** Serve a BM25 top-k from an index at `root` — the shared read
    * path for the batch-built and stream-maintained index (parity
    * pinned in TextIndexSpec), and the library's public query API:
    * any term set against any built index, cost ∝ the query terms'
    * pruned buckets. Defaults are the declared qid's fixed query. */
  private[operators] def bm25ServeFrom(
      s: SparkSession, root: String,
      terms: Seq[String] = BM25_QUERY, k: Int = 20): DataFrame = {
    val buckets = terms.map(idxBucketOf).distinct
    val del = IndexDeletes.readDeletes(s, root, "doc_id")
    val postings0 = s.read.schema(PostingsSchema)
      .parquet(s"$root/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(terms: _*))
    // tombstones present: hide deleted docs and recompute query-term
    // df from the LIVE pruned postings (a term lives wholly in its
    // bucket, so the pruned scan sees that term's every posting —
    // the recount is exact and costs only the already-read rows).
    // Corpus stats need no special path: the delete wrote a negative
    // summable stats row, so the memoized fold is already live-corpus.
    val postings = del.fold(postings0)(d =>
      postings0.join(broadcast(d), Seq("doc_id"), "left_anti"))
    val df = del match {
      case None => s.read.schema(TermsSchema).parquet(s"$root/terms")
        .filter(col("bucket").isin(buckets: _*) &&
          col("term").isin(terms: _*))
        .select(col("term"), col("df"))
      case Some(_) => postings.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    }
    // corpus stats enter as driver-memoized LITERALS (liveTextStats):
    // constants fold into codegen, and the per-serve broadcast job the
    // 1-row subquery used to cost is gone
    val (nDocs, avgdl) = liveTextStats(s, root)
    postings.join(broadcast(df), Seq("term"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("avgdl", lit(avgdl))
      .withColumn("part", bm25Part)
      .groupBy(col("doc_id"), col("dl"))
      .agg(round(sum(col("part")) + lit(1e-9), 4).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .select(col("doc_id"), col("dl").cast("long").as("dl"),
        col("n_terms_hit"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** The declared batch for text_bm25_serve_batch: six term-set
    * queries over the fixture vocabulary. Query 1 is text_bm25's own
    * fixed query, so single-serve parity is directly visible in the
    * batch output. Terms are distinct within each query — the serve
    * join contract (a duplicated term would double its partial). */
  private[operators] val BM25_BATCH: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("spark", "vector", "stream"),
    2 -> Seq("join", "hash", "merge"),
    3 -> Seq("window", "agg"),
    4 -> Seq("batch", "scan", "filter"),
    5 -> Seq("dup", "key"),
    6 -> Seq("sort", "order", "query"))

  /** text_bm25_serve_batch — the CONCURRENT-serve shape: a whole
    * query TABLE answered in ONE job against the persisted index.
    * The reference's serve tier is concurrent by construction
    * (stac-fastapi WEB_CONCURRENCY=10, docker-compose.yml:16); at
    * deployment scale the amortized unit is a batch of queries, not
    * one Spark job per query. Oracle: the full BM25 recompute per
    * query in DuckDB; TextIndexSpec additionally pins per-query hash
    * parity with N independent single-query serves. */
  def textBm25ServeBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = BM25_BATCH.flatMap { case (id, ts) => ts.distinct.map(id -> _) }
      .toDF("query_id", "term")
    IndexServe.bm25TopKBatch(s, buildTextIndex(s, dir), q)
  }

  /** Serve a BM25 top-k for EVERY query in `queries` (query_id, term)
    * from the index at `root`, in one job. How each per-query cost
    * stays amortized instead of multiplied:
    *
    *   - pruning is batched: ONE bounded driver read takes the union
    *     of the batch's terms (∝ the request size, never the corpus)
    *     and their ≤ IDX_BUCKETS buckets; one partition-pruned,
    *     row-group-filtered postings scan then feeds every query.
    *   - per-query routing is a broadcast JOIN on term (queries ⋈
    *     postings), not per-query driver filters — adding a query adds
    *     broadcast rows, not scans. df joins the same way; the corpus
    *     stats stay one broadcast row.
    *   - per-query top-k runs through the custom TopKPerGroup heap
    *     operator: ≤ k rows per (query, partition) cross the exchange,
    *     against the window form's full per-query sort+shuffle of
    *     every scored doc (matters precisely when a term is common,
    *     where scored docs ∝ corpus).
    *
    * Still NOTHING corpus-sized is scanned, joined, or shuffled at
    * serve time. */
  private[operators] def bm25ServeBatchFrom(
      s: SparkSession, root: String,
      queries: DataFrame, k: Int = 20): DataFrame = {
    graft.GraftExtensions.register(s)
    val qterms = queries.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq // bounded: the request's terms
    val buckets = qterms.map(idxBucketOf).distinct
    val del = IndexDeletes.readDeletes(s, root, "doc_id")
    val postings0 = s.read.schema(PostingsSchema)
      .parquet(s"$root/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(qterms: _*))
    // same tombstone handling as the single-query serve: anti-join +
    // exact live df recount over the pruned rows (stats fold already
    // live via the delete's negative row)
    val postings = del.fold(postings0)(d =>
      postings0.join(broadcast(d), Seq("doc_id"), "left_anti"))
    val dfr = del match {
      case None => s.read.schema(TermsSchema).parquet(s"$root/terms")
        .filter(col("bucket").isin(buckets: _*) &&
          col("term").isin(qterms: _*))
        .select(col("term"), col("df"))
      case Some(_) => postings.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    }
    // same driver-memoized literal stats as the single-query serve
    val (nDocs, avgdl) = liveTextStats(s, root)
    val scored = postings
      .join(broadcast(queries), Seq("term"))
      .join(broadcast(dfr), Seq("term"))
      .withColumn("n_docs", lit(nDocs))
      .withColumn("avgdl", lit(avgdl))
      .withColumn("part", bm25Part)
      .groupBy(col("query_id"), col("doc_id"), col("dl"))
      .agg(round(sum(col("part")) + lit(1e-9), 4).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .select(col("query_id"), col("doc_id"),
        col("dl").cast("long").as("dl"), col("n_terms_hit"), col("bm25"))
    graft.plans.TopKPerGroup.topKPerGroup(scored,
      keys = Seq("query_id"),
      orderBy = Seq(("bm25", false), ("doc_id", true)), k = k)
  }

  val textBm25ServeBatchSql: String = {
    val vals = BM25_BATCH
      .flatMap { case (id, ts) => ts.distinct.map(t => s"($id, '$t')") }
      .mkString(", ")
    s"""WITH queries(query_id, term) AS (VALUES $vals),
       |dl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |        FROM documents)
       |  WHERE term IN (SELECT term FROM queries)
       |  GROUP BY 1, 2),
       |dfreq AS (
       |  SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
       |  FROM tf GROUP BY 1)
       |SELECT query_id, doc_id, dl, n_terms_hit, bm25 FROM (
       |  SELECT q.query_id, tf.doc_id, CAST(dl.dl AS BIGINT) AS dl,
       |    CAST(count(*) AS BIGINT) AS n_terms_hit,
       |    round(sum(
       |      ln(1 + (n_docs - df + 0.5) / (df + 0.5))
       |        * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
       |    ) + 1e-9, 4) AS bm25,
       |    row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY round(sum(
       |        ln(1 + (n_docs - df + 0.5) / (df + 0.5))
       |          * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
       |      ) + 1e-9, 4) DESC, tf.doc_id) AS rk
       |  FROM queries q JOIN tf USING (term) JOIN dfreq USING (term)
       |  JOIN dl USING (doc_id) CROSS JOIN stats
       |  GROUP BY q.query_id, tf.doc_id, dl.dl, n_docs, avgdl
       |) WHERE rk <= 20""".stripMargin
  }

  val textBm25Sql: String =
    """WITH dl AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
      |  FROM documents),
      |stats AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
      |tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  WHERE term IN ('spark', 'vector', 'stream')
      |  GROUP BY 1, 2),
      |dfreq AS (
      |  SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
      |  FROM tf GROUP BY 1)
      |SELECT doc_id, CAST(dl.dl AS BIGINT) AS dl,
      |  CAST(count(*) AS BIGINT) AS n_terms_hit,
      |  round(sum(
      |    ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      |      * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
      |  ) + 1e-9, 4) AS bm25
      |FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
      |CROSS JOIN stats
      |GROUP BY doc_id, dl.dl
      |ORDER BY bm25 DESC, doc_id
      |LIMIT 20""".stripMargin

  /** The BM25 lexical pool as a composable CTE chain — dl, stats, tf,
    * dfreq exactly as in [[textBm25Sql]], plus
    * `lexpool(doc_id, bm25)` = the rounded-score top-`k` (the same
    * rounded sort key + doc_id tiebreak, so the pool membership is
    * engine-stable). The lexical half of the hybrid-fusion oracles
    * ([[SimilarityQueries.simHybridRrfSql]]); the serve-tier hybrid
    * reuses it verbatim because index-served BM25 is hash-identical
    * to the scan-time form (text_bm25_indexed's oracle IS
    * textBm25Sql). */
  private[operators] def bm25PoolSqlCtes(k: Int): String =
    s"""dl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |        FROM documents)
       |  WHERE term IN ('spark', 'vector', 'stream')
       |  GROUP BY 1, 2),
       |dfreq AS (
       |  SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
       |  FROM tf GROUP BY 1),
       |lexpool AS (
       |  SELECT doc_id,
       |    round(sum(
       |      ln(1 + (n_docs - df + 0.5) / (df + 0.5))
       |        * tf * (1.2 + 1)
       |        / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
       |    ) + 1e-9, 4) AS bm25
       |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
       |  CROSS JOIN stats
       |  GROUP BY doc_id, dl.dl
       |  ORDER BY bm25 DESC, doc_id
       |  LIMIT $k)""".stripMargin

  /** text_langid — heuristic language ID vs the labeled column.
    * The heuristic is pure function-word scoring (TextFunctions
    * .langId), so DuckDB recomputes the full confusion matrix
    * independently — tokenization, per-profile hit rates, first-max
    * tie-break, CJK short-circuit, and the 0.02 evidence floor all
    * hash-gated; accuracy floors additionally in TextQueriesSpec. */
  def textLangid(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_guess"))
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))

  /** Mirrors TextFunctions.langId exactly: Java `split("\\s+")` keeps
    * a leading empty token but drops trailing ones — hence the rtrim
    * over ALL six \s characters (space, tab, LF, VT, FF, CR — a doc
    * ending in '\n' would otherwise keep a trailing empty token and
    * shift every hit-rate denominator by one); profile order
    * (en,es,fr,de) is the maxBy-first tie-break, encoded as the >=
    * cascade. */
  /** The per-doc language-guess kernel as a SQL template over any
    * (doc_id, lang, text) source — yields (doc_id, lang, lang_guess).
    * Factored so composed pipelines (pipeline_warc_to_corpus) replay
    * the exact TextFunctions.langId arithmetic over derived text. */
  private[graft] def langGuessSqlFrom(src: String): String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    text IS NULL OR text = '' AS empty,
      |    regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS cjk,
      |    string_split_regex(rtrim(lower(text),
      |      concat(' ', chr(9), chr(10), chr(11), chr(12), chr(13))),
      |      '\s+') AS toks
      |  FROM %SRC%),
      |s AS (
      |  SELECT doc_id, lang, empty, cjk,
      |    CAST(len(list_filter(toks, x -> x IN ('the','of','and','to',
      |      'in','is','that','it'))) AS DOUBLE) / len(toks) AS s_en,
      |    CAST(len(list_filter(toks, x -> x IN ('el','la','de','que',
      |      'y','en','los','del'))) AS DOUBLE) / len(toks) AS s_es,
      |    CAST(len(list_filter(toks, x -> x IN ('le','la','de','et',
      |      'les','des','un','du'))) AS DOUBLE) / len(toks) AS s_fr,
      |    CAST(len(list_filter(toks, x -> x IN ('der','die','das','und',
      |      'in','den','von','zu'))) AS DOUBLE) / len(toks) AS s_de
      |  FROM t),
      |g AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN empty THEN 'und'
      |         WHEN cjk THEN 'zh'
      |         WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de
      |           THEN CASE WHEN s_en > 0.02 THEN 'en' ELSE 'und' END
      |         WHEN s_es >= s_fr AND s_es >= s_de
      |           THEN CASE WHEN s_es > 0.02 THEN 'es' ELSE 'und' END
      |         WHEN s_fr >= s_de
      |           THEN CASE WHEN s_fr > 0.02 THEN 'fr' ELSE 'und' END
      |         ELSE CASE WHEN s_de > 0.02 THEN 'de' ELSE 'und' END
      |    END AS lang_guess
      |  FROM s)
      |SELECT doc_id, lang, lang_guess FROM g""".stripMargin
      .replace("%SRC%", src)

  val textLangidSql: String =
    s"""SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n
       |FROM (${langGuessSqlFrom("documents")}) lg
       |GROUP BY 1, 2""".stripMargin

  /** text_nb_classify — a TRAINED document classifier, the
    * GPT-3/CCNet-style "train a model on labeled data, score the
    * corpus" curation stage (quality filtering trains
    * curated-vs-crawl; language filtering trains fasttext-style
    * supervised ID — here the labeled axis is `lang`). Multinomial
    * Naive Bayes with add-one smoothing: docs with doc_id % 10 < 7
    * train the model, the rest are scored and labeled.
    *
    * Scale design: training is ONE map-side-combining hash aggregate
    * over the train split's tokens — the model ((class, token)
    * counts, class totals, vocab size, priors) is vocab-bounded, not
    * corpus-bounded, and broadcasts; scoring is a per-token
    * broadcast lookup fanned out over the (small, fixed) class set
    * with one partial-aggregating groupBy per doc — no corpus-sized
    * shuffle carries text, and AQE degrades the scoring joins to
    * shuffle joins if a production vocab outgrows a broadcast
    * (text_bigram_logprob's contract). Scores are Σ ln(p) doubles
    * rounded at 6 dp: class gaps on real counts sit orders of
    * magnitude above ulp noise, the same engine-stable-rounding
    * contract text_bm25 and text_unigram_logprob already pin. The
    * argmax tie-break is (rounded score desc, lang asc) in both
    * engines. */
  def textNbClassify(s: SparkSession, dir: String): DataFrame =
    textNbClassifyFrom(documents(s, dir))

  /** Fixture seam (the <name>From pattern): planted-vocabulary and
    * tie-break specs drive THIS method with synthetic documents. */
  private[graft] def textNbClassifyFrom(d: DataFrame): DataFrame =
    nbScoreDocs(d, d.filter(pmod(col("doc_id"), lit(10)) >= 7))

  /** Train on `corpus`'s doc_id%10<7 split, score EVERY row of
    * `docs` — the seam the streaming admission sink reuses so batch
    * and stream share one scoring rule (the incrementalDedupSink
    * pattern). All model inputs are vocab-bounded aggregates of the
    * corpus; a production deployment materializes them once instead
    * of re-aggregating per call. */
  private[graft] def nbScoreDocs(
      corpus: DataFrame, docs: DataFrame): DataFrame = {
    // No fan-out here: the word explode is ~d× cheaper per char than
    // langid's bigram kernel, and the repartition shuffle measured a
    // net loss (1.10 → 2.04 s) — see [[textLangidNbFrom]] for the
    // shape where it pays.
    val corpusN = corpus.select(col("doc_id"), col("lang"), col("text"))
    val train = corpusN
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .filter(pmod(col("doc_id"), lit(10)) < 7)
    val test = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    // (doc_id, lang) of the train docs WITHOUT re-running the token
    // explode: a doc survives the exploded filters iff it has ≥1
    // non-empty token, which `exists` tests per row on the un-exploded
    // text (split(NULL) is NULL → exists NULL → dropped, matching the
    // explode's zero rows).
    val trainDocs = corpusN
      .filter(pmod(col("doc_id"), lit(10)) < 7)
      .filter(exists(split(col("text"), " "), t => length(t) > 0))
      .select(col("doc_id"), col("lang"))
    nbScoreTokens(train, test, trainDocs)
  }

  /** The feature-agnostic NB core: train on (doc_id, lang, tok) rows,
    * score (doc_id, tok) rows — shared by text_nb_classify (word
    * features) and text_langid_nb (char-bigram features), so the two
    * classifiers differ ONLY in their tokenizer. */
  /** `trainDocs` must be the (doc_id, lang) rows of exactly the docs
    * that produce ≥1 train token — the callers derive it from the
    * UN-exploded corpus, replacing the old `train.select(doc_id,
    * lang).distinct()` whose distinct re-ran the whole tokenize/
    * explode a second time (one full corpus pass per call, profiled
    * 0.7 s of text_langid_nb's 3.0 s at sf0.1). */
  private def nbScoreTokens(
      train: DataFrame, test: DataFrame, trainDocs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Materialize the MODEL once and derive every other training
    // aggregate from it: Spark has no subtree reuse, so the earlier
    // form's five independent aggregates over `train` each re-ran
    // the corpus tokenize/explode — six corpus passes per call
    // (profiled at 139 s for text_langid_nb at sf10). Now: ONE pass
    // builds the vocab-bounded (class, token) count table
    // (checkpointed — it IS the model the scaladoc says a deployment
    // materializes), tot/vsz fold over it, one more pass counts
    // train docs per class (priors, also model-sized), ntr folds
    // over the priors. Three corpus passes total incl. scoring.
    val cnt = train.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumnRenamed("lang", "clang")
      .localCheckpoint(false) // lazy: materializes (once) inside the
                              // scoring job itself — an eager form ran
                              // Spark jobs at CONSTRUCTION time, and
                              // blocks are reclaimed by ContextCleaner
                              // once the returned frame is dropped.
                              // NOTE (r14 verdict): eager release via
                              // GraftExpr.releaseLocalCheckpoint is
                              // NOT possible here — the frame is
                              // consumed lazily by the one returned
                              // plan, so release would race the
                              // consumer. A long-lived session
                              // looping NB scoring relies on driver
                              // GC → ContextCleaner for these
                              // model-sized blocks; they are vocab-
                              // bounded, so the steady-state residue
                              // is MBs, not corpus-sized.
    val tot = cnt.groupBy(col("clang"))
      .agg(sum(col("cnt")).as("tot"))
    val vsz = cnt.agg(countDistinct(col("tok")).as("v"))
    val docLang = trainDocs.select(col("doc_id"), col("lang")).distinct()
      .localCheckpoint(false)
    val prior = docLang
      .groupBy(col("lang")).agg(count(lit(1)).as("nd"))
      .withColumnRenamed("lang", "clang")
      .localCheckpoint(false)
    // ntr = count(DISTINCT doc_id) — the oracle's definition. NOT
    // Σ nd over the priors: that equals it only when every train doc
    // carries exactly one lang, and a doc_id listed under two langs
    // (dirty input) would silently shift every prior relative to the
    // oracle instead of matching it. docLang is doc-count-bounded
    // (one narrow row per (doc, lang) — never token-sized), and the
    // checkpoint means the distinct runs once for both consumers.
    val ntr = docLang.agg(countDistinct(col("doc_id")).as("ntr"))
    // Pre-aggregate the test side to (doc, token, n) BEFORE the
    // class fan-out: tokens repeat within a document (char bigrams
    // especially — 255 grams drawn from an alphabet²-bounded set),
    // so scoring Σ ln(p) as Σ n·ln(p) over distinct tokens cuts the
    // ×|classes| fan-out and the per-class map-side work by the
    // repetition factor. The oracles compute the identical n·ln(p)
    // terms, so 6-dp parity is unchanged.
    val testCnt = test.select(col("doc_id"), col("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("n"))
    val scored = testCnt
      .crossJoin(broadcast(tot))
      .join(broadcast(cnt), Seq("clang", "tok"), "left")
      .crossJoin(broadcast(vsz))
      .select(col("doc_id"), col("clang"),
        (col("n").cast("double") *
          log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
            (col("tot") + col("v")).cast("double"))).as("lp"))
      .groupBy(col("doc_id"), col("clang"))
      .agg(sum(col("lp")).as("slp"))
      .join(broadcast(prior), Seq("clang"))
      .crossJoin(broadcast(ntr))
      .select(col("doc_id"), col("clang"),
        round(col("slp") +
          log(col("nd").cast("double") / col("ntr").cast("double")), 6)
          .as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("clang"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("clang").as("pred_lang"), col("score"))
  }

  /** text_nb_classify oracle — the whole train-then-score chain in
    * SQL: same split, same add-one smoothed token table, same
    * Σ ln(p) + ln(prior) score at the same 6-dp rounding, same
    * (score desc, lang) argmax. */
  val textNbClassifySql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, t.tok
      |  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
      |  WHERE len(t.tok) > 0),
      |train AS (SELECT * FROM toks WHERE ((doc_id % 10) + 10) % 10 < 7),
      |cnt AS (SELECT lang AS clang, tok, count(*) AS cnt
      |  FROM train GROUP BY 1, 2),
      |tot AS (SELECT lang AS clang, count(*) AS tot
      |  FROM train GROUP BY 1),
      |vsz AS (SELECT count(DISTINCT tok) AS v FROM train),
      |prior AS (SELECT lang AS clang, count(DISTINCT doc_id) AS nd
      |  FROM train GROUP BY 1),
      |ntr AS (SELECT count(DISTINCT doc_id) AS ntr FROM train),
      |test AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS n
      |  FROM toks WHERE ((doc_id % 10) + 10) % 10 >= 7 GROUP BY 1, 2),
      |scored AS (
      |  SELECT doc_id, tot.clang AS clang,
      |    round(sum(test.n * ln(CAST(COALESCE(cnt.cnt, 0) + 1 AS DOUBLE) /
      |        CAST(tot.tot + vsz.v AS DOUBLE)))
      |      + ln(CAST(prior.nd AS DOUBLE) / CAST(ntr.ntr AS DOUBLE)),
      |      6) AS score
      |  FROM test CROSS JOIN tot
      |  LEFT JOIN cnt ON cnt.clang = tot.clang AND cnt.tok = test.tok
      |  CROSS JOIN vsz
      |  JOIN prior ON prior.clang = tot.clang
      |  CROSS JOIN ntr
      |  GROUP BY doc_id, tot.clang, prior.nd, ntr.ntr),
      |ranked AS (
      |  SELECT doc_id, clang, score,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, clang) AS rk
      |  FROM scored)
      |SELECT doc_id, clang AS pred_lang, score
      |FROM ranked WHERE rk = 1""".stripMargin

  /** Prefix length text_langid_nb reads per document: language is
    * stationary within a document, so a bounded prefix carries the
    * same signal at a fraction of the feature volume — the explode
    * row count is docs × (LID_PREFIX−1) regardless of document
    * length, which is what keeps the classifier linear on a corpus
    * of arbitrarily long documents. */
  private[operators] val LID_PREFIX = 256

  /** text_langid_nb — language ID through the TRAINED-classifier
    * seam (VERDICT r13 task 6): the same multinomial NB machinery as
    * text_nb_classify (same doc_id%10 split, same add-one smoothing,
    * same Σ ln(p) + ln(prior) @ 6 dp, same argmax tie-break) with
    * CHAR-BIGRAM features over a bounded 256-char prefix instead of
    * word tokens — the fasttext-style supervised langid shape, and
    * the trained replacement for text_langid's stopword/char-class
    * heuristic (which stays, as the no-labels path). The two
    * classifiers share [[nbScoreTokens]], so there is exactly one
    * scoring rule to audit.
    *
    * Scale design: identical to text_nb_classify — one map-side
    * hash-aggregate trains a vocab-bounded model (char-bigram vocab
    * is alphabet²-bounded, far smaller than a word vocab) that
    * broadcasts; scoring is per-gram broadcast lookups with one
    * partial-aggregating groupBy per doc. The prefix cap bounds the
    * gram explode at 255 rows/doc. Oracle: whole train-then-score
    * chain replayed in SQL with the identical substr addressing. */
  def textLangidNb(s: SparkSession, dir: String): DataFrame =
    textLangidNbFrom(documents(s, dir))

  /** Fixture seam: planted-alphabet specs drive THIS method. */
  private[graft] def textLangidNbFrom(d: DataFrame): DataFrame = {
    // gram generation via substr — CODE-POINT addressed on both
    // engines, so supplementary-plane text hashes identically to the
    // oracle (harness/astral_check.py gates this qid). A split("")
    // char-array form was tried and reverted: it addresses UTF-16
    // units (astral-divergent) and bought no measurable time — the
    // sf10 cost was input-split width, not substr rescans.
    val px = SkewUtils.fanOutSmallScan(d
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, LID_PREFIX).as("px"))
      .filter(length(col("px")) >= 2))
    val toks = px
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, length(px) - 1), i -> substr(px, i, 2))"))
        .as("tok"))
    nbScoreTokens(
      toks.filter(pmod(col("doc_id"), lit(10)) < 7),
      toks.filter(pmod(col("doc_id"), lit(10)) >= 7)
        .select(col("doc_id"), col("tok")),
      // px length ≥ 2 guarantees ≥ 1 bigram, so the train docs are
      // exactly the %10<7 slice of the prefix frame — no re-explode.
      px.filter(pmod(col("doc_id"), lit(10)) < 7)
        .select(col("doc_id"), col("lang")))
  }

  /** text_langid_nb oracle — textNbClassifySql's chain verbatim with
    * the char-bigram tokenizer swapped in (same sign-safe split). */
  val textLangidNbSql: String =
    s"""WITH px AS (
       |  SELECT doc_id, lang, substr(text, 1, $LID_PREFIX) AS px
       |  FROM documents WHERE len(substr(text, 1, $LID_PREFIX)) >= 2),
       |toks AS (
       |  SELECT doc_id, lang, substr(px, g.i, 2) AS tok
       |  FROM px, unnest(generate_series(1, len(px) - 1)) AS g(i)),
       |train AS (SELECT * FROM toks
       |  WHERE ((doc_id % 10) + 10) % 10 < 7),
       |cnt AS (SELECT lang AS clang, tok, count(*) AS cnt
       |  FROM train GROUP BY 1, 2),
       |tot AS (SELECT lang AS clang, count(*) AS tot
       |  FROM train GROUP BY 1),
       |vsz AS (SELECT count(DISTINCT tok) AS v FROM train),
       |prior AS (SELECT lang AS clang, count(DISTINCT doc_id) AS nd
       |  FROM train GROUP BY 1),
       |ntr AS (SELECT count(DISTINCT doc_id) AS ntr FROM train),
       |test AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS n
       |  FROM toks WHERE ((doc_id % 10) + 10) % 10 >= 7 GROUP BY 1, 2),
       |scored AS (
       |  SELECT doc_id, tot.clang AS clang,
       |    round(sum(test.n * ln(CAST(COALESCE(cnt.cnt, 0) + 1 AS DOUBLE) /
       |        CAST(tot.tot + vsz.v AS DOUBLE)))
       |      + ln(CAST(prior.nd AS DOUBLE) / CAST(ntr.ntr AS DOUBLE)),
       |      6) AS score
       |  FROM test CROSS JOIN tot
       |  LEFT JOIN cnt ON cnt.clang = tot.clang AND cnt.tok = test.tok
       |  CROSS JOIN vsz
       |  JOIN prior ON prior.clang = tot.clang
       |  CROSS JOIN ntr
       |  GROUP BY doc_id, tot.clang, prior.nd, ntr.ntr),
       |ranked AS (
       |  SELECT doc_id, clang, score,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, clang) AS rk
       |  FROM scored)
       |SELECT doc_id, clang AS pred_lang, score
       |FROM ranked WHERE rk = 1""".stripMargin

  /** text_nb_top_features — the classifier AUDIT table: for each
    * class, the 5 tokens with the highest smoothed log-odds
    * ln(p(tok|c)) − ln(p(tok|¬c)) over text_nb_classify's train
    * split — "what did the model learn", the review artifact a
    * production filtering stage publishes next to its scores (and
    * the fasttext-style feature report). Same add-one smoothing and
    * token model as the classifier, so the audit is consistent with
    * the scoring path by construction.
    *
    * Scale design: one map-side-combining token aggregate produces
    * the (class, token) count table and everything downstream is
    * MODEL-sized (vocab × classes), never corpus-sized; the final
    * per-class top-5 runs through the TopKPerGroup heap operator —
    * O(classes × 5) state per task, at most 5 rows per (class,
    * partition) through the exchange — instead of a full per-class
    * vocabulary sort. Log-odds are rounded at 6 dp before ranking
    * (the engine-stable-rounding contract) and the (score desc, tok
    * asc) order is total, so the boundary is deterministic. */
  def textNbTopFeatures(s: SparkSession, dir: String): DataFrame =
    textNbTopFeaturesFrom(documents(s, dir))

  private[graft] def textNbTopFeaturesFrom(d: DataFrame): DataFrame = {
    graft.GraftExtensions.register(d.sparkSession)
    val toks = d
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val train = toks.filter(pmod(col("doc_id"), lit(10)) < 7)
    val cnt = train.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val tokTot = cnt.groupBy(col("tok")).agg(sum(col("cnt")).as("ttot"))
    val tot = train.groupBy(col("lang")).agg(count(lit(1)).as("tot"))
    val gv = train.agg(count(lit(1)).as("g"),
      countDistinct(col("tok")).as("v"))
    val scored = cnt
      .join(tokTot, Seq("tok"))
      .join(broadcast(tot), Seq("lang"))
      .crossJoin(broadcast(gv))
      .select(col("lang"), col("tok"),
        round(
          log((col("cnt") + lit(1L)).cast("double") /
            (col("tot") + col("v")).cast("double")) -
            log((col("ttot") - col("cnt") + lit(1L)).cast("double") /
              (col("g") - col("tot") + col("v")).cast("double")), 6)
          .as("log_odds"))
    graft.plans.TopKPerGroup.topKPerGroup(scored,
      keys = Seq("lang"),
      orderBy = Seq(("log_odds", false), ("tok", true)), k = 5)
  }

  /** text_nb_top_features oracle — same counts, same smoothing, same
    * 6-dp rounding, same (log_odds desc, tok) top-5. */
  val textNbTopFeaturesSql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, t.tok
      |  FROM documents, unnest(string_split(text, ' ')) AS t(tok)
      |  WHERE len(t.tok) > 0),
      |train AS (SELECT * FROM toks WHERE ((doc_id % 10) + 10) % 10 < 7),
      |cnt AS (SELECT lang, tok, count(*) AS cnt
      |  FROM train GROUP BY 1, 2),
      |ttot AS (SELECT tok, sum(cnt) AS ttot FROM cnt GROUP BY 1),
      |tot AS (SELECT lang, count(*) AS tot FROM train GROUP BY 1),
      |gv AS (SELECT count(*) AS g, count(DISTINCT tok) AS v FROM train),
      |scored AS (
      |  SELECT cnt.lang, cnt.tok,
      |    round(ln(CAST(cnt.cnt + 1 AS DOUBLE)
      |        / CAST(tot.tot + gv.v AS DOUBLE))
      |      - ln(CAST(ttot.ttot - cnt.cnt + 1 AS DOUBLE)
      |        / CAST(gv.g - tot.tot + gv.v AS DOUBLE)), 6) AS log_odds
      |  FROM cnt JOIN ttot USING (tok) JOIN tot USING (lang)
      |  CROSS JOIN gv),
      |r AS (SELECT lang, tok, log_odds,
      |  row_number() OVER (PARTITION BY lang
      |    ORDER BY log_odds DESC, tok) AS rk
      |  FROM scored)
      |SELECT lang, tok, log_odds FROM r WHERE rk <= 5""".stripMargin

  /** text_containment — contamination/containment detection: doc
    * pairs sharing a large fraction of winnowing fingerprints (the
    * train/eval-set contamination check of an LLM pipeline).
    *
    * ONE linear pipeline over a single corpus scan — no self-joins.
    * (The earlier join-on-gram form referenced the exploded-gram
    * frame four times; each reference re-ran the winnow UDF and its
    * shuffle, 10 exchanges in the executed plan.) Winnow fingerprints
    * are distinct per doc, so after collecting each rare gram's doc
    * list, the a≤b double-explode counts BOTH structures at once:
    * off-diagonal (a,b) rows count shared grams, and diagonal (a,a)
    * rows count each doc's rare-gram total — sizes then come from two
    * windows over the already-reduced pair frame instead of joining
    * the corpus-sized gram stream against per-doc counts.
    *
    * SCALE GUARD: a gram occurring in k docs contributes k² pair
    * rows. Grams shared corpus-wide are non-discriminative for
    * containment (boilerplate/common phrases) — the standard
    * stop-gram filter caps every bucket at maxDf BEFORE the doc list
    * is collected, bounding both the collect_list buffers and the
    * explode fan-out at |grams|×maxDf². Oracle: the full winnow
    * recompute ([[winnowFpCte]]) extended relationally — df cap,
    * a≤b pair counting, containment threshold — so the whole
    * contamination verdict is hash-gated; overlap behavior
    * additionally unit-tested. */
  def textContainment(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxDf = 20 // stop-gram cap: buckets bigger than this are noise
    // (A winnow fan-out + pinned gram exchange was tried and
    // reverted: the high-cardinality gram shuffle cost more than the
    // serialized window it parallelized — 1.9 → 2.5 s at sf0.1.)
    val pairs = documents(s, dir)
      .select(col("doc_id"),
        explode(TextFunctions.winnow()(col("text"))).as("gram"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .filter(col("df") <= maxDf)
      // already gram-partitioned by the window: no new exchange here
      .groupBy(col("gram")).agg(collect_list(col("doc_id")).as("docs"))
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a") <= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
    pairs
      .withColumn("na",
        max(when(col("b") === col("a"), col("shared")))
          .over(Window.partitionBy(col("a"))))
      .withColumn("nb",
        max(when(col("a") === col("b"), col("shared")))
          .over(Window.partitionBy(col("b"))))
      .filter(col("a") < col("b"))
      .withColumn("containment",
        round(col("shared") / least(col("na"), col("nb")), 4))
      .filter(col("containment") >= 0.5)
      .select(col("a"), col("b"), col("shared"), col("containment"))
  }

  val textContainmentSql: String =
    s"""WITH $winnowFpCte,
       |grams AS (SELECT doc_id, unnest(f) AS gram FROM fp),
       |keep AS (SELECT gram FROM grams GROUP BY gram
       |         HAVING count(*) <= 20),
       |g2 AS (SELECT doc_id, gram FROM grams
       |       WHERE gram IN (SELECT gram FROM keep)),
       |pairs AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS shared
       |  FROM g2 x JOIN g2 y USING (gram) WHERE x.doc_id <= y.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, count(*) AS n FROM g2 GROUP BY 1)
       |SELECT a, b, shared,
       |  round(shared / least(na.n, nb.n), 4) AS containment
       |FROM pairs JOIN sizes na ON na.doc_id = pairs.a
       |JOIN sizes nb ON nb.doc_id = pairs.b
       |WHERE a < b AND round(shared / least(na.n, nb.n), 4) >= 0.5"""
      .stripMargin

  /** The winnow kernel recomputed in DuckDB — EXACTLY, including
    * Java's 64-bit wraparound polynomial hash: the k-gram arithmetic
    * runs in HUGEINT (wrapping once at the end ≡ wrapping every
    * step — both are the same ring homomorphism mod 2^64) and casts
    * back to signed BIGINT, so even the hash VALUES are independently
    * re-derived, not trusted. Constants mirror TextFunctions.winnow's
    * defaults (k = 8, w = 4, seed = 1125899906842597, base 31); the
    * engine folds CODE POINTS (TextFunctions.winnow), so DuckDB's
    * codepoint-addressed substr agrees for ALL of Unicode. */
  private def winnowFpCte: String = {
    val poly = (0 until 8).map { j =>
      if (j < 7)
        s"unicode(substr(text, i+$j, 1))::HUGEINT * " +
          s"${BigInt(31).pow(7 - j)}::HUGEINT"
      else "unicode(substr(text, i+7, 1))::HUGEINT"
    }.mkString("\n      + ")
    val wrapped =
      s"""CAST(((1125899906842597::HUGEINT * 852891037441::HUGEINT
         |      + $poly)
         |    % 18446744073709551616::HUGEINT
         |    + 9223372036854775808::HUGEINT)
         |  % 18446744073709551616::HUGEINT
         |  - 9223372036854775808::HUGEINT AS BIGINT)""".stripMargin
    s"""h AS (
       |  SELECT doc_id,
       |    CASE WHEN text IS NULL OR length(text) < 8
       |      THEN CAST([] AS BIGINT[])
       |    ELSE list_transform(range(1, length(text) - 6), i ->
       |      $wrapped) END AS hashes
       |  FROM documents),
       |w AS (
       |  SELECT doc_id,
       |    CASE WHEN len(hashes) < 4 THEN CAST([] AS BIGINT[])
       |    ELSE list_transform(range(1, len(hashes) - 2), i ->
       |      least(hashes[i], hashes[i+1], hashes[i+2], hashes[i+3]))
       |    END AS mins
       |  FROM h),
       |fp AS (SELECT doc_id, list_sort(list_distinct(mins)) AS f FROM w)"""
      .stripMargin
  }

  val textFingerprintSql: String =
    s"""WITH $winnowFpCte
       |SELECT doc_id, CAST(len(f) AS INT) AS n_grams,
       |  '[' || array_to_string(f, ',') || ']' AS fingerprint_json
       |FROM fp""".stripMargin

  /** text_fingerprint — winnowing fingerprints (rolling-hash k-grams,
    * min-per-window): compact doc signatures for containment checks.
    * Hash-valued, but the hash is plain Java arithmetic DuckDB can
    * reproduce in HUGEINT ⇒ full recompute oracle (see
    * [[winnowFpCte]]); determinism + self-similarity unit-tested. */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"),
        TextFunctions.winnow()(col("text")).as("fingerprint"))
      .select(col("doc_id"), size(col("fingerprint")).as("n_grams"),
        // JSON, not raw ARRAY: the driver's row-sorter cannot hash
        // container columns (round-1 finding).
        to_json(col("fingerprint")).as("fingerprint_json"))

  /** text_pii_scrub — PII masking over documents: emails and
    * phone-number shapes replaced with type tags, the redaction pass
    * every training-data pipeline runs before tokenization. Pure
    * regexp_replace (codegen'd, narrow, pushdown-friendly — no
    * shuffle at any scale); regexes kept in the RE2 ∩ java.util.regex
    * common subset so the DuckDB oracle reproduces the exact bytes.
    * Synthetic PII is appended per row (the corpus itself is clean)
    * so the mask path is actually exercised. */
  def textPiiScrub(s: SparkSession, dir: String): DataFrame = {
    val withPii = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1 555 010 "),
      col("doc_id"), lit(" now"))
    documents(s, dir)
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(withPii,
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "\\+?[0-9][0-9 -]{7,}[0-9]", "<PHONE>").as("scrubbed"))
      .withColumn("masked",
        (col("scrubbed").contains("<EMAIL>") &&
          col("scrubbed").contains("<PHONE>")))
  }

  val textPiiScrubSql: String =
    """WITH s AS (
      |  SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(
      |        text || ' contact user' || doc_id ||
      |          '@example.com or +1 555 010 ' || doc_id || ' now',
      |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
      |        'g'),
      |      '\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
      |  FROM documents)
      |SELECT doc_id, scrubbed,
      |  (contains(scrubbed, '<EMAIL>') AND contains(scrubbed, '<PHONE>'))
      |    AS masked
      |FROM s""".stripMargin

  /** text_quality_filter — global-quantile curation: keep only docs
    * at or above the corpus P20 of the text_quality composite. The
    * threshold is ONE aggregated scalar broadcast into the filter —
    * never a global sort or window over the corpus. Exact
    * interpolated percentile here so the DuckDB `quantile_cont`
    * oracle hash-matches; at 100 TB swap the agg for
    * `approx_percentile` (mergeable sketch, same broadcast-filter
    * plan shape — the approx twin is unit-tested for agreement). */
  def textQualityFilter(s: SparkSession, dir: String): DataFrame = {
    val scored = textQuality(s, dir).select(col("doc_id"), col("quality"))
    val thr = scored.agg(
      round(expr("percentile(quality, 0.2)") + lit(1e-9), 6).as("thr"))
    scored.join(broadcast(thr))
      .filter(col("quality") >= col("thr"))
      .select(col("doc_id"), col("quality"), col("thr"))
  }

  /** Same filter with the mergeable-sketch threshold (the 100 TB
    * path); exposed for the agreement unit test. */
  private[graft] def textQualityFilterApprox(
      s: SparkSession, dir: String): DataFrame = {
    val scored = textQuality(s, dir).select(col("doc_id"), col("quality"))
    val thr = scored.agg(
      expr("approx_percentile(quality, 0.2, 10000)").as("thr"))
    scored.join(broadcast(thr))
      .filter(col("quality") >= col("thr"))
      .select(col("doc_id"), col("quality"), col("thr"))
  }

  val textQualityFilterSql: String =
    s"""WITH q AS (SELECT doc_id, quality FROM ($textQualitySql) x),
       |thr AS (SELECT round(quantile_cont(quality, 0.2) + 1e-9, 6) AS thr
       |        FROM q)
       |SELECT q.doc_id, q.quality, thr.thr
       |FROM q, thr WHERE q.quality >= thr.thr""".stripMargin

  /** text_token_count — the three token counts a data pipeline
    * budgets with: whitespace tokens, alphanumeric-run tokens (the
    * regex tokenization BPE vocabularies are trained over), and the
    * chars/4 BPE estimate (the standard LLM budgeting heuristic).
    * Pure row-local expressions — narrow, codegen'd, pushdown-safe. */
  def textTokenCount(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(filter(split(col("text"), "[^A-Za-z0-9]+"),
        t => length(t) > 0)).cast("long").as("alnum_tokens"),
      ceil(col("n_chars") / 4.0).cast("long").as("bpe_est"))

  val textTokenCountSql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'),
      |    w -> len(w) > 0)) AS alnum_tokens,
      |  CAST(ceil(n_chars / 4.0) AS BIGINT) AS bpe_est
      |FROM documents""".stripMargin

  /** text_repetition — Gopher-style repetition signals per document
    * (the "repetitious text" quality rules LLM corpus builds filter
    * on): the character fraction covered by the MOST FREQUENT word
    * 2-gram and 3-gram, and the character fraction covered by
    * DUPLICATED (count > 1) 5-grams. A page of boilerplate scores
    * high on all three; natural prose scores low.
    *
    * Scale design: every signal is PER-DOCUMENT, so nothing needs to
    * leave the row — one kernel pass computes all three in a single
    * projection (TextFunctions.repetitionSignals), zero shuffle.
    * (The first cut exploded the corpus three times and hash-
    * aggregated on (doc_id, gram) — 3 corpus-wide shuffles plus two
    * doc_id joins for values that never cross documents; measured
    * ~4× slower at sf0.1 and strictly worse at 100 TB.) Argmax ties
    * break on (count DESC, gram DESC), matching the oracle. */
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"),
        graft.functions.TextFunctions
          .repetitionSignals(col("text"), col("n_chars")).as("r"))
      .select(col("doc_id"), col("r._1").as("top2_frac"),
        col("r._2").as("top3_frac"), col("r._3").as("dup5_frac"))

  val textRepetitionSql: String =
    """WITH t AS (
      |  SELECT doc_id, n_chars, text, string_split(text, ' ') AS ws
      |  FROM documents),
      |g2 AS (SELECT doc_id, n_chars, unnest(
      |    CASE WHEN len(ws) < 2 THEN [text]
      |    ELSE list_transform(generate_series(1, len(ws) - 1),
      |      i -> array_to_string(ws[i:i+1], ' ')) END) AS g FROM t),
      |g3 AS (SELECT doc_id, n_chars, unnest(
      |    CASE WHEN len(ws) < 3 THEN [text]
      |    ELSE list_transform(generate_series(1, len(ws) - 2),
      |      i -> array_to_string(ws[i:i+2], ' ')) END) AS g FROM t),
      |g5 AS (SELECT doc_id, n_chars, unnest(
      |    CASE WHEN len(ws) < 5 THEN [text]
      |    ELSE list_transform(generate_series(1, len(ws) - 4),
      |      i -> array_to_string(ws[i:i+4], ' ')) END) AS g FROM t),
      |c2 AS (SELECT doc_id, n_chars, g, count(*) AS c FROM g2
      |       GROUP BY doc_id, n_chars, g),
      |c3 AS (SELECT doc_id, n_chars, g, count(*) AS c FROM g3
      |       GROUP BY doc_id, n_chars, g),
      |c5 AS (SELECT doc_id, n_chars, g, count(*) AS c FROM g5
      |       GROUP BY doc_id, n_chars, g),
      |r2 AS (SELECT doc_id,
      |    round(CAST(c * len(g) AS DOUBLE) / greatest(n_chars, 1) + 1e-9,
      |      4) AS top2_frac,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY c DESC, g DESC) AS rn FROM c2),
      |r3 AS (SELECT doc_id,
      |    round(CAST(c * len(g) AS DOUBLE) / greatest(n_chars, 1) + 1e-9,
      |      4) AS top3_frac,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY c DESC, g DESC) AS rn FROM c3),
      |d5 AS (SELECT doc_id,
      |    round(CAST(sum(c * len(g)) AS DOUBLE)
      |      / greatest(any_value(n_chars), 1) + 1e-9, 4) AS dup5_frac
      |  FROM c5 WHERE c > 1 GROUP BY doc_id)
      |SELECT r2.doc_id AS doc_id, r2.top2_frac, r3.top3_frac,
      |  coalesce(d5.dup5_frac, 0.0) AS dup5_frac
      |FROM r2
      |JOIN r3 ON r2.doc_id = r3.doc_id AND r3.rn = 1
      |LEFT JOIN d5 ON r2.doc_id = d5.doc_id
      |WHERE r2.rn = 1""".stripMargin

  /** text_gopher_rules — the published Gopher (Rae et al. 2021,
    * A1.1) document-quality RULE CARD, minus the repetition family
    * (that's [[textRepetition]]): per doc the raw signals (word
    * count, mean word length, alphabetic-word fraction, stopword
    * hits, the hash and ellipsis symbol-to-word ratios — tested
    * SEPARATELY, as the published rule reads — and the bullet-line
    * and ellipsis-line fractions) with each published threshold as
    * an explicit boolean (spelled once; keep derives from the flags)
    * and the conjunctive keep verdict. The card shape — signals AND
    * verdicts in one row — is what a curation pipeline audits and
    * re-thresholds without recomputing the corpus pass.
    *
    * Scale design: pure row-local expressions (splits, filters,
    * folds over the word list) — zero shuffle, codegen'd end to end,
    * embarrassingly parallel at any corpus size. Every verdict
    * compares UNROUNDED doubles whose arithmetic (exact integer
    * counts cast to double, one division) is bit-identical in the
    * oracle, so a threshold can never land between engines. */
  private val GOPHER_STOPS =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def textGopherRules(s: SparkSession, dir: String): DataFrame =
    gopherRulesFrom(documents(s, dir))

  /** `carry` threads extra columns of `docs` through to the card
    * output unchanged — lets composed pipelines (warc→corpus) keep a
    * lang_guess computed in the SAME pass instead of re-scanning and
    * joining. */
  private[graft] def gopherRulesFrom(
      docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val stopLit = typedLit(GOPHER_STOPS)
    val d = docs
      .select(Seq(col("doc_id"), col("text"),
        split(col("text"), " ").as("ws"),
        split(col("text"), "\n").as("ls")) ++ carry.map(col): _*)
    val nw = size(col("ws")).cast("double")
    val mwl = aggregate(transform(col("ws"), w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("double") / nw
    val alphaFrac =
      size(filter(col("ws"), w => w.rlike("[A-Za-z]"))).cast("double") / nw
    // DELIBERATE interpretation (r15 advisor note): stop_hits counts
    // total OCCURRENCES, not distinct stop words — so "the ... the"
    // passes. Gopher A1.1's "contain at least two of the following"
    // is ambiguous between the readings; the occurrences reading is
    // kept because the synthetic fixture's vocabulary contains only
    // ONE listed stop word ("the"), so the distinct reading turns
    // keep constant-false at the gate (a vacuous verdict column —
    // measured: 0/500 docs at sf0.01). Real English pages with ≥2
    // stop-word occurrences essentially always have ≥2 distinct, so
    // the readings coincide on the card's target population.
    val stopHits =
      size(filter(col("ws"), w => array_contains(stopLit, w))).cast("long")
    // Gopher tests the hash and ellipsis symbol-to-word ratios
    // SEPARATELY ("for either the hash symbol or the ellipsis") —
    // summing them would fail a doc that passes both published rules
    val hashRatio =
      (length(col("text")) - length(regexp_replace(col("text"),
        lit("#"), lit("")))).cast("double") / nw
    val ellipsisRatio =
      (length(col("text")) - length(regexp_replace(col("text"),
        lit("\\.\\.\\."), lit("")))).cast("double") / lit(3.0) / nw
    val nl = size(col("ls")).cast("double")
    val bulletFrac = size(filter(col("ls"),
      l => l.startsWith("- ") || l.startsWith("* ") ||
        l.startsWith("•"))).cast("double") / nl
    val ellipsisLineFrac = size(filter(col("ls"),
      l => l.endsWith("...") || l.endsWith("…"))).cast("double") / nl
    // each threshold is spelled exactly ONCE (the flag column); keep
    // derives from the flags so an edited rule can never desync the
    // verdict from its card
    d.select(Seq(col("doc_id"), nw.cast("long").as("n_words"),
        mwl.as("mwl"),
        alphaFrac.as("af"), stopHits.as("stop_hits"),
        hashRatio.as("hr"), ellipsisRatio.as("er"),
        bulletFrac.as("bf"), ellipsisLineFrac.as("ef")) ++
        carry.map(col): _*)
      .select(Seq(
        col("doc_id"), col("n_words"),
        round(col("mwl") + lit(1e-9), 4).as("mean_word_len"),
        round(col("af") + lit(1e-9), 4).as("alpha_frac"),
        col("stop_hits"),
        round(col("hr") + lit(1e-9), 4).as("hash_ratio"),
        round(col("er") + lit(1e-9), 4).as("ellipsis_ratio"),
        round(col("bf") + lit(1e-9), 4).as("bullet_frac"),
        round(col("ef") + lit(1e-9), 4).as("ellipsis_line_frac"),
        (col("n_words") >= 50 && col("n_words") <= 100000).as("r_words"),
        (col("mwl") >= 3.0 && col("mwl") <= 10.0).as("r_mean_len"),
        (col("af") >= 0.8).as("r_alpha"),
        (col("stop_hits") >= 2).as("r_stop"),
        (col("hr") <= 0.1).as("r_hash"),
        (col("er") <= 0.1).as("r_ellipsis_sym"),
        (col("bf") <= 0.9).as("r_bullet"),
        (col("ef") <= 0.3).as("r_ellipsis_line")) ++
        carry.map(col): _*)
      .withColumn("keep",
        col("r_words") && col("r_mean_len") && col("r_alpha") &&
          col("r_stop") && col("r_hash") && col("r_ellipsis_sym") &&
          col("r_bullet") && col("r_ellipsis_line"))
  }

  /** The Gopher card as a SQL template over any (doc_id, text) source
    * — `src` is a table name or parenthesized subquery. Factored so
    * composed pipelines (pipeline_warc_to_corpus) replay the EXACT
    * same rule arithmetic over derived text instead of duplicating
    * the kernel. */
  private[graft] def gopherRulesSqlFrom(src: String): String =
    """WITH t AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS ws,
      |    string_split(text, chr(10)) AS ls
      |  FROM %SRC%),
      |s AS (
      |  SELECT doc_id,
      |    len(ws) AS n_words,
      |    CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE)
      |      / len(ws) AS mwl,
      |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
      |      AS DOUBLE) / len(ws) AS af,
      |    len(list_filter(ws, w -> w IN
      |      ('the','be','to','of','and','that','have','with'))) AS stop_hits,
      |    CAST(len(text) - len(replace(text, '#', '')) AS DOUBLE)
      |      / len(ws) AS hr,
      |    CAST(len(text) - len(replace(text, '...', '')) AS DOUBLE)
      |      / 3.0 / len(ws) AS er,
      |    CAST(len(list_filter(ls, l -> starts_with(l, '- ')
      |      OR starts_with(l, '* ') OR starts_with(l, chr(8226))))
      |      AS DOUBLE) / len(ls) AS bf,
      |    CAST(len(list_filter(ls, l -> ends_with(l, '...')
      |      OR ends_with(l, chr(8230)))) AS DOUBLE) / len(ls) AS ef
      |  FROM t),
      |flags AS (
      |  SELECT doc_id, n_words,
      |    round(mwl + 1e-9, 4) AS mean_word_len,
      |    round(af + 1e-9, 4) AS alpha_frac,
      |    stop_hits,
      |    round(hr + 1e-9, 4) AS hash_ratio,
      |    round(er + 1e-9, 4) AS ellipsis_ratio,
      |    round(bf + 1e-9, 4) AS bullet_frac,
      |    round(ef + 1e-9, 4) AS ellipsis_line_frac,
      |    n_words BETWEEN 50 AND 100000 AS r_words,
      |    mwl >= 3.0 AND mwl <= 10.0 AS r_mean_len,
      |    af >= 0.8 AS r_alpha,
      |    stop_hits >= 2 AS r_stop,
      |    hr <= 0.1 AS r_hash,
      |    er <= 0.1 AS r_ellipsis_sym,
      |    bf <= 0.9 AS r_bullet,
      |    ef <= 0.3 AS r_ellipsis_line
      |  FROM s)
      |SELECT *, r_words AND r_mean_len AND r_alpha AND r_stop
      |  AND r_hash AND r_ellipsis_sym AND r_bullet AND r_ellipsis_line
      |  AS keep
      |FROM flags""".stripMargin.replace("%SRC%", src)

  val textGopherRulesSql: String = gopherRulesSqlFrom("documents")

  /** text_chunk — fixed-size training chunks with overlap: every doc
    * split into CHUNK_W-word windows advancing by CHUNK_STRIDE (the
    * pre-tokenization step of an LLM training pipeline; the overlap
    * preserves cross-boundary context). Pure per-row explode — zero
    * shuffle, embarrassingly parallel; chunk count per doc is
    * ⌈(n−W)/S⌉+1 so output volume is ~n/S × corpus, controlled by the
    * stride. Short docs yield exactly one (possibly short) chunk. */
  private val CHUNK_W = 64
  private val CHUNK_STRIDE = 48

  def textChunk(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"), explode(sequence(lit(0),
        greatest(ceil((size(col("ws")) - lit(CHUNK_W))
          .cast("double") / CHUNK_STRIDE).cast("int"), lit(0))))
        .as("ci"))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_id"),
        array_join(slice(col("ws"), col("ci") * CHUNK_STRIDE + 1, lit(CHUNK_W)),
          " ").as("chunk"),
        size(slice(col("ws"), col("ci") * CHUNK_STRIDE + 1, lit(CHUNK_W)))
          .cast("long").as("n_tokens"))

  val textChunkSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |c AS (SELECT doc_id, ws, unnest(generate_series(0,
       |    greatest(CAST(ceil((len(ws) - $CHUNK_W.0) / $CHUNK_STRIDE)
       |      AS INT), 0))) AS ci FROM t)
       |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
       |  array_to_string(ws[ci*$CHUNK_STRIDE+1 :
       |    ci*$CHUNK_STRIDE+$CHUNK_W], ' ') AS chunk,
       |  CAST(len(ws[ci*$CHUNK_STRIDE+1 : ci*$CHUNK_STRIDE+$CHUNK_W])
       |    AS BIGINT) AS n_tokens
       |FROM c""".stripMargin

  /** text_unigram_logprob — cheap corpus-LM quality signal (the
    * CCNet-style "does this look like the corpus" filter): each doc
    * scored by its tokens' average unigram log-probability under the
    * corpus itself. Low scores flag gibberish / OOV-heavy / off-
    * distribution docs.
    *
    * Scale shape: one explode → hash agg builds the vocab, the corpus
    * total reduces to ONE row (that 1-row frame IS safely broadcast),
    * and scoring joins tokens to vocab on the word key. The vocab join
    * is deliberately UNHINTED: distinct whitespace tokens on raw web
    * text reach billions, so an explicit broadcast() — which AQE never
    * demotes — would OOM the driver at 100 TB. Unhinted, AQE picks a
    * broadcast when the vocab measures small and a shuffled hash join
    * when it doesn't. */
  def textUnigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val toks = documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val total = vocab.agg(sum(col("n_w")).as("n_total"))
    toks.join(vocab, Seq("w"))
      .join(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("n_w") / col("n_total"))) + lit(1e-9), 4)
          .as("avg_logprob"),
        count(lit(1)).as("n_tokens"))
  }

  val textUnigramLogprobSql: String =
    """WITH toks AS (
      |  SELECT doc_id, t.w
      |  FROM documents, unnest(string_split(text, ' ')) AS t(w)
      |  WHERE len(t.w) > 0),
      |vocab AS (SELECT w, count(*) AS n_w FROM toks GROUP BY w),
      |tot AS (SELECT sum(n_w) AS n_total FROM vocab)
      |SELECT doc_id,
      |  round(avg(ln(CAST(n_w AS DOUBLE) / n_total)) + 1e-9, 4)
      |    AS avg_logprob,
      |  count(*) AS n_tokens
      |FROM toks JOIN vocab USING (w) CROSS JOIN tot
      |GROUP BY doc_id""".stripMargin

  /** text_quality_decile — per-language quality deciles via ntile
    * (the "train on the top-N deciles, downsample the rest" curation
    * primitive; mixture building selects by decile). One window per
    * language partition with a total order (quality, doc_id) so both
    * engines agree on every boundary row. */
  def textQualityDecile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
    documents(s, dir)
      .select(col("doc_id"), col("lang"),
        QualityScore.quality.as("quality"))
      .withColumn("decile", ntile(10).over(w))
      .select(col("doc_id"), col("lang"), col("quality"),
        col("decile").cast("long").as("decile"))
  }

  val textQualityDecileSql: String =
    s"""WITH q AS (
      |  SELECT doc_id, lang,
      |    ${QualityScore.QUALITY_SQL} AS quality
      |  FROM documents)
      |SELECT doc_id, lang, quality,
      |  CAST(ntile(10) OVER (PARTITION BY lang
      |    ORDER BY quality DESC, doc_id) AS BIGINT) AS decile
      |FROM q""".stripMargin

  /** text_pack_sequences — training-sequence packing (concat-and-cut):
    * each (lang, shard) token stream is laid out in a deterministic
    * hash order and cut every PACK_BUDGET tokens, assigning every doc
    * the sequence it STARTS in and its offset there — the GPT-style
    * "concatenate documents, split into fixed context windows" packing
    * step that precedes tokenized-shard writing.
    *
    * Scale shape: packing is inherently sequential WITHIN a stream, so
    * the stream is (lang, shard-of-8) — independent bounded streams
    * that pack in parallel, exactly how production packers shard. One
    * window shuffle on (lang, shard); the running sum is O(1) state
    * per partition. The hash order makes the layout reproducible
    * across runs/engines (same reason the samplers hash instead of
    * rand()). */
  private[graft] val PACK_BUDGET = 512L
  private[graft] val PACK_SHARDS = 8L

  /** The packer's stream-layout hash (full 24-bit value, NOT the
    * %1000 sampling bucket) — ONE definition shared with the
    * streaming packer so the two layouts cannot drift. */
  private[graft] def packBucket(key: Column): Column =
    conv(substring(sha2(key.cast("string"), 256), 1, 6), 16, 10)
      .cast("bigint")

  def textPackSequences(s: SparkSession, dir: String): DataFrame = {
    val bucket = packBucket(col("doc_id"))
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("bucket"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        bucket.as("bucket"))
      .withColumn("shard", col("bucket") % PACK_SHARDS)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $PACK_BUDGET").as("seq_id"),
        expr(s"(cum - n_tokens) % $PACK_BUDGET").as("seq_offset"))
  }

  val textPackSequencesSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 6)
       |      AS BIGINT) AS bucket
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, bucket % $PACK_SHARDS AS shard, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY lang, bucket % $PACK_SHARDS
       |      ORDER BY bucket, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t)
       |SELECT doc_id, lang, shard, n_tokens,
       |  CAST((cum - n_tokens) // $PACK_BUDGET AS BIGINT) AS seq_id,
       |  CAST((cum - n_tokens) % $PACK_BUDGET AS BIGINT) AS seq_offset
       |FROM c""".stripMargin
  // CAST .. AS BIGINT above: cum is a DuckDB sum(BIGINT) → HUGEINT,
  // which propagates into seq_id/seq_offset and hashes differently
  // from Spark's int64 in the driver.

  /** text_html_strip — web-corpus boilerplate removal: script/style
    * blocks and comments dropped, tags stripped, the common HTML
    * entities decoded, whitespace collapsed — the first cleanup pass
    * over crawled pages before any quality scoring. Pure
    * regexp_replace/replace chain: narrow, codegen'd, zero shuffle at
    * any scale. The corpus text is plain, so an HTML wrapper is
    * synthesized per row (same pattern as text_pii_scrub) to actually
    * exercise every strip rule; regexes stay in the RE2 ∩
    * java.util.regex subset ([\\s\\S] instead of DOTALL) so the
    * DuckDB oracle reproduces the exact bytes. */
  /** The synthetic HTML wrapper shared by text_html_strip and the
    * WARC fixture (WarcQueries): exercises every strip rule, and its
    * strip collapses to `Doc <id> <text> & more <escaped> "text"
    * here` — an expression DuckDB rebuilds by plain concat, which is
    * what lets pipeline_warc_to_corpus hash-gate the whole
    * parse→strip→langid→gopher chain. */
  private[graft] def htmlWrap(docId: Column, text: Column): Column =
    concat(
      lit("<html><head><script type=\"text/javascript\">var x = 1;</script>" +
        "<style>p { color: red }</style></head><body><h1>Doc "),
      docId,
      lit("</h1><!-- boilerplate -->"), linkBlockCol(docId), lit("<p>"), text,
      lit(" &amp; more &lt;escaped&gt; &quot;text&quot;&nbsp;here</p>" +
        "</body></html>"))

  // ── the fixture page's out-link block (round 17: the crawl→graph
  // loop). Page N carries a canonical link naming its TRUE domain
  // (PipelineQueries.URL_DOMAINS[N % 10] — the same per-doc mapping
  // curation_url_filter normalizes to) plus three anchor-text-free
  // out-links. Anchor/link/div elements strip to whitespace, so the
  // htmlStrip of the page is BYTE-IDENTICAL with or without the
  // block — every stripped-text oracle is untouched by construction
  // (WarcLinksSpec pins the invariance). Domain targets are pure
  // functions of d = N % 10, so the whole domain graph is ≤30
  // deterministic edges both engines derive independently:
  //   blocklisted trio (5,6,7 — ads/spam/tracking): a link farm —
  //     each member links the other two (a complete directed
  //     triangle) plus the hub (real farms cite popular sites to
  //     look organic; it also keeps their mass leaking out instead
  //     of accumulating — pure PageRank REWARDS a fully closed farm,
  //     so a closed triangle would rank the spam at the top);
  //   everyone else: ring successor (d+1)%10, the hub (index 0, the
  //     news site every page cites), and a mixing target (9d+1)%10
  //     — under which only d=4 (forumhub.dev) links into the farm,
  //     so the trio's only legit citations come from one mid-tier
  //     domain and host rank leaves the farm in the bottom half
  //     even though each member has in-degree ≥ 2 (the planted
  //     separation WarcLinksSpec pins). ──

  /** (t1, t2, t3) target-domain indexes for source-domain index d. */
  private[operators] def linkTargets(d: Int): (Int, Int, Int) =
    if (d >= 5 && d <= 7) (5 + ((d - 4) % 3), 5 + ((d - 3) % 3), 0)
    else ((d + 1) % 10, 0, (9 * d + 1) % 10)

  /** Plain-Scala form for the WARC fixture writer — MUST stay
    * byte-identical to [[linkBlockCol]] / [[linkBlockSqlExpr]]. */
  private[operators] def linkBlockStr(id: Long): String = {
    val d = (id % 10).toInt
    val (t1, t2, t3) = linkTargets(d)
    val dom = PipelineQueries.URL_DOMAINS
    "<link rel=\"canonical\" href=\"https://" + dom(d) + "/page/" + id +
      "\"/><div class=\"nav\"><a href=\"https://" + dom(t1) + "/page/" +
      (id + 1) + "\"></a><a href=\"https://" + dom(t2) + "/page/" +
      (id + 2) + "\"></a><a href=\"https://" + dom(t3) + "/page/" +
      (id + 3) + "\"></a></div>"
  }

  private def domAt(i: Column): Column =
    element_at(typedLit(PipelineQueries.URL_DOMAINS), (i + 1).cast("int"))

  /** Column form (the [[htmlWrap]] insertion). */
  private[operators] def linkBlockCol(docId: Column): Column = {
    val d = (docId % 10).cast("int")
    val spam = d >= 5 && d <= 7
    val t1 = when(spam, lit(5) + (d - 4) % 3).otherwise((d + 1) % 10)
    val t2 = when(spam, lit(5) + (d - 3) % 3).otherwise(lit(0))
    val t3 = when(spam, lit(0)).otherwise((d * 9 + 1) % 10)
    concat(
      lit("<link rel=\"canonical\" href=\"https://"), domAt(d),
      lit("/page/"), docId, lit("\"/><div class=\"nav\"><a href=\"https://"),
      domAt(t1), lit("/page/"), docId + 1,
      lit("\"></a><a href=\"https://"), domAt(t2),
      lit("/page/"), docId + 2,
      lit("\"></a><a href=\"https://"), domAt(t3),
      lit("/page/"), docId + 3, lit("\"></a></div>"))
  }

  /** DuckDB form (embedded by [[htmlWrapSqlExpr]] — continuation
    * lines never start with '|', the post-stripMargin contract). */
  private[operators] def linkBlockSqlExpr(docId: String): String = {
    val doms = "[" +
      PipelineQueries.URL_DOMAINS.map(d => s"'$d'").mkString(",") + "]"
    def domSql(i: String): String = s"($doms)[($i) + 1]"
    val d = s"(($docId) % 10)"
    val t1 = s"CASE WHEN $d BETWEEN 5 AND 7 THEN 5 + (($d - 4) % 3)" +
      s" ELSE ($d + 1) % 10 END"
    val t2 = s"CASE WHEN $d BETWEEN 5 AND 7 THEN 5 + (($d - 3) % 3)" +
      s" ELSE 0 END"
    val t3 = s"CASE WHEN $d BETWEEN 5 AND 7 THEN 0" +
      s" ELSE (9 * $d + 1) % 10 END"
    s"'<link rel=\"canonical\" href=\"https://' || ${domSql(d)}" +
      s"\n    || '/page/' || ($docId)" +
      "\n    || '\"/><div class=\"nav\"><a href=\"https://' || " +
      domSql(t1) +
      s"\n    || '/page/' || (($docId) + 1)" +
      s"\n    || '\"></a><a href=\"https://' || ${domSql(t2)}" +
      s"\n    || '/page/' || (($docId) + 2)" +
      s"\n    || '\"></a><a href=\"https://' || ${domSql(t3)}" +
      s"\n    || '/page/' || (($docId) + 3)" +
      "\n    || '\"></a></div>'"
  }

  /** script/style/comment blocks dropped, tags stripped, common
    * entities decoded, whitespace collapsed — reusable so composed
    * pipelines strip with the EXACT same kernel. */
  private[graft] def htmlStripCol(page: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(page, "<script[^>]*>[\\s\\S]*?</script>", " "),
        "<style[^>]*>[\\s\\S]*?</style>", " "),
      "<!--[\\s\\S]*?-->", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    // &amp; decodes LAST: the other way round "&amp;lt;" would
    // double-decode to "<" instead of the literal "&lt;"
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  def textHtmlStrip(s: SparkSession, dir: String): DataFrame = {
    val clean = htmlStripCol(htmlWrap(col("doc_id"), col("text")))
    documents(s, dir).select(col("doc_id"), clean.as("stripped"),
      length(clean).cast("long").as("n_stripped_chars"))
  }

  /** The synthetic-page concat as a DuckDB expression — mirrors
    * [[htmlWrap]] byte for byte (the WARC fixture's response body). */
  private[graft] def htmlWrapSqlExpr(docId: String, text: String): String =
    "'<html><head><script type=\"text/javascript\">var x = 1;</script>'" +
      "\n    || '<style>p { color: red }</style></head><body><h1>Doc '" +
      s"\n    || $docId || '</h1><!-- boilerplate -->'" +
      s"\n    || ${linkBlockSqlExpr(docId)}" +
      s"\n    || '<p>' || $text" +
      "\n    || ' &amp; more &lt;escaped&gt; &quot;text&quot;&nbsp;here</p>'" +
      "\n    || '</body></html>'"

  /** The strip chain as a DuckDB expression over a page column —
    * mirrors [[htmlStripCol]] exactly (regexes in the RE2 ∩
    * java.util.regex subset). */
  private[graft] def htmlStripSqlExpr(h: String): String =
    s"""trim(regexp_replace(
      |    replace(replace(replace(replace(replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace($h, '<script[^>]*>[\\s\\S]*?</script>', ' ', 'g'),
      |            '<style[^>]*>[\\s\\S]*?</style>', ' ', 'g'),
      |          '<!--[\\s\\S]*?-->', ' ', 'g'),
      |        '<[^>]+>', ' ', 'g'),
      |      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |      '&amp;', '&'),
      |    '[ \\t\\r\\n]+', ' ', 'g'))""".stripMargin

  // %WRAP% lands AFTER stripMargin: the wrap expression's
  // continuation lines begin with '||', which stripMargin would
  // truncate to '|' (the embedded-SQL margin lesson)
  val textHtmlStripSql: String =
    s"""WITH page AS (
      |  SELECT doc_id,
      |    %WRAP% AS h
      |  FROM documents),
      |stripped AS (
      |  SELECT doc_id, ${htmlStripSqlExpr("h")} AS stripped
      |  FROM page)
      |SELECT doc_id, stripped,
      |  CAST(len(stripped) AS BIGINT) AS n_stripped_chars
      |FROM stripped""".stripMargin
      .replace("%WRAP%", htmlWrapSqlExpr("doc_id", "text"))

  /** text_mixture_card — the dataset-mixture card: per (source, lang)
    * doc counts, BPE-estimate token budget, mean quality, and each
    * cell's share of the corpus token budget — the table a mixture
    * builder samples from ("60% web, 20% code, …" starts here).
    *
    * Scale shape: one two-phase hash agg reduces the corpus to
    * |sources|×|langs| rows; the share window runs over THAT tiny
    * aggregate (single partition of a few dozen rows), never over the
    * corpus. */
  def textMixtureCard(s: SparkSession, dir: String): DataFrame = {
    val card = documents(s, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(ceil(col("n_chars") / 4.0).cast("long")).as("bpe_tokens"),
        round(avg(QualityScore.quality) + lit(1e-9), 4).as("avg_quality"))
    card.withColumn("token_share",
      round(col("bpe_tokens") / sum(col("bpe_tokens"))
        .over(Window.partitionBy()) + lit(1e-9), 4))
  }

  val textMixtureCardSql: String =
    s"""WITH q AS (
      |  SELECT source, lang, n_chars,
      |    ${QualityScore.QUALITY_SQL} AS quality
      |  FROM documents),
      |card AS (
      |  SELECT source, lang, count(*) AS n_docs,
      |    CAST(sum(CAST(ceil(n_chars / 4.0) AS BIGINT)) AS BIGINT)
      |      AS bpe_tokens,
      |    round(avg(quality) + 1e-9, 4) AS avg_quality
      |  FROM q GROUP BY source, lang)
      |SELECT source, lang, n_docs, bpe_tokens, avg_quality,
      |  round(CAST(bpe_tokens AS DOUBLE) / sum(bpe_tokens) OVER ()
      |    + 1e-9, 4) AS token_share
      |FROM card""".stripMargin

  /** text_entropy — per-document Shannon word entropy (bits) and
    * vocabulary size: the cheap gibberish/boilerplate detector that
    * complements text_repetition (repeated boilerplate → low entropy,
    * random noise → entropy ≈ log2(n_words)).
    *
    * Scale shape: entropy is PER-DOCUMENT, so like the repetition
    * kernel nothing leaves the row — ZERO shuffle, instead of the
    * explode → two hash aggs → join shape that shuffles the whole
    * exploded corpus twice. The in-row kernel is array_sort + ONE
    * run-length fold (O(n log n) per doc): the earlier
    * distinct×filter form was O(u·n) per row, which on a single
    * book-length doc (n≈u≈10⁵) is ~10¹⁰ comparisons in one row — a
    * straggler that never finishes on a heavy-tailed real corpus. */
  def textEntropy(s: SparkSession, dir: String): DataFrame =
    textEntropyFrom(documents(s, dir))

  private[graft] def textEntropyFrom(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    val n = size(ws).cast("double")
    // Fold state over the SORTED words: (prev word, current run
    // length, Σ c·log2(c) of closed runs, distinct-word count). Each
    // run closes when the word changes; the finish step closes the
    // last run. run=0 guards the empty initial state (0·log2(0)=NaN).
    def closedAcc(st: Column): Column =
      st.getField("acc") + when(st.getField("run") > 0.0,
        st.getField("run") * log2(st.getField("run"))).otherwise(0.0)
    val folded = aggregate(
      array_sort(ws),
      struct(lit(null).cast("string").as("prev"), lit(0.0).as("run"),
        lit(0.0).as("acc"), lit(0L).as("vocab")),
      (st, x) => when(x === st.getField("prev"),
        struct(st.getField("prev").as("prev"),
          (st.getField("run") + 1.0).as("run"),
          st.getField("acc").as("acc"),
          st.getField("vocab").as("vocab")))
        .otherwise(struct(x.as("prev"), lit(1.0).as("run"),
          closedAcc(st).as("acc"),
          (st.getField("vocab") + 1L).as("vocab"))),
      st => struct(closedAcc(st).as("acc"),
        st.getField("vocab").as("vocab")))
    // H = log2(n) - Σ c·log2(c) / n  (exact rewrite of -Σ p·log2 p;
    // one log per DISTINCT word and no division inside the loop)
    docs
      .select(col("doc_id"), n.as("n"), folded.as("f"))
      .select(col("doc_id"),
        col("f.vocab").as("n_vocab"),
        round(log2(col("n")) - col("f.acc") / col("n") + lit(1e-9), 4)
          .as("entropy_bits"))
  }

  val textEntropySql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |c AS (
      |  SELECT doc_id, len(ws) AS n, len(list_distinct(ws)) AS u,
      |    list_transform(list_distinct(ws),
      |      w -> CAST(len(list_filter(ws, x -> x = w)) AS DOUBLE)) AS cnts
      |  FROM t)
      |SELECT doc_id, CAST(u AS BIGINT) AS n_vocab,
      |  round(log2(n) - list_sum(list_transform(cnts, c -> c * log2(c))) / n
      |    + 1e-9, 4) AS entropy_bits
      |FROM c""".stripMargin

  /** text_length_histogram — the sequence-length distribution every
    * training pipeline reports before packing: docs bucketed by
    * power-of-two whitespace-token count, with doc and token mass per
    * bucket. ONE hash agg to ~30 rows (buckets are log2-bounded), so
    * the corpus reduces map-side; no sort, no window. */
  def textLengthHistogram(s: SparkSession, dir: String): DataFrame =
    textLengthHistogramFrom(documents(s, dir))

  private[graft] def textLengthHistogramFrom(docs: DataFrame): DataFrame = {
    val n = size(split(col("text"), " ")).cast("long")
    docs
      // exact integer floor(log2 n): bit-length − 1. floor(log(2.0,n))
      // evaluates as ln(n)/ln(2), which can land a hair BELOW the
      // integer at exact powers of two and misbucket them; DuckDB's
      // native log2 is exact there, so the engines would disagree on
      // every 2^k-token doc.
      .select((length(bin(greatest(n, lit(1L)))) - 1).cast("long")
          .as("bucket"),
        n.as("n_tokens"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
      .select(col("bucket"),
        expr("CAST(shiftleft(1L, CAST(bucket AS INT)) AS BIGINT)")
          .as("bucket_lo"),
        col("n_docs"), col("tokens"))
  }

  val textLengthHistogramSql: String =
    // bit_length-of-bin bucket mirrors the Spark side exactly (integer
    // arithmetic, no libm); CAST(sum AS BIGINT) because DuckDB's
    // sum(BIGINT) is HUGEINT, which hashes differently from int64.
    """WITH t AS (
      |  SELECT CAST(len(bin(greatest(len(string_split(text, ' ')), 1))) - 1
      |      AS BIGINT) AS bucket,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT bucket, CAST(1 << bucket AS BIGINT) AS bucket_lo,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
      |FROM t GROUP BY bucket""".stripMargin

  /** text_cooccurrence — PMI phrase mining: the top adjacent word
    * pairs per language ranked by pointwise mutual information
    * (log p(ab) / p(a)p(b)), the collocation signal used to build
    * phrase vocabularies and spot templated corpora. Tokens and
    * bigrams each reduce through ONE two-phase hash agg; unigram
    * totals are tiny (|vocab| rows) and broadcast back onto the
    * bigram counts, so nothing corpus-sized is joined. Low-count
    * pairs (n < 5) are dropped before ranking — the standard PMI
    * noise floor. */
  def textCooccurrence(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    // ws is BOUND as a column before any lambda touches it — indexing
    // a split() expression inside transform() re-splits the text per
    // element (O(n²) per doc; measured 9 s vs 1 s at sf0.1). zip_with
    // against the shifted tail builds every adjacent pair in one pass
    // (the tail is 1 shorter, so the last pair has b = null → dropped).
    val pre = docs.select(col("lang"), split(col("text"), " ").as("ws"))
    val bigrams = pre.select(col("lang"),
      explode(adjacentPairs(col("ws"))).as("g"))
      .select(col("lang"), col("g.a"), col("g.b"))
      .filter(col("b").isNotNull &&
        length(col("a")) > 0 && length(col("b")) > 0)
      .groupBy(col("lang"), col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
    val unigrams = pre
      .select(col("lang"), explode(col("ws")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("n_w"))
    val totals = unigrams.groupBy(col("lang"))
      .agg(sum(col("n_w")).as("n_total"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
    // The unigram joins are UNHINTED: per-lang unigram tables scale
    // with corpus content (billions of distinct raw-web tokens), and
    // an explicit broadcast() is never demoted by AQE — a guaranteed
    // OOM at 100 TB. Unhinted, AQE broadcasts when small and falls
    // back to shuffled hash joins when not. totals stays hinted: it
    // is |langs| rows by construction.
    bigrams.filter(col("n_ab") >= 5)
      .join(unigrams.withColumnRenamed("w", "a")
        .withColumnRenamed("n_w", "n_a"), Seq("lang", "a"))
      .join(unigrams.withColumnRenamed("w", "b")
        .withColumnRenamed("n_w", "n_b"), Seq("lang", "b"))
      .join(broadcast(totals), Seq("lang"))
      // DOUBLE before multiplying: n_ab×n_total overflows LONG on a
      // trillion-token corpus (ANSI throw / silent wrap) — the oracle
      // already multiplies in DOUBLE
      .withColumn("pmi", round(
        log(col("n_ab").cast("double") * col("n_total")
          / (col("n_a").cast("double") * col("n_b")))
          + lit(1e-9), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk"), col("a"), col("b"), col("n_ab"),
        col("pmi"))
  }

  val textCooccurrenceSql: String =
    """WITH t AS (
      |  SELECT lang, string_split(text, ' ') AS ws FROM documents),
      |bg AS (
      |  SELECT lang, ws[i] AS a, ws[i + 1] AS b, count(*) AS n_ab
      |  FROM t, unnest(generate_series(1, len(ws) - 1)) AS u(i)
      |  WHERE len(ws[i]) > 0 AND len(ws[i + 1]) > 0
      |  GROUP BY lang, a, b),
      |ug AS (
      |  SELECT lang, u.w, count(*) AS n_w
      |  FROM t, unnest(ws) AS u(w) WHERE len(u.w) > 0
      |  GROUP BY lang, u.w),
      |tot AS (SELECT lang, sum(n_w) AS n_total FROM ug GROUP BY lang),
      |scored AS (
      |  SELECT bg.lang, bg.a, bg.b, bg.n_ab,
      |    round(ln(CAST(bg.n_ab AS DOUBLE) * tot.n_total
      |      / (ua.n_w * ub.n_w)) + 1e-9, 4) AS pmi
      |  FROM bg
      |  JOIN ug ua ON bg.lang = ua.lang AND bg.a = ua.w
      |  JOIN ug ub ON bg.lang = ub.lang AND bg.b = ub.w
      |  JOIN tot ON bg.lang = tot.lang
      |  WHERE bg.n_ab >= 5)
      |SELECT lang, rk, a, b, n_ab, pmi FROM (
      |  SELECT lang, a, b, n_ab, pmi,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY pmi DESC, a, b) AS rk
      |  FROM scored)
      |WHERE rk <= 10""".stripMargin

  /** agg_ks_drift — dataset drift monitor: the two-sample
    * Kolmogorov–Smirnov statistic between each source's quality
    * distribution and the rest of the corpus, per language — the
    * "did this crawl snapshot shift" alarm run between ingest
    * batches. D = max over distinct values v of |F_src(v) − F_rest(v)|
    * (CDFs only jump at observed values, so the distinct-value grid
    * is the exact KS, not an approximation).
    *
    * Scale shape: the corpus first reduces through ONE hash agg to
    * (lang, source, q) counts — q is rounded to 4 decimals, so that
    * aggregate is bounded by |lang|×|source|×10⁴ rows no matter the
    * corpus size. The per-candidate expansion and the CDF windows run
    * over THAT aggregate; the corpus itself is scanned once and never
    * joined or windowed. */
  def aggKsDrift(s: SparkSession, dir: String): DataFrame =
    aggKsDriftFrom(documents(s, dir)
      .select(col("lang"), col("source"), QualityScore.quality.as("q")))

  /** Fixture-drivable core — expects (lang, source, q). */
  private[graft] def aggKsDriftFrom(scored: DataFrame): DataFrame = {
    val cnt = scored
      .groupBy(col("lang"), col("source"), col("q"))
      .agg(count(lit(1)).as("n"))
    val sources = cnt.select(col("lang"), col("source").as("src")).distinct()
    // per candidate source: in/out counts at every distinct (lang, q)
    val grid = cnt.join(sources, Seq("lang"))
      .groupBy(col("lang"), col("src"), col("q"))
      .agg(sum(when(col("source") === col("src"), col("n"))
        .otherwise(lit(0L))).as("n_in"),
        sum(when(col("source") =!= col("src"), col("n"))
          .otherwise(lit(0L))).as("n_out"))
    val w = Window.partitionBy(col("lang"), col("src")).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("lang"), col("src"))
    grid
      .withColumn("cum_in", sum(col("n_in")).over(w))
      .withColumn("cum_out", sum(col("n_out")).over(w))
      .withColumn("t_in", sum(col("n_in")).over(tot))
      .withColumn("t_out", sum(col("n_out")).over(tot))
      // a language with a single source has no rest-pool: D is
      // undefined there, not zero — drop instead of dividing by zero
      .filter(col("t_in") > 0 && col("t_out") > 0)
      .groupBy(col("lang"), col("src"))
      .agg(round(max(abs(col("cum_in") / col("t_in")
        - col("cum_out") / col("t_out"))) + lit(1e-9), 4).as("ks_d"))
      .select(col("lang"), col("src").as("source"), col("ks_d"))
  }

  val aggKsDriftSql: String =
    s"""WITH sc AS (
      |  SELECT lang, source,
      |    ${QualityScore.QUALITY_SQL} AS q
      |  FROM documents),
      |cnt AS (
      |  SELECT lang, source, q, count(*) AS n
      |  FROM sc GROUP BY lang, source, q),
      |srcs AS (SELECT DISTINCT lang, source AS src FROM cnt),
      |grid AS (
      |  SELECT cnt.lang, srcs.src, cnt.q,
      |    sum(CASE WHEN cnt.source = srcs.src THEN n ELSE 0 END) AS n_in,
      |    sum(CASE WHEN cnt.source <> srcs.src THEN n ELSE 0 END) AS n_out
      |  FROM cnt JOIN srcs ON cnt.lang = srcs.lang
      |  GROUP BY cnt.lang, srcs.src, cnt.q),
      |cdf AS (
      |  SELECT lang, src,
      |    sum(n_in) OVER (PARTITION BY lang, src ORDER BY q
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_in,
      |    sum(n_out) OVER (PARTITION BY lang, src ORDER BY q
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_out,
      |    sum(n_in) OVER (PARTITION BY lang, src) AS t_in,
      |    sum(n_out) OVER (PARTITION BY lang, src) AS t_out
      |  FROM grid)
      |SELECT lang, src AS source,
      |  round(max(abs(CAST(cum_in AS DOUBLE) / t_in
      |    - CAST(cum_out AS DOUBLE) / t_out)) + 1e-9, 4) AS ks_d
      |FROM cdf WHERE t_in > 0 AND t_out > 0
      |GROUP BY lang, src""".stripMargin

  /** win_quality_cdf — each document's percentile position within its
    * language (cume_dist): the rank feature mixture builders and
    * downsamplers key on. One window per language partition. */
  def winQualityCdf(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality"), col("doc_id"))
    documents(s, dir)
      .select(col("doc_id"), col("lang"), QualityScore.quality.as("quality"))
      .withColumn("cdf", round(cume_dist().over(w) + lit(1e-9), 4))
  }

  val winQualityCdfSql: String =
    s"""WITH q AS (
      |  SELECT doc_id, lang,
      |    ${QualityScore.QUALITY_SQL} AS quality
      |  FROM documents)
      |SELECT doc_id, lang, quality,
      |  round(cume_dist() OVER (PARTITION BY lang
      |    ORDER BY quality, doc_id) + 1e-9, 4) AS cdf
      |FROM q""".stripMargin

  /** fn_sentence_split — sentence segmentation with offsets: each doc
    * exploded into '[^.!?]+[.!?]?' runs (punctuation kept with its
    * sentence), indexed, trimmed — the unit both sentence-level dedup
    * and citation/attribution work key on. The regex stays in the
    * RE2 ∩ java.util.regex subset (no lookbehind) so both engines
    * produce identical splits. Pure per-row explode: zero shuffle,
    * output ~sentences/doc × corpus. */
  def fnSentenceSplit(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"),
        posexplode(expr(s"regexp_extract_all(text, '$SENT_RE', 0)"))
          .as(Seq("sent_idx", "raw")))
      .select(col("doc_id"), col("sent_idx").cast("long").as("sent_idx"),
        trim(col("raw")).as("sentence"),
        size(split(trim(col("raw")), " ")).cast("long").as("n_words"))
      .filter(length(col("sentence")) > 0)

  val fnSentenceSplitSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, regexp_extract_all(text, '$SENT_RE') AS sents
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_idx,
      |    trim(sents[i]) AS sentence
      |  FROM t, unnest(generate_series(1, len(sents))) AS u(i))
      |SELECT doc_id, sent_idx, sentence,
      |  CAST(len(string_split(sentence, ' ')) AS BIGINT) AS n_words
      |FROM x WHERE len(sentence) > 0""".stripMargin

  /** fn_unicode_normalize — NFC normalization + control-char strip:
    * the canonicalization pass that makes visually-identical strings
    * byte-identical BEFORE any hash-based dedup (composed é vs e +
    * combining accent would otherwise defeat exact dedup). NFC runs
    * in a UDF (java.text.Normalizer — a justified non-codegen kernel:
    * no Catalyst expression exposes ICU normalization); the control
    * strip is a codegen regexp. The corpus is ASCII, so a combining-
    * accent suffix is synthesized per row to exercise the fold (same
    * pattern as text_pii_scrub); DuckDB's nfc_normalize provides the
    * cross-engine oracle. */
  def fnUnicodeNormalize(s: SparkSession, dir: String): DataFrame = {
    val nfc = udf { (t: String) =>
      if (t == null) null
      else java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
    }
    val raw = concat(col("text"),
      lit(" café naïve ctrl"))
    documents(s, dir).select(
      col("doc_id"),
      regexp_replace(nfc(raw), "[\\x00-\\x1f\\x7f]", "").as("normalized"))
      .withColumn("n_chars_norm", length(col("normalized")).cast("long"))
  }

  val fnUnicodeNormalizeSql: String =
    "WITH t AS (\n" +
      "  SELECT doc_id, regexp_replace(\n" +
      "    nfc_normalize(text || ' café naïve ctrl'),\n" +
      "    '[\\x00-\\x1f\\x7f]', '', 'g') AS normalized\n" +
      "  FROM documents)\n" +
      "SELECT doc_id, normalized,\n" +
      "  CAST(len(normalized) AS BIGINT) AS n_chars_norm\nFROM t"

  /** text_bpe_pairs — one round of BPE tokenizer training: the global
    * count of adjacent character pairs inside words, top-20. Training
    * a BPE vocabulary IS iterating this count-and-merge step, and the
    * count is the only part that touches the corpus — so it's the
    * part that must be distributed.
    *
    * Scale shape: explode to pairs → ONE map-side-combined hash agg
    * (pair cardinality is bounded by |alphabet|², tiny next to the
    * corpus) → TakeOrderedAndProject for the global top-k. No window,
    * no second shuffle; the (cnt DESC, pair) total order makes the
    * top-20 set deterministic across engines. */
  def textBpePairs(s: SparkSession, dir: String): DataFrame =
    bpePairCounts(s, dir)
      .orderBy(col("cnt").desc, col("pair"))
      .limit(20)

  /** The full (pair, cnt) table — shared by the top-20 report and the
    * merge-list learning in textBpeEncode (which takes a different,
    * deeper prefix). */
  private def bpePairCounts(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w)-1), i -> substr(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))

  val textBpePairsSql: String =
    """WITH w AS (
      |  SELECT t.w FROM documents, unnest(string_split(text, ' ')) AS t(w)
      |  WHERE len(t.w) >= 2),
      |p AS (
      |  SELECT substr(w, g.i, 2) AS pair
      |  FROM w, unnest(generate_series(1, len(w) - 1)) AS g(i)),
      |c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY pair)
      |SELECT pair, cnt FROM c ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  /** Number of BPE merges text_bpe_encode learns and applies — enough
    * to show real compression on the fixture corpus while keeping the
    * broadcast "model" trivially small. */
  private val BPE_MERGES = 50

  /** Greedy BPE encoder kernel: apply a ranked merge list to one
    * word (chars → repeatedly merge the best-ranked adjacent pair
    * until none applies) and return its token count. The REFERENCE
    * algorithm every BPE tokenizer runs at encode time; a justified
    * non-codegen kernel (iterative, data-dependent loop — same class
    * as the NFC normalizer). Deterministic: ties broken by rank, then
    * leftmost position. */
  private[operators] def bpeTokenCount(
      word: String, rank: Map[String, Int], sep: String = ""): Int = {
    if (word.isEmpty) return 0
    // one working array for the whole word, compacted IN PLACE per
    // merge — the earlier `take ++ drop` rebuild allocated two arrays
    // per merge, O(n²) allocation on long mergeable words. The
    // per-merge rescan stays: a merge changes its neighbors' pair
    // ranks, and greedy best-rank BPE is defined by re-finding the
    // global best each round. Base tokens are CODE POINTS, matching
    // the pair-learning side (Spark substr) and the DuckDB oracle's
    // substr addressing — identical on BMP-only text.
    val toks = new Array[String](word.length)
    var n = 0
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val w = Character.charCount(cp)
      toks(n) = word.substring(ci, ci + w)
      n += 1
      ci += w
    }
    var done = false
    while (!done && n > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < n - 1) {
        val r = rank.getOrElse(toks(i) + sep + toks(i + 1), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) done = true
      else {
        toks(best) = toks(best) + toks(best + 1)
        var j = best + 1
        while (j < n - 1) { toks(j) = toks(j + 1); j += 1 }
        n -= 1
      }
    }
    n
  }

  /** The same greedy kernel returning the TOKENS (pipeline_tokenize_
    * pack needs the ids, not just the count). Kept as a separate loop
    * so the hot count path pays no array copy; TokenizePackSpec pins
    * `bpeTokensOf(w).length == bpeTokenCount(w)` so the twins cannot
    * drift. */
  private[operators] def bpeTokensOf(
      word: String, rank: Map[String, Int], sep: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val toks = new Array[String](word.length)
    var n = 0
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      val w = Character.charCount(cp)
      toks(n) = word.substring(ci, ci + w)
      n += 1
      ci += w
    }
    var done = false
    while (!done && n > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < n - 1) {
        val r = rank.getOrElse(toks(i) + sep + toks(i + 1), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) done = true
      else {
        toks(best) = toks(best) + toks(best + 1)
        var j = best + 1
        while (j < n - 1) { toks(j) = toks(j + 1); j += 1 }
        n -= 1
      }
    }
    java.util.Arrays.copyOf(toks, n)
  }

  /** text_bpe_encode — the apply half of the tokenizer loop: learn the
    * top-50 merges from the corpus (text_bpe_pairs' count, iterated
    * greedily ON THE PAIR TABLE, not re-scanning the corpus per merge)
    * and encode every document, reporting BPE token count vs
    * whitespace words and the compression ratio. Per-language output.
    *
    * Scale shape: the merge list is learned from the bounded pair
    * table (|alphabet|² rows — ONE corpus scan) and travels as a
    * ≤50-entry broadcast; encoding is a map-side UDF pass, no
    * shuffle beyond the final per-language agg. NOTE the single-scan
    * merge learning is the standard frequency-rank approximation
    * (ranks come from the base pair counts, not recounted after each
    * merge) — the apply-side kernel is exact greedy BPE either way.
    *
    * Oracled (round 13): the "inherently iterative" claim fell — a
    * DuckDB RECURSIVE CTE replays the greedy merge loop per DISTINCT
    * word (each step finds the min-rank leftmost adjacent pair via a
    * map lookup and splices the list; each merge shrinks the list by
    * one, so the final token count is min(len) across iterations),
    * then weights by per-(lang, word) multiplicities. The kernel's
    * tie-breaks (rank, then leftmost) are mirrored by
    * list_position(rl, list_min(rl)). */
  def textBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val merges = bpePairCounts(s, dir)
      .orderBy(col("cnt").desc, col("pair")).limit(BPE_MERGES)
      .collect().map(_.getString(0))
    val rank = merges.zipWithIndex.toMap
    val b = s.sparkContext.broadcast(rank)
    val countUdf = udf { text: String =>
      if (text == null) 0L
      else {
        val r = b.value
        var n = 0L
        text.split(" ", -1).foreach { w => n += bpeTokenCount(w, r) }
        n
      }
    }
    documents(s, dir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        countUdf(col("text")).as("n_bpe"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe")).as("n_bpe"),
        round(sum(col("n_bpe")) / sum(col("n_words")) + lit(1e-9), 4)
          .as("tokens_per_word"))
  }

  /** The greedy-merge replay: merges = the same top-50 (cnt DESC,
    * pair) prefix as the engine's learner with row_number ranks; the
    * recursive state is (word, token list), one step = splice the
    * min-rank leftmost mergeable pair; fin takes min(len) per word
    * (every step shrinks the list by exactly one). Counts are then
    * weighted by (lang, word) multiplicities — the iteration runs per
    * DISTINCT word, not per occurrence. All sums CAST to BIGINT (the
    * driver hashes HUGEINT differently). */
  val textBpeEncodeSql: String =
    """WITH RECURSIVE
      |w0 AS (
      |  SELECT lang, t.w FROM documents,
      |    unnest(string_split(text, ' ')) AS t(w)),
      |wc AS (SELECT lang, w, count(*) AS cnt FROM w0 GROUP BY lang, w),
      |dw AS (SELECT DISTINCT w FROM w0),
      |p AS (
      |  SELECT substr(w, g.i, 2) AS pair
      |  FROM (SELECT w FROM w0 WHERE len(w) >= 2) ww,
      |       unnest(generate_series(1, len(ww.w) - 1)) AS g(i)),
      |c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY pair),
      |merges AS (
      |  SELECT pair,
      |    CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS INT) - 1 AS rank
      |  FROM c ORDER BY cnt DESC, pair LIMIT 50),
      |rm AS (
      |  SELECT map_from_entries(list(struct_pack(k := pair, v := rank))) AS m
      |  FROM merges),
      |init AS (
      |  SELECT w,
      |    list_transform(generate_series(1, len(w)), i -> substr(w, i, 1))
      |      AS toks
      |  FROM dw),
      |st AS (
      |  SELECT w, toks FROM init
      |  UNION ALL
      |  SELECT w,
      |    list_slice(toks, 1, b - 1)
      |      || [toks[b] || toks[b + 1]]
      |      || list_slice(toks, b + 2, len(toks)) AS toks
      |  FROM (
      |    SELECT w, toks,
      |      CASE WHEN list_min(rl) < 2147483647
      |           THEN list_position(rl, list_min(rl)) ELSE NULL END AS b
      |    FROM (
      |      SELECT s.w, s.toks,
      |        list_transform(generate_series(1, len(s.toks) - 1),
      |          i -> coalesce(map_extract(rm.m, s.toks[i] || s.toks[i + 1])[1],
      |                        2147483647)) AS rl
      |      FROM st s, rm
      |      WHERE len(s.toks) > 1)
      |  ) WHERE b IS NOT NULL),
      |fin AS (SELECT w, min(len(toks)) AS n_toks FROM st GROUP BY w),
      |agg AS (
      |  SELECT wc.lang,
      |    CAST(sum(wc.cnt) AS BIGINT) AS n_words,
      |    CAST(sum(wc.cnt * f.n_toks) AS BIGINT) AS n_bpe
      |  FROM wc JOIN fin f ON wc.w = f.w
      |  GROUP BY wc.lang),
      |nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
      |SELECT nd.lang, nd.n_docs, a.n_words, a.n_bpe,
      |  round(CAST(a.n_bpe AS DOUBLE) / a.n_words + 1e-9, 4)
      |    AS tokens_per_word
      |FROM nd JOIN agg a ON nd.lang = a.lang""".stripMargin

  /** Merge rounds the multi-round trainer runs (text_bpe_train). */
  private[operators] val BPE_TRAIN_ROUNDS = 16

  /** Token-boundary separator for the trainer's tiled string
    * representation: U+001F (unit separator), a control char absent
    * from the corpus contract (whitespace-split words). */
  private val BSEP = "\u001f"

  /** text_bpe_train — the REAL tokenizer training loop: K=16 rounds
    * of count → pick best pair → merge → RE-COUNT, the
    * count-merge-re-encode iteration every production BPE trainer
    * runs (text_bpe_pairs is one round's count; text_bpe_encode's
    * merge list was the single-scan frequency-rank approximation —
    * this operator learns the exact iterated merges). Emits one row
    * per learned merge: (round, pair_a, pair_b, cnt at selection).
    *
    * Representation: each word's token list is tiled into ONE string
    * `␟t1␟␟t2␟…␟tn␟` (every token bracketed by U+001F), so one merge
    * round over the whole vocabulary is a single codegen'd
    * `replace(rep, ␟a␟␟b␟, ␟ab␟)` — string `replace` is
    * left-to-right non-overlapping, which IS the BPE merge rule
    * (a run `aaa` merges once), and the bracketing makes token
    * boundaries unambiguous (a match can only start at a
    * block-leading separator, so merges always align to whole
    * tokens). No UDF anywhere in the loop.
    *
    * Scale design: ONE corpus scan builds the (word, cnt) table;
    * every round after that is vocabulary-bounded, never
    * corpus-bounded — a map-side-combined pair count (pair
    * cardinality ≤ running vocab²·density, in practice tiny), a
    * 1-ROW collect (the argmax merge), and one narrow map pass
    * applying the merge; each round persists its vocab table and
    * unpersists the previous (K live copies never stack). Per-round
    * cost documented in SCALE.md. Oracle: the WHOLE K-round loop
    * replays in one DuckDB recursive CTE — state (it, w, cnt, rep),
    * each step recomputing the global argmax pair from the working
    * table and applying the identical replace. */
  def textBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeTrainMergesFor(s, dir).toDF("round", "pair_a", "pair_b", "cnt")
  }

  /** The merge list memo — the [[SimilarityQueries.kmeansCentroidsFor]]
    * idiom (session-free driver value, keyed by dir with the corpus
    * fingerprint IN the value so in-place regeneration refreshes):
    * text_bpe_train and text_bpe_encode_trained share one 16-round
    * training loop per (JVM, corpus) instead of paying it twice. */
  private val bpeMergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.SparkContext,
      LazyCell[Seq[(Int, String, String, Long)]])]()

  private def bpeTrainMergesFor(
      s: SparkSession, dir: String): Seq[(Int, String, String, Long)] = {
    val fp = graft.operators.IndexManifest.corpusFingerprint(dir, "documents")
    // compute() only allocates the cell — the 16-round training loop
    // runs on .value OUTSIDE the map's bin lock ([[LazyCell]]), so a
    // concurrent caller on another key never blocks behind a build.
    // A completed merge list is session-free driver data (reusable
    // forever under its fingerprint); an UNcompleted cell is only
    // reusable while the context its thunk captured is alive —
    // otherwise the failed/never-run build would retry against a
    // stopped session forever.
    bpeMergeCache.compute(dir, (_, prev) => prev match {
      case (`fp`, sc, cell)
          if cell.completed.isDefined || !sc.isStopped => prev
      case _ => (fp, s.sparkContext,
        new LazyCell({ () =>
          MemoBuilds.record("bpe_merges")
          bpeTrainMergesFrom(documents(s, dir))
        }))
    })._3.value
  }

  /** Fixture seam: planted-corpus specs pin hand-computed merge
    * sequences (including the overlapping-run rule) on THIS method. */
  private[graft] def textBpeTrainFrom(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    bpeTrainMergesFrom(d).toDF("round", "pair_a", "pair_b", "cnt")
  }

  /** Distinct-word ceiling for the driver-local merge loop (the
    * [[DedupQueries.DRIVER_CC_MAX]] / quantizer-class idiom): ≤ 2¹⁹
    * (word, cnt) rows ≈ tens of MB of token arrays, far under driver
    * headroom and far over any fixture. Below it, the merge loop runs
    * DRIVER-LOCALLY: the distributed loop pays one full Spark job
    * (count → argmax → replace → checkpoint) PER MERGE ROUND, which
    * is flat at K=16 but serializes ~32k jobs of driver latency at a
    * production 32k-merge vocabulary, while the working table is
    * distinct-word-bounded — exactly the shape the engine's other
    * bounded-driver-read shortcuts exploit. The arithmetic is
    * bit-identical (spec-pinned both paths, both call orders): exact
    * long pair counts, (pcnt desc, a, b) argmax under UTF-8 BINARY
    * string order (what Spark's non-collated asc sort compares), and
    * the same left-to-right non-overlapping merge. Above the cap the
    * distributed loop runs unchanged. */
  private[graft] val DRIVER_BPE_MAX = 1L << 19

  /** The trainer's driver-side product — the ordered merge list —
    * shared by the text_bpe_train report and the trained encoder
    * (text_bpe_encode_trained). ≤ `rounds` entries. `onRound` (plan
    * observers) implies the DISTRIBUTED loop — the driver path has no
    * per-round frame to observe. */
  private[graft] def bpeTrainMergesFrom(
      d: DataFrame,
      onRound: (Int, DataFrame) => Unit = null,
      rounds: Int = BPE_TRAIN_ROUNDS,
      driverMax: Long = DRIVER_BPE_MAX)
      : Seq[(Int, String, String, Long)] = {
    val ss = BSEP + BSEP
    val wc = d.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    if (onRound == null && driverMax > 0) {
      // one job decides AND fetches: collect at most cap+1 rows of
      // the word-count aggregate — if the vocabulary fits, these ARE
      // all the rows and the whole merge loop runs driver-locally
      // with zero further Spark jobs; if not, fall through to the
      // distributed loop (which recomputes wc — the extra aggregate
      // is the price of not persisting a frame we usually never
      // need twice)
      val cap = math.min(driverMax, (Int.MaxValue - 2).toLong).toInt
      val head = wc.limit(cap + 1).collect()
      if (head.length <= cap)
        return bpeTrainMergesDriver(
          head.map(r => (r.getString(0), r.getLong(1))), rounds)
    }
    // eager localCheckpoint, not persist: each round's frame must
    // START a fresh lineage (a LogicalRDD), or round k's plan nests
    // all k-1 predecessors and analysis cost grows superlinearly —
    // the profiled persist() form decayed 0.6 s → 24 s/round by
    // round 16 at sf0.1 purely in the planner
    var words = wc.select(col("cnt"), concat(lit(BSEP),
        array_join(expr(
          "transform(sequence(1, length(w)), i -> substr(w, i, 1))"),
          ss),
        lit(BSEP)).as("rep"))
      .localCheckpoint(true)
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val tDbg = System.nanoTime()
      val top = words
        .select(col("cnt"), expr(
          s"transform(split(rep, '$ss'), x -> trim(BOTH '$BSEP' FROM x))")
          .as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("cnt"), explode(expr(
          """transform(sequence(1, size(toks) - 1),
            |  i -> struct(element_at(toks, i) AS a,
            |              element_at(toks, i + 1) AS b))""".stripMargin))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("pcnt"))
        .orderBy(col("pcnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (sys.env.contains("GRAFT_BPE_DEBUG"))
        System.err.println(f"[bpe] round $r top ${(System.nanoTime() - tDbg) / 1e9}%.2fs")
      if (top.isEmpty) done = true
      else {
        val (pa, pb, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((r, pa, pb, n))
        val next = words.select(col("cnt"),
          call_function("replace", col("rep"),
            lit(BSEP + pa + ss + pb + BSEP),
            lit(BSEP + pa + pb + BSEP)).as("rep"))
          .localCheckpoint(true) // eager: materialized before the
        // old round's blocks: Dataset.unpersist is a CacheManager
        // no-op on checkpoint RDDs — release the RDD itself, or K
        // vocab tables stack until a driver GC
        org.apache.spark.sql.graftbridge.GraftExpr
          .releaseLocalCheckpoint(words)
        words = next
        if (onRound != null) onRound(r, words)
        if (sys.env.contains("GRAFT_BPE_DEBUG"))
          System.err.println(f"[bpe] round $r full ${(System.nanoTime() - tDbg) / 1e9}%.2fs")
        r += 1
      }
    }
    org.apache.spark.sql.graftbridge.GraftExpr
      .releaseLocalCheckpoint(words)
    learned.toSeq
  }

  /** UTF-8 binary `<` — what Spark's non-collated string sort
    * compares (UTF8String.binaryCompare). Java's String.compareTo
    * orders by UTF-16 code UNIT and would rank astral code points
    * BELOW U+E000..U+FFFF, diverging from the distributed argmax's
    * tie-break on such vocabularies. */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

  /** The merge loop on a COLLECTED (word, cnt) table — semantics
    * identical to the distributed rounds by construction, replayed
    * per clause: tokens are CODE POINTS (Spark's `length`/`substr`
    * are code-point addressed — a Java-char split would diverge on
    * astral input); pair counts weight every adjacent index by the
    * word's long count (overlapping equal-token pairs both count,
    * like the distributed `transform(sequence(...))` enumeration);
    * the argmax is (pcnt desc, a, b) under [[utf8Lt]]; the merge is
    * left-to-right non-overlapping (a run `aaa` merges once — the
    * bracketed-`replace` rule). Per-round cost is O(Σ tokens) of
    * pure driver CPU and no Spark jobs, flat in the round count —
    * the path a 32k-merge production vocabulary needs. */
  private[graft] def bpeTrainMergesDriver(
      words0: Array[(String, Long)], rounds: Int)
      : Seq[(Int, String, String, Long)] = {
    var words: Array[(Array[String], Long)] = words0.map { case (w, c) =>
      (w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))), c)
    }
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts =
        new java.util.HashMap[(String, String), java.lang.Long]()
      words.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length - 1) {
          counts.merge((toks(i), toks(i + 1)), c, (x, y) => x + y)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var bestA: String = null
        var bestB: String = null
        var bestN = -1L
        counts.forEach { (k, n) =>
          if (n > bestN || (n == bestN && (utf8Lt(k._1, bestA) ||
              (k._1 == bestA && utf8Lt(k._2, bestB))))) {
            bestA = k._1; bestB = k._2; bestN = n
          }
        }
        learned += ((r, bestA, bestB, bestN))
        val merged = bestA + bestB
        words = words.map { case (toks, c) =>
          var i = 0
          var hit = false
          while (!hit && i < toks.length - 1) {
            hit = toks(i) == bestA && toks(i + 1) == bestB
            i += 1
          }
          if (!hit) (toks, c)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < toks.length) {
              if (i < toks.length - 1 &&
                  toks(i) == bestA && toks(i + 1) == bestB) {
                out += merged; i += 2
              } else { out += toks(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        r += 1
      }
    }
    learned.toSeq
  }

  /** text_bpe_train oracle — the K-round loop in ONE recursive CTE:
    * state rows (it, w, cnt, rep); each step computes the global
    * (pcnt DESC, pa, pb) argmax pair from the working table and
    * applies the identical bracketed `replace`. The final select
    * recomputes, for every state level it, the pair that step chose
    * (row_number = 1 over the same total order) — one row per round
    * actually taken, so early termination on a pairless vocabulary
    * matches the engine loop's break. */
  /** The trainer CTE block (wc → st → mr), shared verbatim by the
    * text_bpe_train report and the text_bpe_encode_trained replay. */
  private lazy val bpeTrainSqlCtes: String = {
    val k = BPE_TRAIN_ROUNDS
    val sep = "chr(31)"
    val ss = s"$sep || $sep"
    val toks =
      s"list_transform(string_split(rep, $ss), x -> trim(x, $sep))"
    s"""wc AS (
       |  SELECT t.w AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents, unnest(string_split(text, ' ')) AS t(w)
       |  WHERE len(t.w) > 0 GROUP BY t.w),
       |st AS (
       |  SELECT 0 AS it, w, cnt,
       |    $sep || array_to_string(
       |      list_transform(generate_series(1, len(w)),
       |        i -> substr(w, i, 1)), $ss) || $sep AS rep
       |  FROM wc
       |  UNION ALL
       |  SELECT s.it + 1, s.w, s.cnt,
       |    replace(s.rep,
       |      $sep || bp.pa || $ss || bp.pb || $sep,
       |      $sep || bp.pa || bp.pb || $sep)
       |  FROM (SELECT * FROM st WHERE it < $k) s,
       |    (SELECT pa, pb FROM (
       |       SELECT tt.toks[g.i] AS pa, tt.toks[g.i + 1] AS pb,
       |         CAST(sum(tt.cnt) AS BIGINT) AS pcnt
       |       FROM (SELECT cnt, $toks AS toks
       |             FROM st WHERE it < $k) tt,
       |         unnest(generate_series(1, len(tt.toks) - 1)) AS g(i)
       |       GROUP BY 1, 2)
       |     ORDER BY pcnt DESC, pa, pb LIMIT 1) bp),
       |mr AS (
       |  SELECT it, pa, pb, pcnt,
       |    row_number() OVER (PARTITION BY it
       |      ORDER BY pcnt DESC, pa, pb) AS rk
       |  FROM (
       |    SELECT tt.it, tt.toks[g.i] AS pa, tt.toks[g.i + 1] AS pb,
       |      CAST(sum(tt.cnt) AS BIGINT) AS pcnt
       |    FROM (SELECT it, cnt, $toks AS toks
       |          FROM st WHERE it < $k) tt,
       |      unnest(generate_series(1, len(tt.toks) - 1)) AS g(i)
       |    GROUP BY 1, 2, 3))""".stripMargin
  }

  val textBpeTrainSql: String =
    s"""WITH RECURSIVE $bpeTrainSqlCtes
       |SELECT CAST(it + 1 AS INT) AS round, pa AS pair_a, pb AS pair_b,
       |  cnt
       |FROM (SELECT it, pa, pb, pcnt AS cnt FROM mr WHERE rk = 1)
       |ORDER BY round""".stripMargin

  /** text_bpe_encode_trained — the apply half fed by the REAL
    * trainer: encode every document with [[textBpeTrain]]'s iterated
    * merge list (rank = round order) instead of text_bpe_encode's
    * single-scan frequency-rank approximation, closing the
    * count→merge→re-count→encode loop end to end. Same exact greedy
    * kernel ([[bpeTokenCount]]) and per-language report shape; merge
    * keys are U+001F-separated PAIRS (not concatenations), so a
    * multi-char merge like (a, bc) can never be confused with
    * (ab, c).
    *
    * Scale design: the trainer's K vocabulary-bounded rounds (see
    * [[textBpeTrain]]) plus text_bpe_encode's broadcast-model
    * map-side encode pass — the ≤16-entry merge list is the ONLY
    * thing that travels. Oracle: the trainer CTE block and the
    * per-distinct-word greedy replay composed in one recursive
    * query. */
  def textBpeEncodeTrained(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeTrainMergesFor(s, dir)
    val rank = merges.sortBy(_._1).zipWithIndex
      .map { case ((_, pa, pb, _), i) => (pa + BSEP + pb) -> i }.toMap
    val b = s.sparkContext.broadcast(rank)
    val countUdf = udf { text: String =>
      if (text == null) 0L
      else {
        val r = b.value
        var n = 0L
        text.split(" ", -1).foreach { w => n += bpeTokenCount(w, r, BSEP) }
        n
      }
    }
    documents(s, dir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        countUdf(col("text")).as("n_bpe"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe")).as("n_bpe"),
        round(sum(col("n_bpe")) / sum(col("n_words")) + lit(1e-9), 4)
          .as("tokens_per_word"))
  }

  /** text_bpe_encode_trained oracle — [[bpeTrainSqlCtes]] derives the
    * merge list (rank = state level it), then the same greedy replay
    * as [[textBpeEncodeSql]] per distinct word with chr(31)-separated
    * pair keys, re-weighted by (lang, word) multiplicities. */
  val textBpeEncodeTrainedSql: String =
    s"""WITH RECURSIVE $bpeTrainSqlCtes,
       |merges AS (
       |  SELECT pa, pb, CAST(it AS INT) AS rank FROM mr WHERE rk = 1),
       |rm AS (
       |  SELECT map_from_entries(list(
       |    struct_pack(k := pa || chr(31) || pb, v := rank))) AS m
       |  FROM merges),
       |w0 AS (
       |  SELECT lang, t.w FROM documents,
       |    unnest(string_split(text, ' ')) AS t(w)),
       |lwc AS (SELECT lang, w, count(*) AS cnt FROM w0 GROUP BY lang, w),
       |dw AS (SELECT DISTINCT w FROM w0),
       |init AS (
       |  SELECT w,
       |    list_transform(generate_series(1, len(w)), i -> substr(w, i, 1))
       |      AS toks
       |  FROM dw),
       |est AS (
       |  SELECT w, toks FROM init
       |  UNION ALL
       |  SELECT w,
       |    list_slice(toks, 1, b - 1)
       |      || [toks[b] || toks[b + 1]]
       |      || list_slice(toks, b + 2, len(toks)) AS toks
       |  FROM (
       |    SELECT w, toks,
       |      CASE WHEN list_min(rl) < 2147483647
       |           THEN list_position(rl, list_min(rl)) ELSE NULL END AS b
       |    FROM (
       |      SELECT e.w, e.toks,
       |        list_transform(generate_series(1, len(e.toks) - 1),
       |          i -> coalesce(map_extract(rm.m,
       |                 e.toks[i] || chr(31) || e.toks[i + 1])[1],
       |               2147483647)) AS rl
       |      FROM est e, rm
       |      WHERE len(e.toks) > 1)
       |  ) WHERE b IS NOT NULL),
       |fin AS (SELECT w, min(len(toks)) AS n_toks FROM est GROUP BY w),
       |agg AS (
       |  SELECT lwc.lang,
       |    CAST(sum(lwc.cnt) AS BIGINT) AS n_words,
       |    CAST(sum(lwc.cnt * f.n_toks) AS BIGINT) AS n_bpe
       |  FROM lwc JOIN fin f ON lwc.w = f.w
       |  GROUP BY lwc.lang),
       |ndc AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
       |SELECT ndc.lang, ndc.n_docs, a.n_words, a.n_bpe,
       |  round(CAST(a.n_bpe AS DOUBLE) / a.n_words + 1e-9, 4)
       |    AS tokens_per_word
       |FROM ndc JOIN agg a ON ndc.lang = a.lang""".stripMargin

  // =================================================================
  // text_unigram_train / text_unigram_encode — the OTHER production
  // tokenizer family: a SentencePiece-style unigram language model
  // (Kudo 2018), trained by Viterbi hard-EM over the corpus words.
  // =================================================================

  private[graft] val UNIGRAM_ROUNDS = 4
  private[graft] val UNIGRAM_PMAX = 4
  private[graft] val UNIGRAM_WMAX = 32
  private[graft] val UNIGRAM_VOCAB_OUT = 32

  /** The Viterbi kernel both training paths and the encoder share:
    * best segmentation of one word under the current piece counts.
    *
    * Scoring runs in PRODUCT space on purpose: every operation is an
    * IEEE double multiply or divide — no ln/exp anywhere — so the
    * DuckDB oracle replays the loop bit-for-bit (transcendental
    * functions are the one primitive whose last-ulp behavior the two
    * engines do not share; products and quotients they do). The
    * price is underflow at long inputs, paid with the documented
    * UNIGRAM_WMAX cap: ≤32 pieces of probability ≥ 1/(Z+|V|) keep the
    * running product ≥ ~1e-200, far above the double subnormal
    * floor. prob(p) = (c_p + 1)/(Z + |V|) — add-one smoothing over
    * the FIXED seed vocabulary, so a piece abandoned by one EM round
    * can re-enter the next (and no path ever scores exactly 0).
    * Candidates iterate i ascending (longest piece first) and replace
    * only on STRICTLY greater score — the same total order as the
    * oracle's min(struct(-score, i)). Tokens are code points, like
    * the BPE trainer. */
  private[graft] def unigramViterbiPath(
      cps: Array[String], count: String => Long, d: Double)
      : List[String] = {
    val L = cps.length
    val dpSc = new Array[Double](L + 1)
    val dpPath = new Array[List[String]](L + 1)
    dpSc(0) = 1.0
    dpPath(0) = Nil
    var j = 1
    while (j <= L) {
      var bestSc = -1.0
      var bestI = -1
      var i = math.max(0, j - UNIGRAM_PMAX)
      while (i < j) {
        val piece = cps.slice(i, j).mkString
        val sc = dpSc(i) * ((count(piece) + 1L).toDouble / d)
        if (sc > bestSc) { bestSc = sc; bestI = i }
        i += 1
      }
      dpSc(j) = bestSc
      dpPath(j) = cps.slice(bestI, j).mkString :: dpPath(bestI)
      j += 1
    }
    dpPath(L).reverse
  }

  /** The hard-EM loop on a COLLECTED (word, cnt) table — the
    * [[bpeTrainMergesDriver]] twin: seed counts are every ≤PMAX-cp
    * substring weighted by word count; each round re-segments every
    * distinct word with [[unigramViterbiPath]] under the previous
    * round's counts and re-counts pieces along the winning paths
    * (integers — the doubles only steer path choices). Flat driver
    * CPU per round, no Spark jobs. */
  private[graft] def unigramTrainDriver(
      words0: Array[(String, Long)], rounds: Int): Array[(String, Long)] = {
    val words = words0.map { case (w, c) =>
      (w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))), c)
    }
    var counts = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (cps, c) =>
      var i = 0
      while (i < cps.length) {
        var l = 1
        while (l <= UNIGRAM_PMAX && i + l <= cps.length) {
          val p = cps.slice(i, i + l).mkString
          counts.update(p, counts.getOrElse(p, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    val seed = counts.keys.toArray
    var r = 0
    while (r < rounds) {
      val z = counts.valuesIterator.sum
      val dd = (z + seed.length).toDouble
      val prev = counts
      val next = scala.collection.mutable.HashMap.empty[String, Long]
      seed.foreach(p => next.update(p, 0L))
      words.foreach { case (cps, c) =>
        unigramViterbiPath(cps, p => prev.getOrElse(p, 0L), dd)
          .foreach(p => next.update(p, next(p) + c))
      }
      counts = next
      r += 1
    }
    seed.map(p => (p, counts(p)))
  }

  /** The unbounded-vocabulary fallback: the same EM with the
    * re-segmentation distributed — each round broadcasts the
    * vocab-bounded counts and runs ONE job (Viterbi per distinct
    * word map-side, piece re-count as a hash aggregate). Identical
    * arithmetic: the kernel is literally the same function. */
  private[graft] def unigramTrainDistributed(
      wc: DataFrame, rounds: Int): Array[(String, Long)] = {
    val s = wc.sparkSession
    // materialize the distinct-(word, cnt) table ONCE (eager
    // localCheckpoint, the BPE-trainer discipline): without it every
    // EM round re-runs the corpus scan + explode + groupBy shuffle —
    // R+1 corpus passes where the scale contract promises one
    val wcM = wc.localCheckpoint(true)
    try {
      val seedRows = wcM.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(1, least($UNIGRAM_PMAX,
           |                                   length(w) - i + 1)),
           |    l -> substr(w, i, l))))""".stripMargin)).as("p"))
        .groupBy(col("p")).agg(sum(col("cnt")).as("c"))
        .collect()
      var counts = seedRows.map(r => (r.getString(0), r.getLong(1)))
      val seed = counts.map(_._1)
      var r = 0
      while (r < rounds) {
        val z = counts.iterator.map(_._2).sum
        val dd = (z + seed.length).toDouble
        val bc = s.sparkContext.broadcast(counts.toMap)
        val pathUdf = udf { w: String =>
          val cps = w.codePoints().toArray
            .map(cp => new String(Character.toChars(cp)))
          unigramViterbiPath(cps, p => bc.value.getOrElse(p, 0L), dd)
        }
        val agg = wcM
          .select(col("cnt"), explode(pathUdf(col("w"))).as("p"))
          .groupBy(col("p")).agg(sum(col("cnt")).as("c"))
          .collect().map(r2 => (r2.getString(0), r2.getLong(1))).toMap
        bc.destroy() // R broadcast copies must not stack
        counts = seed.map(p => (p, agg.getOrElse(p, 0L)))
        r += 1
      }
      counts
    } finally org.apache.spark.sql.graftbridge.GraftExpr
      .releaseLocalCheckpoint(wcM)
  }

  /** Driver-gated dispatch, the [[bpeTrainMergesFrom]] idiom: the
    * distinct-word table collects under the same DRIVER_BPE_MAX cap
    * and the EM runs driver-locally (zero jobs per round); above the
    * cap the distributed loop runs unchanged. Words longer than
    * UNIGRAM_WMAX code points are excluded from TRAINING (the
    * product-space underflow guard — production trainers length-cap
    * their sentences the same way); the encoder still counts them
    * (code-point fallback). Returns the final counts over the full
    * seed vocabulary. */
  private[graft] def unigramTrainFrom(
      d: DataFrame,
      rounds: Int = UNIGRAM_ROUNDS,
      driverMax: Long = DRIVER_BPE_MAX): Array[(String, Long)] = {
    val wc = d.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0 &&
        length(col("w")) <= UNIGRAM_WMAX)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    if (driverMax > 0) {
      val cap = math.min(driverMax, (Int.MaxValue - 2).toLong).toInt
      val head = wc.limit(cap + 1).collect()
      if (head.length <= cap)
        return unigramTrainDriver(
          head.map(r => (r.getString(0), r.getLong(1))), rounds)
    }
    unigramTrainDistributed(wc, rounds)
  }

  /** Final unigram model per (JVM, corpus fingerprint) — session-free
    * driver data, so [[BuildMemo]]; shared by the train report and
    * the encoder. */
  private val unigramMemo =
    new graft.operators.BuildMemo[Array[(String, Long)]]()

  private def unigramModelFor(
      s: SparkSession, dir: String): Array[(String, Long)] = {
    val fp = graft.operators.IndexManifest.corpusFingerprint(dir, "documents")
    unigramMemo.getOrBuild(s"$dir|$fp|unigram", s.sparkContext) {
      MemoBuilds.record("unigram_model")
      unigramTrainFrom(documents(s, dir))
    }
  }

  /** text_unigram_train — the trained unigram tokenizer VOCABULARY:
    * top-32 pieces by final hard-EM count (ties break on the piece's
    * UTF-8 binary order, Spark's non-collated sort). Integer counts
    * and strings only — the Viterbi doubles steer path choices but
    * never reach the output. Full recompute oracle: the whole
    * R-round EM (seed → Viterbi re-segmentation → re-count) replays
    * in ONE DuckDB recursive CTE ([[textUnigramTrainSql]]) whose
    * state row is (round, position, counts LIST, per-word DP LIST) —
    * the DP advances one position per recursion step and a harvest
    * step re-counts, so the loop nest flattens into (R+1)·(maxlen+1)
    * linear steps. */
  def textUnigramTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val top = unigramModelFor(s, dir)
      .sortWith { case ((pa, ca), (pb, cb)) =>
        ca > cb || (ca == cb && utf8Lt(pa, pb)) }
      .take(UNIGRAM_VOCAB_OUT).zipWithIndex
      .map { case ((p, c), i) => (i + 1, p, c) }
    top.toSeq.toDF("rank", "piece", "cnt")
  }

  /** text_unigram_encode — the apply half: every document's words
    * segmented with the trained model (one more Viterbi sweep under
    * the FINAL counts), reported as tokens per language. Scale shape:
    * the model is a broadcast map and the Viterbi runs once per
    * DISTINCT (lang, word) — the corpus-size term is one word-count
    * aggregate. Words over the WMAX training cap count as code
    * points (the byte-fallback analog, documented above). */
  def textUnigramEncode(s: SparkSession, dir: String): DataFrame = {
    val m = unigramModelFor(s, dir)
    val z = m.iterator.map(_._2).sum
    val dd = (z + m.length).toDouble
    val bc = s.sparkContext.broadcast(m.toMap)
    val tokUdf = udf { w: String =>
      val nCp = w.codePointCount(0, w.length)
      if (nCp > UNIGRAM_WMAX) nCp.toLong
      else {
        val cps = w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp)))
        unigramViterbiPath(cps, p => bc.value.getOrElse(p, 0L), dd)
          .length.toLong
      }
    }
    documents(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("lang"), (col("cnt") * tokUdf(col("w"))).as("t"))
      .groupBy(col("lang")).agg(sum(col("t")).as("n_tokens"))
  }

  /** The EM state machine as shared oracle CTEs. State is ONE row
    * (rnd, pos, cl, ws): cl = the piece counts, ws = per-word DP
    * prefixes (score + path, product-space doubles — see the kernel
    * scaladoc for why no ln appears). pos < maxlen ⇒ a DP-advance
    * step (each word's best candidate over the ≤PMAX predecessor
    * positions, argmax = min(struct(-score, i)) exactly mirroring
    * the kernel's strict-> / first-i rule); pos = maxlen ⇒ a harvest
    * step (paths re-counted into cl, DP reset). Every computation
    * flows BOTTOM-UP through derived tables off the single recursive
    * reference — DuckDB rejects depth>1 correlated subqueries — and
    * the two global regroups carry HAVING count(*) > 0 so a filtered
    * final state terminates the recursion instead of looping a NULL
    * row forever. */
  private def unigramSqlCtes(rounds: Int): String =
    s"""uw AS (
       |  SELECT t.w AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents, unnest(string_split(text, ' ')) AS t(w)
       |  WHERE len(t.w) > 0 AND len(t.w) <= $UNIGRAM_WMAX
       |  GROUP BY t.w),
       |uml AS (SELECT coalesce(max(len(w)), 0) AS ml FROM uw),
       |useed AS (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
       |  FROM (
       |    SELECT substr(w, g.i, h.l) AS piece, cnt
       |    FROM uw,
       |      unnest(generate_series(1, len(w))) AS g(i),
       |      unnest(generate_series(1, $UNIGRAM_PMAX)) AS h(l)
       |    WHERE g.i + h.l - 1 <= len(w))
       |  GROUP BY piece),
       |ust(rnd, pos, cl, ws) AS (
       |  SELECT 0, 0,
       |    (SELECT list(struct_pack(p := piece, c := c) ORDER BY piece)
       |     FROM useed),
       |    (SELECT list(struct_pack(w := w, cnt := cnt,
       |        dp := [struct_pack(sc := CAST(1.0 AS DOUBLE),
       |                           path := CAST([] AS VARCHAR[]))])
       |        ORDER BY w)
       |     FROM uw)
       |  UNION ALL
       |  SELECT
       |    CASE WHEN pos < ml THEN rnd ELSE rnd + 1 END,
       |    CASE WHEN pos < ml THEN pos + 1 ELSE 0 END,
       |    CASE WHEN pos < ml THEN cl ELSE cl2 END,
       |    ws2
       |  FROM (
       |    SELECT any_value(rnd) AS rnd, any_value(pos) AS pos,
       |      any_value(ml) AS ml, any_value(cl) AS cl,
       |      any_value(ws2) AS ws2,
       |      list(struct_pack(p := pp, c := pc) ORDER BY pp) AS cl2
       |    FROM (
       |      SELECT l4.rnd AS rnd, l4.pos AS pos, l4.ml AS ml,
       |        l4.cl AS cl, l4.ws2 AS ws2, cp.x.p AS pp,
       |        CAST(coalesce(list_sum(list_transform(
       |          list_filter(l4.pairs, e -> e.pc = cp.x.p), e -> e.n)), 0)
       |          AS BIGINT) AS pc
       |      FROM (
       |        SELECT any_value(rnd) AS rnd, any_value(pos) AS pos,
       |          any_value(ml) AS ml, any_value(cl) AS cl,
       |          list(struct_pack(w := w, cnt := cnt, dp := dp2)
       |            ORDER BY w) AS ws2,
       |          flatten(list(hp)) AS pairs
       |        FROM (
       |          SELECT any_value(rnd) AS rnd, any_value(pos) AS pos,
       |            any_value(ml) AS ml, any_value(cl) AS cl,
       |            w, any_value(cnt) AS cnt,
       |            CASE
       |              WHEN any_value(pos) = any_value(ml) THEN
       |                [struct_pack(sc := CAST(1.0 AS DOUBLE),
       |                             path := CAST([] AS VARCHAR[]))]
       |              WHEN len(w) >= any_value(pos) + 1 THEN
       |                any_value(dp) || [struct_pack(
       |                  sc := -((min(cand) FILTER (WHERE cand IS NOT NULL)).ns),
       |                  path := (min(cand) FILTER (WHERE cand IS NOT NULL)).path)]
       |              ELSE any_value(dp)
       |            END AS dp2,
       |            CASE WHEN any_value(pos) = any_value(ml) THEN
       |              list_transform(any_value(dp)[len(w) + 1].path,
       |                q -> struct_pack(pc := q, n := any_value(cnt)))
       |            ELSE CAST([] AS STRUCT(pc VARCHAR, n BIGINT)[]) END AS hp
       |          FROM (
       |            SELECT l1.rnd AS rnd, l1.pos AS pos, l1.ml AS ml,
       |              l1.cl AS cl, l1.w AS w, l1.cnt AS cnt, l1.dp AS dp,
       |              CASE WHEN l1.pos < l1.ml AND len(l1.w) >= l1.pos + 1
       |                   AND cc.x.p =
       |                     substr(l1.w, ii.i + 1, l1.pos + 1 - ii.i)
       |              THEN struct_pack(
       |                ns := -(l1.dp[ii.i + 1].sc *
       |                  (CAST(cc.x.c + 1 AS DOUBLE) / l1.dd)),
       |                i := ii.i,
       |                path := l1.dp[ii.i + 1].path ||
       |                  [substr(l1.w, ii.i + 1, l1.pos + 1 - ii.i)])
       |              ELSE NULL END AS cand
       |            FROM (
       |              SELECT s.rnd AS rnd, s.pos AS pos, m.ml AS ml,
       |                s.cl AS cl,
       |                CAST(list_sum(list_transform(s.cl, y -> y.c))
       |                  + len(s.cl) AS DOUBLE) AS dd,
       |                u.x.w AS w, u.x.cnt AS cnt, u.x.dp AS dp
       |              FROM (SELECT * FROM ust WHERE rnd < $rounds) s, uml m,
       |                unnest(s.ws) u(x)
       |            ) l1,
       |            unnest(generate_series(
       |              greatest(l1.pos + 1 - $UNIGRAM_PMAX, 0),
       |              l1.pos)) AS ii(i),
       |            unnest(l1.cl) cc(x)
       |          ) GROUP BY w
       |        ) GROUP BY () HAVING count(*) > 0
       |      ) l4, unnest(l4.cl) cp(x)
       |    ) GROUP BY () HAVING count(*) > 0
       |  ))""".stripMargin

  val textUnigramTrainSql: String =
    s"""WITH RECURSIVE ${unigramSqlCtes(UNIGRAM_ROUNDS)},
       |ufin AS (SELECT cl FROM ust WHERE rnd IS NOT NULL
       |  ORDER BY rnd DESC, pos DESC LIMIT 1)
       |SELECT rank, piece, cnt FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY u.x.c DESC, u.x.p ASC)
       |      AS INT) AS rank,
       |    u.x.p AS piece, u.x.c AS cnt
       |  FROM ufin, unnest(ufin.cl) u(x)) r
       |WHERE rank <= $UNIGRAM_VOCAB_OUT ORDER BY rank""".stripMargin

  /** text_unigram_encode oracle: the trainer state machine run ONE
    * extra round (its advance sweep segments every word under the
    * FINAL counts); token counts join back to per-(lang, word)
    * multiplicities, >WMAX words counted as code points. */
  val textUnigramEncodeSql: String =
    s"""WITH RECURSIVE ${unigramSqlCtes(UNIGRAM_ROUNDS + 1)},
       |uenc AS (SELECT ws FROM ust WHERE rnd = $UNIGRAM_ROUNDS
       |  ORDER BY pos DESC LIMIT 1),
       |utok AS (SELECT u.x.w AS w,
       |    CAST(len(u.x.dp[len(u.x.w) + 1].path) AS BIGINT) AS toks
       |  FROM uenc, unnest(uenc.ws) u(x)),
       |uwl AS (SELECT lang, t.w AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents, unnest(string_split(text, ' ')) AS t(w)
       |  WHERE len(t.w) > 0 GROUP BY lang, t.w)
       |SELECT uwl.lang,
       |  CAST(sum(uwl.cnt * CASE WHEN len(uwl.w) > $UNIGRAM_WMAX
       |    THEN len(uwl.w) ELSE ut.toks END) AS BIGINT) AS n_tokens
       |FROM uwl LEFT JOIN utok ut ON ut.w = uwl.w
       |GROUP BY uwl.lang""".stripMargin

  /** text_tokenizer_fertility — the tokenizer SELECTION audit: both
    * trained tokenizers (the iterated-BPE encoder and the unigram-LM
    * encoder) run over the same corpus, compared per language on
    * fertility (tokens per whitespace word — the metric tokenizer
    * papers publish and the one that decides serving cost). One row
    * per language with both token totals, both fertilities, and the
    * integer-exact winner. Costs two broadcast-model encode passes
    * over the memoized trainers — nothing new is trained. Oracle:
    * the two full training+encode chains composed as derived tables
    * in one query (the aggHllPartitioned nesting precedent). */
  def textTokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val b = textBpeEncodeTrained(s, dir)
      .select(col("lang"), col("n_words"), col("n_bpe"))
    val u = textUnigramEncode(s, dir)
      .select(col("lang"), col("n_tokens").as("n_unigram"))
    b.join(u, Seq("lang"))
      .select(col("lang"), col("n_words"), col("n_bpe"), col("n_unigram"),
        round(col("n_bpe").cast("double") / col("n_words") + lit(1e-9), 4)
          .as("bpe_fertility"),
        round(col("n_unigram").cast("double") / col("n_words")
          + lit(1e-9), 4).as("unigram_fertility"),
        when(col("n_unigram") < col("n_bpe"), lit("unigram"))
          .when(col("n_bpe") < col("n_unigram"), lit("bpe"))
          .otherwise(lit("tie")).as("winner"))
  }

  val textTokenizerFertilitySql: String =
    // placeholder substitution AFTER stripMargin: the embedded
    // queries contain continuation lines that BEGIN with `||`, and a
    // second stripMargin pass would eat one pipe (list concat → a
    // binder error on `|`)
    """WITH b AS (SELECT lang, n_words, n_bpe
      |  FROM (%BPE%)),
      |u AS (SELECT lang, n_tokens AS n_unigram
      |  FROM (%UNI%))
      |SELECT b.lang, b.n_words, b.n_bpe, u.n_unigram,
      |  round(CAST(b.n_bpe AS DOUBLE) / b.n_words + 1e-9, 4)
      |    AS bpe_fertility,
      |  round(CAST(u.n_unigram AS DOUBLE) / b.n_words + 1e-9, 4)
      |    AS unigram_fertility,
      |  CASE WHEN u.n_unigram < b.n_bpe THEN 'unigram'
      |       WHEN b.n_bpe < u.n_unigram THEN 'bpe'
      |       ELSE 'tie' END AS winner
      |FROM b JOIN u ON b.lang = u.lang""".stripMargin
      .replace("%BPE%", textBpeEncodeTrainedSql)
      .replace("%UNI%", textUnigramEncodeSql)

  // ── snk_tokenizer_model — the persisted tokenizer artifact ──

  // BuildMemo, not a bare computeIfAbsent: the build runs multi-job
  // Spark work plus two parquet writes, and holding the map's bin
  // lock for that wall is exactly the pre-round-15 hazard LazyCell
  // exists to remove (a same-bin caller would block for the whole
  // build; a re-entrant access would deadlock). The root path is a
  // session-free artifact — BuildMemo's designed use.
  private val tokModelCache = new BuildMemo[String]()

  private[graft] def buildTokenizerModel(
      s: SparkSession, dir: String): String = {
    val fp = graft.operators.IndexManifest.corpusFingerprint(dir, "documents")
    tokModelCache.getOrBuild(s"$dir|$fp", s.sparkContext) {
      MemoBuilds.record("tokenizer_model")
      val root = java.nio.file.Files
        .createTempDirectory("graft-tokmodel").toString
      IndexManifest.registerTempRoot(root)
      buildTokenizerModelAt(s, dir, root)
    }
  }

  /** Write BOTH trained tokenizers (the BPE merge list and the
    * unigram-LM vocabulary) into a CALLER-CHOSEN durable root and
    * stamp it with a manifest — the production deployment contract
    * for tokenizer models: train once on the corpus snapshot, version
    * the artifact, serve everywhere. The manifest carries the corpus
    * fingerprint and every training constant a consumer's encode path
    * depends on; it lands LAST, so its presence marks a completed
    * build (the index-root discipline). */
  def buildTokenizerModelAt(
      s: SparkSession, dir: String, root: String): String = {
    import s.implicits._
    val fp = graft.operators.IndexManifest.corpusFingerprint(dir, "documents")
    bpeTrainMergesFor(s, dir)
      .toDF("round", "pair_a", "pair_b", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/merges")
    unigramModelFor(s, dir).toSeq
      .toDF("piece", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/unigram")
    IndexManifest.write(root, "tokenizer", Map(
      "bpe_rounds" -> BPE_TRAIN_ROUNDS.toString,
      "unigram_rounds" -> UNIGRAM_ROUNDS.toString,
      "unigram_pmax" -> UNIGRAM_PMAX.toString,
      "unigram_wmax" -> UNIGRAM_WMAX.toString,
      "corpus" -> dir,
      "corpus_fingerprint" -> fp))
    root
  }

  /** Reopen a durable tokenizer root — possibly from another session.
    * Verifies kind + the training constants (an encode path built for
    * other PMAX/WMAX would silently mis-tokenize), and REFUSES a
    * model whose corpus fingerprint no longer matches the live corpus
    * when `expectCurrentOf` is given — the PQ-sidecar staleness rule:
    * serving a stale tokenizer against regenerated data is the bug
    * this contract exists to catch. Pass None to open an archived
    * model deliberately (replaying an old training run). */
  def openTokenizerModel(
      s: SparkSession, root: String,
      expectCurrentOf: Option[String]): String = {
    val m = IndexManifest.open(root, "tokenizer", Map(
      "bpe_rounds" -> BPE_TRAIN_ROUNDS.toString,
      "unigram_rounds" -> UNIGRAM_ROUNDS.toString,
      "unigram_pmax" -> UNIGRAM_PMAX.toString,
      "unigram_wmax" -> UNIGRAM_WMAX.toString))
    expectCurrentOf.foreach { dir =>
      val now = graft.operators.IndexManifest
        .corpusFingerprint(dir, "documents")
      require(m.get("corpus_fingerprint").contains(now),
        s"tokenizer at $root is STALE: trained on fingerprint " +
          s"${m.getOrElse("corpus_fingerprint", "?")}, corpus at $dir " +
          s"is now $now — retrain (buildTokenizerModelAt) or open " +
          "without a freshness expectation to replay the archive")
    }
    root
  }

  /** snk_tokenizer_model — build the persisted tokenizer artifact and
    * audit WHAT LANDED ON DISK (both tables read back, not the memo):
    * merge-list cardinality and selection-count total, vocabulary
    * cardinality and final-count total. The oracle recomputes all
    * four from scratch by composing the BPE trainer CTE block with
    * the unigram EM state machine in one query — the artifact audit
    * is exactly as strong as the two training oracles it joins. */
  def snkTokenizerModel(s: SparkSession, dir: String): DataFrame = {
    val root = buildTokenizerModel(s, dir)
    val m = s.read.parquet(s"$root/merges")
      .agg(count(lit(1)).as("n_merges"),
        sum(col("cnt")).cast("long").as("merge_cnt_total"))
    val u = s.read.parquet(s"$root/unigram")
      .agg(count(lit(1)).as("n_pieces"),
        sum(col("cnt")).cast("long").as("piece_cnt_total"))
    m.crossJoin(u)
  }

  val snkTokenizerModelSql: String =
    s"""WITH RECURSIVE $bpeTrainSqlCtes,
       |${unigramSqlCtes(UNIGRAM_ROUNDS)},
       |ufin AS (SELECT cl FROM ust WHERE rnd IS NOT NULL
       |  ORDER BY rnd DESC, pos DESC LIMIT 1),
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS n_merges,
       |    CAST(sum(pcnt) AS BIGINT) AS merge_cnt_total
       |  FROM mr WHERE rk = 1),
       |uu AS (SELECT CAST(count(*) AS BIGINT) AS n_pieces,
       |    CAST(sum(u.x.c) AS BIGINT) AS piece_cnt_total
       |  FROM ufin, unnest(ufin.cl) u(x))
       |SELECT mm.n_merges, mm.merge_cnt_total, uu.n_pieces,
       |  uu.piece_cnt_total
       |FROM mm, uu""".stripMargin

  // ── pipeline_tokenize_pack — corpus → trained tokenizer → packed
  // training shards (VERDICT r15 task 3: the loop snk_tokenizer_model
  // and text_pack_sequences left open — nothing fed the PERSISTED
  // tokenizer's token ids into fixed-length sequences) ──

  /** Doc-boundary marker (code point 0 — never a text token). */
  private[graft] val PACK_EOS_ID = 0L
  /** Word separator: the SPACE code point, so the id stream is
    * LOSSLESSLY decodable back to the document text (tokens
    * concatenate, 32 decodes to ' ', 0 ends the doc) — the property
    * TokenizePackSpec replays. */
  private[graft] val PACK_SEP_ID = 32L
  /** Multi-char token ids live above every BMP code point: id =
    * PACK_ID_BASE + min merge rank whose product (pair_a || pair_b)
    * equals the token — a vocabulary DuckDB re-derives from the
    * trainer CTE block alone. */
  private[graft] val PACK_ID_BASE = 65536L

  /** The per-document id stream under the PERSISTED tokenizer:
    * exact greedy BPE per word ([[bpeTokensOf]] with the artifact's
    * ranked merge list), single-char tokens id'd by code point,
    * merged tokens by PACK_ID_BASE + merge rank, words separated by
    * PACK_SEP_ID, the document closed by PACK_EOS_ID. */
  private[operators] def packEncodeUdf(
      s: SparkSession, root: String)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val ranked = s.read.parquet(s"$root/merges")
      .select(col("round"), col("pair_a"), col("pair_b"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).zipWithIndex
    val rank = ranked
      .map { case ((_, pa, pb), i) => (pa + BSEP + pb) -> i }.toMap
    val prodId: Map[String, Long] = ranked
      .groupBy { case ((_, pa, pb), _) => pa + pb }
      .map { case (t, xs) => t -> (PACK_ID_BASE + xs.map(_._2).min) }
    val bR = s.sparkContext.broadcast(rank)
    val bP = s.sparkContext.broadcast(prodId)
    udf { text: String =>
      val words =
        if (text == null) Array("") else text.split(" ", -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var wi = 0
      while (wi < words.length) {
        val toks = bpeTokensOf(words(wi), bR.value, BSEP)
        var ti = 0
        while (ti < toks.length) {
          val t = toks(ti)
          out += (if (t.codePointCount(0, t.length) == 1)
            t.codePointAt(0).toLong
          else bP.value.getOrElse(t, -1L))
          ti += 1
        }
        out += (if (wi == words.length - 1) PACK_EOS_ID else PACK_SEP_ID)
        wi += 1
      }
      out.toArray
    }
  }

  /** pipeline_tokenize_pack — the end-to-end corpus → tokenizer →
    * packed-shards chain a training run actually consumes: open the
    * persisted tokenizer (STALENESS-CHECKED — a model trained on an
    * older corpus snapshot refuses to serve, the snk_tokenizer_model
    * contract), encode every document to token ids, lay the id
    * streams out in the text_pack_sequences (lang, shard) hash order,
    * cut every PACK_BUDGET ids into fixed-length training sequences,
    * LAND them partitioned by (lang, shard) with one id-array row per
    * sequence (the snk_train_shards layout), and audit WHAT LANDED:
    * per sequence, its length, how many documents start in it, and a
    * position-weighted checksum Σ id·(pos+1) that pins every id and
    * its position — a dropped token, a swapped pair, or a shifted
    * boundary moves it.
    *
    * Oracle: the BPE trainer CTE block + the greedy-encode recursion
    * + the packing window composed in ONE DuckDB query — the whole
    * chain (training, encoding, ids, layout, cuts) recomputed from
    * documents alone.
    *
    * Scale shape: the merge list is a ≤16-entry broadcast; encoding
    * is map-side; the layout window is the text_pack_sequences
    * per-(lang, shard) running sum over DOC-level rows; no
    * token-level window or sort anywhere — each token's global
    * position derives from its doc's start + its in-doc offset — but
    * ONE bounded exchange does move token rows: the
    * `groupBy(lang, shard, seq_id)` sequence assembly (partial
    * ObjectHashAggregate buffers carry the ids), the irreducible cost
    * of co-locating a sequence's tokens for packing (9× wall at 100×
    * data in the sf10 probe). The land is one file per leaf.
    */
  def pipelineTokenizePack(s: SparkSession, dir: String): DataFrame =
    pipelineTokenizePackWith(s, dir, buildTokenizerModel(s, dir))

  private val tokpackRootMemo = new BuildMemo[String]()

  /** The explicit-root form: packs `dir` under the tokenizer at
    * `root`, REFUSING a stale artifact (openTokenizerModel with the
    * freshness expectation — TokenizePackSpec pins the refusal). */
  private[operators] def pipelineTokenizePackWith(
      s: SparkSession, dir: String, modelRoot: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val root = openTokenizerModel(s, modelRoot, Some(dir))
    val encode = packEncodeUdf(s, root)
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("bucket"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // (A fan-out of the encode UDF + a pinned (lang, shard) exchange
    // was tried and reverted: the pack window stage, not the encode,
    // dominates, and the extra exchange measured a net wash at
    // sf0.1.)
    val toks = documents(s, dir)
      .select(col("doc_id"), col("lang"), encode(col("text")).as("ids"),
        packBucket(col("doc_id")).as("bucket"))
      .withColumn("shard", col("bucket") % PACK_SHARDS)
      .withColumn("n", size(col("ids")).cast("long"))
      .withColumn("start", sum(col("n")).over(w) - col("n"))
      .select(col("doc_id"), col("lang"), col("shard"), col("start"),
        posexplode(col("ids")).as(Seq("pos", "id")))
      .withColumn("gpos", col("start") + col("pos"))
      .select(col("lang"), col("shard"),
        (col("gpos") / PACK_BUDGET).cast("long").as("seq_id"),
        (col("gpos") % PACK_BUDGET).as("pos_in_seq"), col("id"),
        (col("pos") === 0).cast("long").as("is_doc_start"))
    val seqs = toks
      .groupBy(col("lang"), col("shard"), col("seq_id"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("pos_in_seq"), col("id")))),
          x => x.getField("id")).as("ids"),
        sum(col("is_doc_start")).as("n_docs_started"))
    // packed-shard root memoized per (corpus fingerprint, model root)
    // and manifest-registered like the other fixture builds (r16
    // advisory: a fresh unregistered temp dir leaked per invocation);
    // the MEASURED qid cost is the read-back audit below
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    val path = tokpackRootMemo.getOrBuild(
      s"$dir|$fp|$modelRoot", s.sparkContext) {
      MemoBuilds.record("tokpack_shards")
      val p = java.nio.file.Files
        .createTempDirectory("graft-tokpack").toString
      IndexManifest.registerTempRoot(p)
      val packed = p + "/packed"
      seqs
        .repartition(col("lang"), col("shard"))
        .sortWithinPartitions(col("lang"), col("shard"), col("seq_id"))
        .write.partitionBy("lang", "shard").parquet(packed)
      packed
    }
    // audit FROM THE FILES (the snk_tokenizer_model discipline: what
    // landed, not what the memo holds)
    s.read.parquet(path)
      .select(col("lang"), col("shard"), col("seq_id"),
        size(col("ids")).cast("long").as("n_tokens"),
        col("n_docs_started"),
        aggregate(
          zip_with(col("ids"),
            sequence(lit(1L), size(col("ids")).cast("long")),
            (x, i) => x * i),
          lit(0L), (acc, x) => acc + x).as("checksum"))
  }

  /** The whole chain in one query: trainer CTEs → ranked merges →
    * per-distinct-word greedy encode (QUALIFY keeps the fixed point)
    * → token ids → per-doc offsets → the pack window → per-sequence
    * audit. Integer arithmetic end to end. */
  val pipelineTokenizePackSql: String =
    s"""WITH RECURSIVE $bpeTrainSqlCtes,
       |pmerges AS (
       |  SELECT pa, pb, CAST(it AS INT) AS rank FROM mr WHERE rk = 1),
       |prm AS (
       |  SELECT map_from_entries(list(
       |    struct_pack(k := pa || chr(31) || pb, v := rank))) AS m
       |  FROM pmerges),
       |pprod AS (
       |  SELECT pa || pb AS t, $PACK_ID_BASE + min(rank) AS pid
       |  FROM pmerges GROUP BY 1),
       |pdocw AS (
       |  SELECT doc_id, lang, g.i AS wpos, ws[g.i] AS w, len(ws) AS nw
       |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
       |        FROM documents),
       |    unnest(generate_series(1, len(ws))) AS g(i)),
       |pdw AS (SELECT DISTINCT w FROM pdocw),
       |pinit AS (
       |  SELECT w,
       |    list_transform(generate_series(1, len(w)), i -> substr(w, i, 1))
       |      AS toks
       |  FROM pdw),
       |pest AS (
       |  SELECT w, toks FROM pinit
       |  UNION ALL
       |  SELECT w,
       |    list_slice(toks, 1, b - 1)
       |      || [toks[b] || toks[b + 1]]
       |      || list_slice(toks, b + 2, len(toks)) AS toks
       |  FROM (
       |    SELECT w, toks,
       |      CASE WHEN list_min(rl) < 2147483647
       |           THEN list_position(rl, list_min(rl)) ELSE NULL END AS b
       |    FROM (
       |      SELECT e.w, e.toks,
       |        list_transform(generate_series(1, len(e.toks) - 1),
       |          i -> coalesce(map_extract(prm.m,
       |                 e.toks[i] || chr(31) || e.toks[i + 1])[1],
       |               2147483647)) AS rl
       |      FROM pest e, prm
       |      WHERE len(e.toks) > 1)
       |  ) WHERE b IS NOT NULL),
       |pfin AS (
       |  SELECT w, toks FROM pest
       |  QUALIFY row_number() OVER (PARTITION BY w
       |    ORDER BY len(toks)) = 1),
       |pwtok AS (
       |  SELECT f.w, g.i AS tpos, f.toks[g.i] AS t
       |  FROM pfin f, unnest(generate_series(1, len(f.toks))) AS g(i)),
       |pwid AS (
       |  SELECT k.w, k.tpos,
       |    CAST(CASE WHEN len(k.t) = 1 THEN unicode(k.t)
       |         ELSE p.pid END AS BIGINT) AS id
       |  FROM pwtok k LEFT JOIN pprod p ON p.t = k.t),
       |pflen AS (SELECT w, len(toks) AS cw FROM pfin),
       |pdst AS (
       |  SELECT d.doc_id, d.lang, d.wpos, d.w, d.nw, f.cw
       |  FROM pdocw d JOIN pflen f ON f.w = d.w),
       |pdcum AS (
       |  SELECT doc_id, lang, wpos, w, nw, cw,
       |    CAST(sum(cw + 1) OVER (PARTITION BY doc_id ORDER BY wpos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      - (cw + 1) AS BIGINT) AS woff
       |  FROM pdst),
       |pdtot AS (
       |  SELECT doc_id, lang, CAST(sum(cw + 1) AS BIGINT) AS n
       |  FROM pdst GROUP BY 1, 2),
       |ppack AS (
       |  SELECT doc_id, lang, bucket % $PACK_SHARDS AS shard, n,
       |    CAST(sum(n) OVER (PARTITION BY lang, bucket % $PACK_SHARDS
       |      ORDER BY bucket, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
       |      AS BIGINT) AS start
       |  FROM (SELECT doc_id, lang, n,
       |      CAST('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 6)
       |        AS BIGINT) AS bucket
       |    FROM pdtot)),
       |pstream AS (
       |  SELECT p.lang, p.shard, p.start + d.woff + i.tpos - 1 AS gpos,
       |    i.id
       |  FROM pdcum d
       |  JOIN ppack p ON p.doc_id = d.doc_id
       |  JOIN pwid i ON i.w = d.w
       |  UNION ALL
       |  SELECT p.lang, p.shard, p.start + d.woff + d.cw AS gpos,
       |    CAST(CASE WHEN d.wpos < d.nw THEN $PACK_SEP_ID
       |         ELSE $PACK_EOS_ID END AS BIGINT) AS id
       |  FROM pdcum d
       |  JOIN ppack p ON p.doc_id = d.doc_id),
       |pstarts AS (
       |  SELECT lang, shard, CAST(start // $PACK_BUDGET AS BIGINT)
       |      AS seq_id,
       |    CAST(count(*) AS BIGINT) AS n_docs_started
       |  FROM ppack GROUP BY 1, 2, 3),
       |pagg AS (
       |  SELECT lang, shard, CAST(gpos // $PACK_BUDGET AS BIGINT)
       |      AS seq_id,
       |    CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(id * (gpos % $PACK_BUDGET + 1)) AS BIGINT)
       |      AS checksum
       |  FROM pstream GROUP BY 1, 2, 3)
       |SELECT a.lang, CAST(a.shard AS BIGINT) AS shard, a.seq_id,
       |  a.n_tokens,
       |  CAST(coalesce(s.n_docs_started, 0) AS BIGINT) AS n_docs_started,
       |  a.checksum
       |FROM pagg a LEFT JOIN pstarts s
       |  ON s.lang = a.lang AND s.shard = a.shard AND s.seq_id = a.seq_id""".stripMargin

  /** Interpolation weight of the bigram term in text_bigram_logprob:
    * score = avg log(λ·P(b|a) + (1−λ)·P(b)) — Jelinek-Mercer
    * smoothing, the unigram back-off keeping unseen-context pairs
    * finite. */
  private val BIGRAM_LAMBDA = 0.7

  /** text_bigram_logprob — corpus-LM perplexity scoring one order up
    * from text_unigram_logprob: per-doc mean log-likelihood under an
    * interpolated bigram model estimated from the corpus itself (the
    * CCNet/KenLM-style quality signal — boilerplate and gibberish
    * score low). Docs with <2 tokens carry no bigram and drop out on
    * both engines.
    *
    * Scale shape: bigram generation is ONE zip_with over the bound
    * split array (no O(n²) re-split — see BENCH_LOCAL.md on
    * text_cooccurrence); vocab estimation is two map-side-combined
    * hash aggs. Scoring joins occurrences against the vocabs —
    * broadcast here; at 100 TB the bigram vocab outgrows a broadcast
    * and AQE falls back to a shuffle join on the SAME plan, with the
    * occurrence side already partitioned by pair from the count
    * stage. */
  def textBigramLogprob(s: SparkSession, dir: String): DataFrame = {
    val base = documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val toks = base
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .filter(length(col("w")) > 0)
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val tot = uni.agg(sum(col("n_w")).as("n_tot"))
    val bi = base
      .select(col("doc_id"), explode(adjacentPairs(col("ws"))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .filter(length(col("a")) > 0 && length(col("b")) > 0)
    val bv = bi.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    // NO broadcast hints on the vocab joins: an explicit hint is
    // never demoted, and the bigram vocab is corpus-scale. Unhinted,
    // AQE broadcasts them at runtime while they fit and degrades to a
    // shuffle join (already partitioned by the count stage's keys)
    // when they don't. tot is a 1-row aggregate — always safe.
    bi
      .join(bv, Seq("a", "b"))
      .join(uni.select(col("w").as("a"), col("n_w").as("n_a")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("n_w").as("n_b")), Seq("b"))
      .join(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(
        round(avg(log(
          lit(BIGRAM_LAMBDA) * col("n_ab") / col("n_a") +
            lit(1.0 - BIGRAM_LAMBDA) * col("n_b") / col("n_tot")))
          + lit(1e-9), 4).as("avg_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  val textBigramLogprobSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |toks AS (
       |  SELECT doc_id, t.w FROM d, unnest(ws) AS t(w) WHERE len(t.w) > 0),
       |uni AS (SELECT w, count(*) AS n_w FROM toks GROUP BY w),
       |tot AS (SELECT sum(n_w) AS n_tot FROM uni),
       |bi AS (
       |  SELECT doc_id, ws[g.i] AS a, ws[g.i + 1] AS b
       |  FROM d, unnest(generate_series(1, len(ws) - 1)) AS g(i)
       |  WHERE len(ws[g.i]) > 0 AND len(ws[g.i + 1]) > 0),
       |bv AS (SELECT a, b, count(*) AS n_ab FROM bi GROUP BY a, b)
       |SELECT doc_id,
       |  round(avg(ln(
       |    $BIGRAM_LAMBDA * CAST(n_ab AS DOUBLE) / ua.n_w +
       |    ${1.0 - BIGRAM_LAMBDA} * CAST(ub.n_w AS DOUBLE) / n_tot))
       |    + 1e-9, 4) AS avg_logprob,
       |  count(*) AS n_bigrams
       |FROM bi
       |JOIN bv USING (a, b)
       |JOIN uni ua ON bi.a = ua.w
       |JOIN uni ub ON bi.b = ub.w
       |CROSS JOIN tot
       |GROUP BY doc_id""".stripMargin

  /** Absolute discount of text_ppl_kn (the published Kneser-Ney
    * default). */
  private val KN_DISCOUNT = 0.75

  /** Rounded-NLL admission threshold of text_ppl_kn (the
    * PPL_KEEP_NLL discipline: keep decided on the 4-dp rounded value
    * so the flag can never disagree on a sub-rounding wobble). */
  private val KN_KEEP_NLL = 3.42

  /** text_ppl_kn — the perplexity gate under interpolated KNESER-NEY
    * smoothing, the published standard the production filters
    * actually ship (CCNet's KenLM models are modified-KN; this is
    * single-discount KN at bigram order): absolute discount D=0.75
    * off every seen bigram, the freed mass D·N1+(a,·)/c(a) backing
    * off to the CONTINUATION probability N1+(·,b)/|bigram types| —
    * "how many contexts does b complete" — rather than raw unigram
    * frequency, which is the insight that demotes Francisco-style
    * words frequent only inside one collocation. One documented
    * deviation for the OOV floor: continuation counts are add-one
    * smoothed over (types + vocab + 1) so an unseen continuation
    * scores finite mass (the textPplFilter floor discipline, not
    * KN's unigram-order recursion). Unseen CONTEXTS back off to the
    * continuation distribution alone.
    *
    * Same plan shape as text_ppl_filter: train-split hash aggs
    * (bigram table, context totals c(a) + N1+(a,·), continuation
    * N1+(·,b), two scalar stats), model-sized joins onto the scoring
    * bigrams, one per-doc partial agg. Nothing corpus-sized shuffles
    * beyond the bigram explode both gates already pay. */
  def textPplKn(s: SparkSession, dir: String): DataFrame =
    textPplKnFrom(documents(s, dir))

  /** Fixture-drivable core — expects (doc_id, text). */
  private[graft] def textPplKnFrom(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val train = base.filter(pmod(col("doc_id"), lit(10)) < 7)
    val vocab = train
      .select(explode(col("ws")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(countDistinct(col("w")).as("v"))
    def pairs(df: DataFrame) = df
      .select(col("doc_id"), explode(adjacentPairs(col("ws"))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .filter(length(col("a")) > 0 && length(col("b")) > 0)
    val bv = pairs(train)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val ctx = bv.groupBy(col("a"))
      .agg(sum(col("n_ab")).as("c_a"), count(lit(1)).as("n1f"))
    val cont = bv.groupBy(col("b")).agg(count(lit(1)).as("n1b"))
    val tt = bv.agg(count(lit(1)).as("t"))
    val pcont = (coalesce(col("n1b"), lit(0L)) + lit(1)).cast("double") /
      (col("t") + col("v") + lit(1)).cast("double")
    val p = when(col("c_a").isNotNull,
      (greatest(coalesce(col("n_ab"), lit(0L)) - lit(KN_DISCOUNT),
        lit(0.0)) + lit(KN_DISCOUNT) * col("n1f") * pcont) / col("c_a"))
      .otherwise(pcont)
    pairs(base)
      .join(bv, Seq("a", "b"), "left")
      .join(ctx, Seq("a"), "left")
      .join(cont, Seq("b"), "left")
      .join(broadcast(tt)).join(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(round(-avg(log(p)) + lit(1e-9), 4).as("nll"),
        count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("nll"),
        (col("nll") <= KN_KEEP_NLL).as("keep"))
  }

  val textPplKnSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |tw AS (SELECT t.w FROM d, unnest(ws) AS t(w)
       |  WHERE ((doc_id % 10) + 10) % 10 < 7 AND len(t.w) > 0),
       |voc AS (SELECT count(DISTINCT w) AS v FROM tw),
       |bi AS (SELECT doc_id, ws[g.i] AS a, ws[g.i + 1] AS b
       |  FROM d, unnest(generate_series(1, len(ws) - 1)) AS g(i)
       |  WHERE len(ws[g.i]) > 0 AND len(ws[g.i + 1]) > 0),
       |bv AS (SELECT a, b, count(*) AS n_ab FROM bi
       |  WHERE ((doc_id % 10) + 10) % 10 < 7 GROUP BY a, b),
       |ctx AS (SELECT a, sum(n_ab) AS c_a, count(*) AS n1f
       |  FROM bv GROUP BY a),
       |cont AS (SELECT b, count(*) AS n1b FROM bv GROUP BY b),
       |tt AS (SELECT count(*) AS t FROM bv),
       |sc AS (
       |  SELECT bi.doc_id,
       |    CASE WHEN ctx.c_a IS NOT NULL THEN
       |      (greatest(coalesce(bv.n_ab, 0) - $KN_DISCOUNT, 0.0)
       |       + $KN_DISCOUNT * ctx.n1f *
       |         (CAST(coalesce(cont.n1b, 0) + 1 AS DOUBLE)
       |          / (tt.t + voc.v + 1)))
       |      / ctx.c_a
       |    ELSE CAST(coalesce(cont.n1b, 0) + 1 AS DOUBLE)
       |      / (tt.t + voc.v + 1)
       |    END AS p
       |  FROM bi
       |  LEFT JOIN bv USING (a, b)
       |  LEFT JOIN ctx ON bi.a = ctx.a
       |  LEFT JOIN cont ON bi.b = cont.b
       |  CROSS JOIN tt CROSS JOIN voc)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  round(-avg(ln(p)) + 1e-9, 4) AS nll,
       |  (round(-avg(ln(p)) + 1e-9, 4) <= $KN_KEEP_NLL) AS keep
       |FROM sc GROUP BY doc_id""".stripMargin

  /** Interpolation weight of the bigram term in text_ppl_filter. */
  private val PPL_LAMBDA = 0.8

  /** Rounded-NLL admission threshold of text_ppl_filter: keep is
    * decided on the 4-dp ROUNDED value so the flag can never disagree
    * between engine and oracle on a sub-rounding float wobble. */
  private val PPL_KEEP_NLL = 3.4

  /** text_ppl_filter — the CCNet/GPT-3 perplexity gate: train a
    * bigram LM on the held-out TRAIN split (doc_id%10 < 7), score
    * EVERY document (train and not) under it, and flag high-perplexity
    * docs for removal. Differs from text_bigram_logprob in the one way
    * that matters for curation: the model is trained on a SPLIT, so
    * scored docs contain genuinely unseen words/bigrams and the
    * smoothing floor (add-one unigram over the train vocab, uniform
    * mass for out-of-vocabulary words) is load-bearing, not
    * decorative — text_bigram_logprob's whole-corpus inner joins
    * would silently drop every unseen bigram here.
    *
    * Scale shape: identical to text_bigram_logprob — two token aggs
    * over the train split, bigram fan-out over the corpus, vocab
    * joins left unhinted for AQE, one 1-row broadcast of
    * (n_tot, |V|). Docs with fewer than two nonempty tokens are
    * unscorable and absent by design. */
  def textPplFilter(s: SparkSession, dir: String): DataFrame = {
    val base = documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val trainToks = base.filter(pmod(col("doc_id"), lit(10)) < 7)
      .select(explode(col("ws")).as("w"))
      .filter(length(col("w")) > 0)
    val uni = trainToks.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val stats = uni.agg(sum(col("n_w")).as("n_tot"),
      count(lit(1)).as("n_vocab"))
    def pairs(df: DataFrame) = df
      .select(col("doc_id"), explode(adjacentPairs(col("ws"))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .filter(length(col("a")) > 0 && length(col("b")) > 0)
    val bv = pairs(base.filter(pmod(col("doc_id"), lit(10)) < 7))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val nll = pairs(base)
      .join(bv, Seq("a", "b"), "left")
      .join(uni.select(col("w").as("a"), col("n_w").as("n_a")), Seq("a"), "left")
      .join(uni.select(col("w").as("b"), col("n_w").as("n_b")), Seq("b"), "left")
      .join(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(
        round(-avg(log(
          lit(PPL_LAMBDA) *
            coalesce(col("n_ab").cast("double") / col("n_a"), lit(0.0)) +
            lit(1.0 - PPL_LAMBDA) *
              (coalesce(col("n_b"), lit(0L)) + lit(1)).cast("double") /
              (col("n_tot") + col("n_vocab") + lit(1)).cast("double")))
          + lit(1e-9), 4).as("nll"),
        count(lit(1)).as("n_bigrams"))
    nll.select(col("doc_id"), col("n_bigrams"), col("nll"),
      round(exp(col("nll")) + lit(1e-9), 4).as("ppl"),
      (col("nll") <= PPL_KEEP_NLL).as("keep"))
  }

  val textPplFilterSql: String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |ttk AS (
       |  SELECT t.w FROM d, unnest(ws) AS t(w)
       |  WHERE ((doc_id % 10) + 10) % 10 < 7 AND len(t.w) > 0),
       |uni AS (SELECT w, count(*) AS n_w FROM ttk GROUP BY w),
       |st AS (SELECT sum(n_w) AS n_tot, count(*) AS n_vocab FROM uni),
       |bi AS (
       |  SELECT doc_id, ws[g.i] AS a, ws[g.i + 1] AS b
       |  FROM d, unnest(generate_series(1, len(ws) - 1)) AS g(i)
       |  WHERE len(ws[g.i]) > 0 AND len(ws[g.i + 1]) > 0),
       |bv AS (SELECT a, b, count(*) AS n_ab FROM bi
       |       WHERE ((doc_id % 10) + 10) % 10 < 7 GROUP BY a, b),
       |n AS (
       |  SELECT doc_id,
       |    round(-avg(ln(
       |      $PPL_LAMBDA *
       |        coalesce(CAST(n_ab AS DOUBLE) / ua.n_w, 0.0) +
       |      ${1.0 - PPL_LAMBDA} *
       |        CAST(coalesce(ub.n_w, 0) + 1 AS DOUBLE) /
       |        CAST(n_tot + n_vocab + 1 AS DOUBLE)))
       |      + 1e-9, 4) AS nll,
       |    count(*) AS n_bigrams
       |  FROM bi
       |  LEFT JOIN bv USING (a, b)
       |  LEFT JOIN uni ua ON bi.a = ua.w
       |  LEFT JOIN uni ub ON bi.b = ub.w
       |  CROSS JOIN st
       |  GROUP BY doc_id)
       |SELECT doc_id, n_bigrams, nll,
       |  round(exp(nll) + 1e-9, 4) AS ppl,
       |  (nll <= $PPL_KEEP_NLL) AS keep
       |FROM n""".stripMargin

  /** text_sentence_dedup — intra-document repeated-sentence scrub:
    * boilerplate (cookie banners, navigation crumbs, SEO spam) repeats
    * the same sentence inside one document; keep each sentence's FIRST
    * occurrence, reassemble the document in order, report the drop
    * count. Complements dedup_common_spans (which scrubs spans shared
    * ACROSS documents) with the per-document pass C4-style cleaners
    * run first. Sentence boundaries reuse fn_sentence_split's regex.
    *
    * Scale shape: per-document state only — one window keyed
    * (doc_id, sentence) for first-occurrence ranking and one doc-keyed
    * agg for reassembly; both shuffles carry doc-sized groups, so
    * skew is bounded by the longest document, not the corpus. */
  def textSentenceDedup(s: SparkSession, dir: String): DataFrame =
    textSentenceDedupFrom(documents(s, dir))

  /** Fixture-drivable core (doc_id, text). */
  private[graft] def textSentenceDedupFrom(docs: DataFrame): DataFrame = {
    val sents = docs
      .select(col("doc_id"),
        posexplode(expr(s"regexp_extract_all(text, '$SENT_RE', 0)"))
          .as(Seq("pos", "raw")))
      .select(col("doc_id"), col("pos"), trim(col("raw")).as("sent"))
      .filter(length(col("sent")) > 0)
    val w = Window.partitionBy(col("doc_id"), col("sent"))
      .orderBy(col("pos"))
    sents
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(
        // collect_list skips the nulls the when() leaves for rn>1
        array_join(transform(array_sort(collect_list(
          when(col("rn") === 1, struct(col("pos"), col("sent"))))),
          x => x.getField("sent")), " ").as("text_clean"),
        count(when(col("rn") === 1, lit(1))).as("n_kept"),
        count(when(col("rn") > 1, lit(1))).as("n_dropped"))
  }

  val textSentenceDedupSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, regexp_extract_all(text, '$SENT_RE') AS sents
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, u.i AS pos, trim(sents[u.i]) AS sent
      |  FROM t, unnest(generate_series(1, len(sents))) AS u(i)),
      |f AS (
      |  SELECT doc_id, pos, sent,
      |    row_number() OVER (PARTITION BY doc_id, sent ORDER BY pos) AS rn
      |  FROM x WHERE len(sent) > 0)
      |SELECT doc_id,
      |  string_agg(sent, ' ' ORDER BY pos) FILTER (WHERE rn = 1)
      |    AS text_clean,
      |  count(*) FILTER (WHERE rn = 1) AS n_kept,
      |  count(*) FILTER (WHERE rn > 1) AS n_dropped
      |FROM f GROUP BY doc_id""".stripMargin

  /** text_line_dedup_global — CROSS-document line dedup, the
    * RefinedWeb/FineWeb pass text_sentence_dedup (intra-doc) does not
    * cover: boilerplate repeated across the corpus ("All rights
    * reserved.", cookie banners) keeps only its globally FIRST
    * occurrence (min (doc_id, pos)); every other document loses the
    * line and is reassembled in order.
    *
    * Scale shape: the winner per sentence comes from groupBy(sent)
    * .min(okey) — a PARTIAL-AGGREGATING shuffle (map-side combine
    * collapses each hot sentence to one row per task), NOT a window
    * over the sentence key, where one "Home" sentence appearing 10 M
    * times would pile into a single reducer group. The join back is a
    * plain equi-join on sent, and reassembly shuffles doc-sized
    * groups. okey packs (doc_id, pos) into one BIGINT so min() stays
    * a single-column agg. */
  def textLineDedupGlobal(s: SparkSession, dir: String): DataFrame =
    textLineDedupGlobalFrom(documents(s, dir))

  /** Fixture-drivable core (doc_id, text). */
  private[graft] def textLineDedupGlobalFrom(docs: DataFrame): DataFrame = {
    val sents = docs
      .select(col("doc_id"),
        posexplode(expr(s"regexp_extract_all(text, '$SENT_RE', 0)"))
          .as(Seq("pos", "raw")))
      .select(col("doc_id"), col("pos"), trim(col("raw")).as("sent"))
      .filter(length(col("sent")) > 0)
      // pos < 2^20 (a million-sentence doc is a parse bug, and the
      // pack below needs the bound); okey = doc_id * 2^20 + pos
      .filter(col("pos") < 1048576)
      .withColumn("okey", col("doc_id") * lit(1048576L) + col("pos"))
    val winners = sents.groupBy(col("sent"))
      .agg(min(col("okey")).as("first_key"))
    sents.join(winners, Seq("sent"))
      .withColumn("keep", col("okey") === col("first_key"))
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(
          when(col("keep"), struct(col("pos"), col("sent"))))),
          x => x.getField("sent")), " ").as("text_clean"),
        count(when(col("keep"), lit(1))).as("n_kept"),
        count(when(!col("keep"), lit(1))).as("n_dropped"))
  }

  val textLineDedupGlobalSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, regexp_extract_all(text, '$SENT_RE') AS sents
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, u.i - 1 AS pos, trim(sents[u.i]) AS sent
      |  FROM t, unnest(generate_series(1, len(sents))) AS u(i)),
      |f AS (
      |  SELECT doc_id, pos, sent, doc_id * 1048576 + pos AS okey
      |  FROM x WHERE len(sent) > 0 AND pos < 1048576),
      |w AS (SELECT sent, min(okey) AS first_key FROM f GROUP BY sent)
      |SELECT f.doc_id,
      |  coalesce(string_agg(f.sent, ' ' ORDER BY f.pos)
      |    FILTER (WHERE f.okey = w.first_key), '') AS text_clean,
      |  count(*) FILTER (WHERE f.okey = w.first_key) AS n_kept,
      |  count(*) FILTER (WHERE f.okey <> w.first_key) AS n_dropped
      |FROM f JOIN w USING (sent)
      |GROUP BY f.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_sentence_dedup" -> (textSentenceDedup _),
    "text_line_dedup_global" -> (textLineDedupGlobal _),
    "text_bpe_pairs" -> (textBpePairs _),
    "text_bpe_encode" -> (textBpeEncode _),
    "text_bpe_train" -> (textBpeTrain _),
    "text_unigram_train" -> (textUnigramTrain _),
    "text_unigram_encode" -> (textUnigramEncode _),
    "snk_tokenizer_model" -> (snkTokenizerModel _),
    "pipeline_tokenize_pack" -> (pipelineTokenizePack _),
    "text_tokenizer_fertility" -> (textTokenizerFertility _),
    "text_bpe_encode_trained" -> (textBpeEncodeTrained _),
    "text_bigram_logprob" -> (textBigramLogprob _),
    "text_ppl_filter" -> (textPplFilter _),
    "text_ppl_kn" -> (textPplKn _),
    "fn_unicode_normalize" -> (fnUnicodeNormalize _),
    "fn_sentence_split" -> (fnSentenceSplit _),
    "text_cooccurrence" -> (textCooccurrence _),
    "agg_ks_drift" -> (aggKsDrift _),
    "win_quality_cdf" -> (winQualityCdf _),
    "text_entropy" -> (textEntropy _),
    "text_length_histogram" -> (textLengthHistogram _),
    "text_pack_sequences" -> (textPackSequences _),
    "text_html_strip" -> (textHtmlStrip _),
    "text_mixture_card" -> (textMixtureCard _),
    "text_quality_decile" -> (textQualityDecile _),
    "text_unigram_logprob" -> (textUnigramLogprob _),
    "text_chunk" -> (textChunk _),
    "text_repetition" -> (textRepetition _),
    "text_gopher_rules" -> (textGopherRules _),
    "text_token_count" -> (textTokenCount _),
    "text_quality_filter" -> (textQualityFilter _),
    "text_pii_scrub" -> (textPiiScrub _),
    "text_stats" -> (textStats _),
    "text_tokens_tf" -> (textTokensTf _),
    "text_quality" -> (textQuality _),
    "text_tfidf" -> (textTfidf _),
    "text_bm25" -> (textBm25 _),
    "text_bm25_indexed" -> (textBm25Indexed _),
    "text_bm25_serve_batch" -> (textBm25ServeBatch _),
    "snk_text_index" -> (snkTextIndex _),
    "snk_text_index_compact" -> (snkTextIndexCompact _),
    "text_langid" -> (textLangid _),
    "text_nb_classify" -> (textNbClassify _),
    "text_langid_nb" -> (textLangidNb _),
    "text_nb_top_features" -> (textNbTopFeatures _),
    "snk_text_index_delete" -> (snkTextIndexDelete _),
    "text_fingerprint" -> (textFingerprint _),
    "text_containment" -> (textContainment _)
  )

  def oracle: Map[String, String] = Map(
    "text_sentence_dedup" -> textSentenceDedupSql,
    "text_line_dedup_global" -> textLineDedupGlobalSql,
    "text_bpe_pairs" -> textBpePairsSql,
    "text_bpe_encode" -> textBpeEncodeSql,
    "text_bpe_train" -> textBpeTrainSql,
    "text_unigram_train" -> textUnigramTrainSql,
    "text_unigram_encode" -> textUnigramEncodeSql,
    "snk_tokenizer_model" -> snkTokenizerModelSql,
    "pipeline_tokenize_pack" -> pipelineTokenizePackSql,
    "text_tokenizer_fertility" -> textTokenizerFertilitySql,
    "text_bpe_encode_trained" -> textBpeEncodeTrainedSql,
    "text_bigram_logprob" -> textBigramLogprobSql,
    "text_ppl_filter" -> textPplFilterSql,
    "text_ppl_kn" -> textPplKnSql,
    "fn_unicode_normalize" -> fnUnicodeNormalizeSql,
    "fn_sentence_split" -> fnSentenceSplitSql,
    "text_cooccurrence" -> textCooccurrenceSql,
    "agg_ks_drift" -> aggKsDriftSql,
    "win_quality_cdf" -> winQualityCdfSql,
    "text_entropy" -> textEntropySql,
    "text_length_histogram" -> textLengthHistogramSql,
    "text_pack_sequences" -> textPackSequencesSql,
    "text_html_strip" -> textHtmlStripSql,
    "text_mixture_card" -> textMixtureCardSql,
    "text_quality_decile" -> textQualityDecileSql,
    "text_unigram_logprob" -> textUnigramLogprobSql,
    "text_chunk" -> textChunkSql,
    "text_repetition" -> textRepetitionSql,
    "text_gopher_rules" -> textGopherRulesSql,
    "text_token_count" -> textTokenCountSql,
    "text_quality_filter" -> textQualityFilterSql,
    "text_pii_scrub" -> textPiiScrubSql,
    "text_stats" -> textStatsSql,
    "text_tokens_tf" -> textTokensTfSql,
    "text_quality" -> textQualitySql,
    "text_tfidf" -> textTfidfSql,
    "text_bm25" -> textBm25Sql,
    "text_bm25_serve_batch" -> textBm25ServeBatchSql,
    // the index-served form must reproduce the scan-time result exactly
    "text_bm25_indexed" -> textBm25Sql,
    "snk_text_index" -> snkTextIndexSql,
    "snk_text_index_compact" -> snkTextIndexCompactSql,
    "snk_text_index_delete" -> snkTextIndexDeleteSql,
    "text_langid" -> textLangidSql,
    "text_nb_classify" -> textNbClassifySql,
    "text_langid_nb" -> textLangidNbSql,
    "text_nb_top_features" -> textNbTopFeaturesSql,
    // the 64-bit wraparound winnow hash IS mirrorable — HUGEINT
    // arithmetic wrapped once at the end (same ring mod 2^64)
    "text_fingerprint" -> textFingerprintSql,
    "text_containment" -> textContainmentSql
  )
}
