package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming capabilities (SURVEY.md §2.9). The reference's
  * in-situ feed is an incremental NRT ingest — hourly updates arriving
  * 24-48 h late (insitu collections.yaml:3), consumed by re-running
  * monthly globs with a listing cache (insitu recipe.py:30-45). The
  * streaming-native form: file-source discovery with
  * Trigger.AvailableNow (checkpoint = the cache's role), watermarked
  * event-time windows for the lateness envelope, dedup-within-
  * watermark for re-delivery, foreachBatch upsert into the catalog.
  *
  * Every transform takes/returns DataFrame so the SAME function body
  * serves batch (oracle-checkable twin) and stream — the engine's
  * batch/stream unification guarantee.
  */
object StreamingOps {

  /** stream_file_ingest — incremental discovery of new catalog files;
    * checkpointing makes each file exactly-once (the listing cache's
    * role, insitu recipe.py:30-45). */
  def fileIngest(
      spark: SparkSession, inputDir: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 100) // bounded micro-batches at scale
      .parquet(inputDir)

  /** stream_warc_ingest — incremental crawl-archive ingest: the
    * binaryFile stream source discovers newly-landed `.warc.gz` drops
    * (checkpoint = exactly-once per file), and each archive parses
    * through the SAME WarcIo kernel as the batch source
    * (WarcQueries.warcRecords), quarantine rows included — so the
    * stream is record-for-record the batch table, pinned by
    * StreamWarcSpec's parity test. binaryFile buffers a whole archive
    * per row (the WARC convention caps files ~1 GB — executor-sized);
    * the batch path keeps its streaming parser for unbounded files. */
  def warcIngest(spark: SparkSession, inputDir: String): DataFrame = {
    import spark.implicits._
    spark.readStream
      .format("binaryFile")
      // binaryFile's schema is FIXED by the source; the stream API
      // still demands it be spelled explicitly
      .schema(StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, " +
          "length BIGINT, content BINARY"))
      .option("pathGlobFilter", "*.warc.gz")
      .option("maxFilesPerTrigger", 100)
      .load(inputDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        graft.ingest.WarcIo
          .parseGzip(new java.io.ByteArrayInputStream(bytes))
          .zipWithIndex.map { case (r, i) =>
            (r.targetUri,
              r.recordId.stripPrefix("<").stripSuffix(">"),
              r.recType, r.date,
              if (r.recType == "response") r.httpMime else r.contentType,
              r.contentLength, r.httpStatus.toLong, r.body, r.err,
              path, i.toLong)
          }
      }
      .toDF("url", "rec_id", "rec_type", "warc_ts", "mime",
        "content_length", "http_status", "body", "err",
        "src_file", "rec_idx")
  }

  /** stream_wds_ingest — incremental training-shard ingest: the
    * binaryFile stream source discovers newly-landed WebDataset
    * `.tar` shards (checkpoint = exactly-once per shard) and each
    * shard parses through the SAME TarIo kernel as the batch source
    * (MultimodalQueries.tarEntries), quarantine entries included —
    * record-for-record batch parity pinned by StreamWdsSpec. A shard
    * buffers whole per row; WebDataset sizes shards executor-small
    * by construction (the format exists so trainers can stream whole
    * files). */
  def wdsIngest(spark: SparkSession, inputDir: String): DataFrame = {
    import spark.implicits._
    spark.readStream
      .format("binaryFile")
      .schema(StructType.fromDDL(
        "path STRING, modificationTime TIMESTAMP, " +
          "length BIGINT, content BINARY"))
      .option("pathGlobFilter", "*.tar")
      .option("maxFilesPerTrigger", 100)
      .load(inputDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        graft.ingest.TarIo
          .readEntries(new java.io.ByteArrayInputStream(bytes))
          .map(e => (e.name, e.data, e.err, path))
      }
      .toDF("name", "data", "err", "src_file")
  }

  /** stream_tumbling — fixed windows per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** stream_sliding — moving counts, 1 h window / 15 min slide. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("window_start"), col("n"),
        col("total"))

  /** stream_session — per-user observation sessions with a 30 min
    * inactivity gap (trajectory segmentation, cf. extract_geometry
    * time series insitu recipe.py:91-93). Streaming session windows
    * require a watermark (append mode); applied automatically for
    * streaming inputs, batch is untouched. */
  def sessionize(events: DataFrame): DataFrame =
    (if (events.isStreaming) withLatenessBound(events) else events)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** stream_watermark_late — tolerate the documented 24-48 h lateness;
    * rows later than the watermark are dropped (documented behavior,
    * SURVEY §2.9). */
  def withLatenessBound(events: DataFrame, bound: String = "48 hours"): DataFrame =
    events.withWatermark("ts", bound)

  /** stream_dedup — exactly-once item emission on re-delivery. */
  def dedupWithinWatermark(
      events: DataFrame, key: String = "event_id"): DataFrame =
    events.withWatermark("ts", "48 hours")
      .dropDuplicatesWithinWatermark(key)

  /** stream_stream_join — watermarked stream-stream interval join:
    * each error pairs with signups of the same user within the
    * preceding hour. Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can expire state
    * (unbounded-state stream joins are rejected at analysis). Works
    * identically on batch frames (no watermark applied). */
  def errorsWithRecentSignups(
      errors: DataFrame, signups: DataFrame): DataFrame = {
    val e = (if (errors.isStreaming) errors.withWatermark("ts", "2 hours")
      else errors)
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"))
    val sg = (if (signups.isStreaming) signups.withWatermark("ts", "2 hours")
      else signups)
      .select(col("user_id"), col("ts").as("signup_ts"))
    e.join(sg,
      e("user_id") === sg("user_id") &&
        col("signup_ts") <= col("error_ts") &&
        col("signup_ts") >= col("error_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("error_id"), e("user_id").as("user_id"),
        col("error_ts"), col("signup_ts"))
  }

  /** Custom per-key state (stream_session's explicit-state form,
    * SURVEY §2.9): running per-user counters maintained with
    * flatMapGroupsWithState — the mechanism for state machines the
    * built-in windows can't express (e.g. trajectory segmentation
    * with domain rules). State size is O(keys); at 100 TB pair with a
    * watermark-driven timeout to bound it. */
  case class UserState(nEvents: Long, totalValue: Double)
  case class UserUpdate(user_id: Long, n_events: Long, total_value: Double)

  def statefulUserTotals(
      events: org.apache.spark.sql.Dataset[
        org.apache.spark.sql.Row]): org.apache.spark.sql.Dataset[UserUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, UserUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)],
            state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.nEvents
          var v = prev.totalValue
          rows.foreach { case (_, value) => n += 1; v += value }
          state.update(UserState(n, v))
          // decimal HALF_UP — the rounding Spark's round() applies,
          // so the batch twin agrees on .xx5 boundaries (rint is
          // HALF_EVEN and would diverge there). Non-finite passes
          // through unchanged, also like round() — BigDecimal(NaN)
          // would throw and poison the checkpointed state forever
          val rounded =
            if (java.lang.Double.isFinite(v))
              BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
            else v
          Iterator(UserUpdate(user, n, rounded))
      }
  }

  /** Streaming heavy hitters — the SAME Misra-Gries sketch as
    * agg_heavy_hitters kept as per-key flatMapGroupsWithState state:
    * each micro-batch folds its rows into the key's sketch with the
    * IDENTICAL update kernel (HeavyHittersAgg.update — one sketch
    * implementation audited for both modes) and emits the key's
    * current top-k. State size is O(keys × capacity) regardless of
    * stream length — the bounded-state form of "who dominates this
    * feed", e.g. top crawl domains per content-type over an unbounded
    * ingest. Stream-equals-batch is unit-tested. */
  case class HitUpdate(key: String, rk: Int, item: Long, n: Long)

  def heavyHittersStream(
      events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      capacity: Int = 4096, k: Int = 5)
      : org.apache.spark.sql.Dataset[HitUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.functions.HeavyHittersAgg
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sketchEnc: org.apache.spark.sql.Encoder[HeavyHittersAgg.Sketch] =
      org.apache.spark.sql.Encoders.kryo[HeavyHittersAgg.Sketch]
    events
      .selectExpr("event_type", "user_id")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HeavyHittersAgg.Sketch, HitUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)],
            state: GroupState[HeavyHittersAgg.Sketch]) =>
          val sk = state.getOption
            .getOrElse(new HeavyHittersAgg.Sketch)
          rows.foreach { case (_, item) =>
            HeavyHittersAgg.update(sk, item, capacity)
          }
          state.update(sk)
          HeavyHittersAgg.top(sk).take(k).zipWithIndex.iterator.map {
            case (h, i) => HitUpdate(key, i + 1, h.item, h.n)
          }
      }
  }

  /** Streaming quantiles — agg_quantile_sketch's DDSketch as
    * flatMapGroupsWithState state: the IDENTICAL deterministic
    * bucket-count kernel (QuantileSketchAgg.update — one sketch
    * implementation audited for both modes), so after any replay of
    * the same rows the streaming state IS the batch sketch and the
    * emitted quantiles match the batch aggregator exactly (the
    * bucket-additive construction is merge-order independent under
    * budget). State is O(keys × maxBuckets) regardless of stream
    * length — live p50/p95/p99 latency/price monitoring over an
    * unbounded feed. Stream-equals-batch is unit-tested. */
  case class QuantileUpdate(
      key: String, n: Long, p50: Double, p90: Double, p99: Double)

  def quantilesStream(
      events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      alpha: Double = graft.functions.QuantileSketchAgg.ALPHA,
      maxBuckets: Int = graft.functions.QuantileSketchAgg.MAX_BUCKETS)
      : org.apache.spark.sql.Dataset[QuantileUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.functions.QuantileSketchAgg
    val spark = events.sparkSession
    import spark.implicits._
    implicit val sketchEnc: org.apache.spark.sql.Encoder[QuantileSketchAgg.Sketch] =
      org.apache.spark.sql.Encoders.kryo[QuantileSketchAgg.Sketch]
    events
      .selectExpr("o_orderstatus", "o_totalprice")
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[QuantileSketchAgg.Sketch, QuantileUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)],
            state: GroupState[QuantileSketchAgg.Sketch]) =>
          val sk = state.getOption
            .getOrElse(new QuantileSketchAgg.Sketch)
          rows.foreach { case (_, x) =>
            QuantileSketchAgg.update(sk, x, alpha, maxBuckets)
          }
          state.update(sk)
          Iterator.single(QuantileUpdate(key,
            sk.zeroCount + sk.buckets.valuesIterator.sum,
            QuantileSketchAgg.quantile(sk, 0.50, alpha),
            QuantileSketchAgg.quantile(sk, 0.90, alpha),
            QuantileSketchAgg.quantile(sk, 0.99, alpha)))
      }
  }

  /** Streaming weighted reservoir — sample_weighted's A-ES draw as
    * flatMapGroupsWithState state: Efraimidis–Spirakis keys are
    * computed per arriving row from the SAME hash-deterministic
    * uniform as the batch query, and the state is just the k best
    * (key, doc) pairs — the textbook streaming weighted reservoir,
    * O(k) state on an unbounded feed. Because keys are deterministic
    * functions of content, replaying the same rows in ANY micro-batch
    * split converges to exactly the batch top-k (asserted in
    * ScaleUtilsSpec). */
  case class ReservoirPick(lang: String, rk: Int, doc_id: Long, key: Double)

  def weightedReservoirStream(
      docs: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      k: Int = 20): org.apache.spark.sql.Dataset[ReservoirPick] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .filter("n_chars IS NOT NULL AND n_chars > 0") // batch parity
      .selectExpr("lang", "doc_id",
        // the batch query's exact key arithmetic — the ONE definition
        s"${graft.operators.SampleQueries.AES_KEY_SQL} AS key")
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Double, Long)], ReservoirPick](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (lang: String, rows: Iterator[(String, Long, Double)],
            state: GroupState[Seq[(Double, Long)]]) =>
          // last-write-wins per doc_id: a re-crawled document's new
          // key REPLACES its retained entry (and at-least-once
          // re-delivery of an unchanged row is a no-op) — otherwise a
          // re-arriving doc would hold multiple reservoir slots.
          // Truncation caveat: once the state dropped a doc, a worse
          // re-crawl of a retained one cannot resurrect it — exact
          // batch convergence is guaranteed for append-only feeds.
          val arrivals = rows.map { case (_, id, key) => (id, key) }.toSeq
          val lastWins = arrivals.groupBy(_._1).map(_._2.last)
          val arrivedIds = lastWins.map(_._1).toSet
          val merged = (state.getOption.getOrElse(Seq.empty)
            .filterNot { case (_, id) => arrivedIds(id) } ++
            lastWins.map { case (id, key) => (key, id) })
            .sortBy { case (key, id) => (key, id) }
            .take(k)
          state.update(merged)
          merged.iterator.zipWithIndex.map { case ((key, id), i) =>
            ReservoirPick(lang, i + 1, id, key)
          }
      }
  }

  /** Streaming sequence packer — text_pack_sequences as per-stream
    * state: each (lang, shard) key carries its cumulative token count
    * in flatMapGroupsWithState, so documents arriving over an
    * unbounded ingest are appended to the SAME concat-and-cut layout
    * the batch packer produces — the "pack as you crawl" form.
    * State is ONE long per stream key (O(langs × shards), constant);
    * docs are packed in arrival order within a batch after an
    * in-batch (bucket, doc_id) sort, so replaying the corpus in
    * bucket order reproduces the batch layout exactly (StreamingSpec
    * asserts bit-parity across multi-batch replays). */
  case class PackState(cum: Long)
  case class PackedDoc(doc_id: Long, lang: String, shard: Long,
      n_tokens: Long, seq_id: Long, seq_offset: Long)

  def packSequencesStream(
      docs: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      budget: Long = graft.operators.TextQueries.PACK_BUDGET)
      : org.apache.spark.sql.Dataset[PackedDoc] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size, split}
    // SHARED layout constants and hash: a batch-side packer change
    // surfaces here at compile/parity-test time instead of silently
    // producing a second, different layout
    docs
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        graft.operators.TextQueries.packBucket(col("doc_id"))
          .as("bucket"))
      .withColumn("shard",
        col("bucket") % graft.operators.TextQueries.PACK_SHARDS)
      .as[(Long, String, Long, Long, Long)]
      .groupByKey(r => (r._2, r._5))
      .flatMapGroupsWithState[PackState, PackedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: (String, Long), rows: Iterator[(Long, String, Long, Long, Long)],
            state: GroupState[PackState]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          // deterministic within-batch order (cross-batch order is
          // the stream's arrival order, as in any real packer)
          val out = rows.toSeq.sortBy(r => (r._4, r._1)).map {
            case (docId, lang, tok, _, shard) =>
              val start = cum
              cum += tok
              PackedDoc(docId, lang, shard, tok,
                start / budget, start % budget)
          }
          state.update(PackState(cum))
          out.iterator
      }
  }

  /** Streaming token-budget admission — sample_token_budget as
    * per-language state: each language carries its cumulative token
    * count in flatMapGroupsWithState and a document is ADMITTED iff
    * it STARTS under budget (the batch draw's packing rule). The
    * admit-as-you-crawl form of mixture construction: state is ONE
    * long per language (O(|langs|), constant on an unbounded feed),
    * and replaying the corpus in hash-bucket order reproduces the
    * batch draw exactly — StreamingSpec asserts set-parity across a
    * multi-batch replay. Rejected docs flow through flagged, not
    * dropped, so a downstream sink can route overflow elsewhere. */
  case class AdmitState(cum: Long)
  case class AdmitVerdict(doc_id: Long, lang: String, n_tokens: Long,
      admitted: Boolean)

  def budgetAdmitStream(
      docs: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      budget: Long = graft.operators.SampleQueries.LANG_BUDGET)
      : org.apache.spark.sql.Dataset[AdmitVerdict] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size, split}
    docs
      // the SHARED bucket definition and budget: a batch-side change
      // desyncs here at compile/parity-test time, not silently
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        graft.operators.SampleQueries.hashBucket(col("doc_id"))
          .as("bucket"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[AdmitState, AdmitVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (lang: String, rows: Iterator[(Long, String, Long, Long)],
            state: GroupState[AdmitState]) =>
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          // deterministic within-batch order; cross-batch order is
          // arrival order, exactly like the packer
          val out = rows.toSeq.sortBy(r => (r._4, r._1)).map {
            case (docId, _, tok, _) =>
              val start = cum
              cum += tok
              AdmitVerdict(docId, lang, tok, start < budget)
          }
          state.update(AdmitState(cum))
          out.iterator
      }
  }

  /** Streaming rolling-anomaly detector — win_anomaly as per-user
    * state: a bounded ring of the user's last 50 values rides
    * flatMapGroupsWithState, each event judged against the ring
    * BEFORE being appended (the batch frame's "preceding rows only"
    * rule). State is O(users × 50) regardless of stream length —
    * the always-on form of the fraud/ops monitor. Replaying events
    * in (ts, event_id) order reproduces the batch flags up to
    * last-ulp variance-algorithm differences at the |z| threshold
    * (StreamingSpec bounds the disagreement to threshold-boundary
    * rows). */
  case class AnomalyState(ring: List[Double])
  case class AnomalyFlag(event_id: Long, user_id: Long, z: Double)

  private val ANOMALY_RING = 50
  private val ANOMALY_MIN_N = 20
  private val ANOMALY_Z = 2.5

  def anomalyStream(
      events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.Dataset[AnomalyFlag] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      // unix_micros, not CAST(ts AS LONG): the cast truncates to
      // SECONDS and would tie-order same-second events differently
      // than the batch window's full-precision ts
      .selectExpr("event_id", "unix_micros(ts) AS tsl", "user_id", "value")
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[AnomalyState, AnomalyFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, Double)],
            state: GroupState[AnomalyState]) =>
          var ring = state.getOption.map(_.ring).getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[AnomalyFlag]
          // deterministic within-batch order mirrors the batch window
          rows.toSeq.sortBy(r => (r._2, r._1)).foreach {
            case (eventId, _, _, value) =>
              val n = ring.length
              if (n >= ANOMALY_MIN_N) {
                val mu = ring.sum / n
                val sd = math.sqrt(
                  ring.map(v => (v - mu) * (v - mu)).sum / (n - 1))
                val zRaw = (value - mu) / sd + 1e-9
                // a non-finite value (dirty feed) must NOT flag — and
                // must not crash: the batch twin's round() returns NaN
                // and abs(NaN) >= z is false, so the row just drops
                if (sd > 0 && java.lang.Double.isFinite(zRaw)) {
                  // the EXACT rounding Spark's round() applies to a
                  // double (decimal-string HALF_UP) — rint would be
                  // HALF_EVEN and could flip a boundary flag
                  val z = BigDecimal(zRaw)
                    .setScale(4, BigDecimal.RoundingMode.HALF_UP)
                    .toDouble
                  if (math.abs(z) >= ANOMALY_Z)
                    out += AnomalyFlag(eventId, user, z)
                }
              }
              ring = (ring :+ value).takeRight(ANOMALY_RING)
          }
          state.update(AnomalyState(ring))
          out.iterator
      }
  }

  /** stream_upsert_sink — continuous merge into the catalog: each
    * micro-batch runs the same last-write-wins upsert as batch ingest
    * (exactly-once per batch id via checkpoint). */
  def upsertSink(
      items: DataFrame, catalogPath: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    items.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // no isEmpty pre-check: it would execute the batch lineage a
        // second time; an empty delta makes the merge a no-op anyway
        graft.catalog.CatalogStore.upsert(batch.sparkSession, catalogPath, batch)
      }

  /** stream_jdbc_sink — continuous pgstac-parity load: each
    * micro-batch upserts through JdbcCatalogSink (foreachPartition +
    * ON CONFLICT semantics). Re-delivered batches are absorbed by the
    * sink's last-write-wins guard, so the pipeline is idempotent even
    * across checkpoint replays — the streaming twin of the
    * reference's ToPgStac tail. */
  def jdbcUpsertSink(
      items: DataFrame, conf: graft.catalog.JdbcCatalogSink.JdbcConfig,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    items.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.catalog.JdbcCatalogSink.upsertItems(batch, conf)
      }

  /** Streaming incremental dedup — the day-to-day form of
    * dedup_incremental: each micro-batch of freshly crawled docs is
    * flagged against the EXISTING corpus (exact hash + block-capped
    * near-dup candidates) and the verdicts appended to `outPath`.
    * The corpus side is a static DataFrame re-planned per batch, so
    * each batch pays batch-sized cost; the checkpoint makes a
    * restarted ingest skip already-judged files. foreachBatch reuses
    * the BATCH operator verbatim — one dedup rule to audit for both
    * modes (same pattern as upsertSink). */
  def incrementalDedupSink(
      fresh: DataFrame, corpus: DataFrame, outPath: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    fresh.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.DedupQueries
          .dedupIncrementalFrom(corpus, batch)
          .write.mode("append").parquet(outPath)
      }


  /** The base both index sinks map their micro-batch counters above:
    * one past the highest compaction fence on any folded subdir of
    * `root`, rounded up to EVEN so the even/odd lanes stay aligned.
    * Computed once per writer construction — compaction is a
    * quiesce-time op by contract, so the fence cannot move under a
    * running stream — which makes the post-compaction resume work by
    * construction: restart with a fresh checkpoint (the documented
    * procedure) and the counter restarts at 0, landing the first
    * batches at fence+1/fence+2 instead of wedging below a fence the
    * OTHER stream's batches raised. (With a fixed 2k/2k+1 mapping,
    * whichever stream had run fewer micro-batches would see its next
    * FRESH id rejected as a replay after any compaction.) */
  private[streaming] val LaneSubdirs = Seq("postings", "stats",
    "doclens", "assignments", graft.operators.IndexDeletes.Subdir)

  private[graft] def laneBase(root: String): Long = {
    val mx = LaneSubdirs
      .map(graft.operators.IndexCompaction.compactedThrough(root, _)).max
    ((mx + 2) / 2) * 2 // >= mx + 1, even
  }

  /** One-call adoption of the id-lane contract for index roots built
    * by PRE-LANE sink versions (identity micro-batch mapping): stamps
    * every folded subdir's compaction fence at the root's current max
    * batch id, so [[laneBase]] — and with it both stream lanes —
    * starts one past everything already written, WITHOUT paying the
    * compaction the scaladoc used to prescribe. The existing batch
    * dirs stay exactly as they are (the next real compaction folds
    * them normally — it can only move fences up from here); raising
    * the fences also arms the append/delete replay guards against
    * every pre-migration id, which is what makes the immediate
    * dual-stream join safe: no new batch can collide with or
    * overwrite a legacy partition. Quiesce-time op: run with all
    * streams against `root` stopped, and restart them with FRESH
    * checkpoints (a pre-migration checkpoint would replay ids the new
    * fence rejects — loudly, by design). Idempotent, and a no-op on
    * empty roots and on roots already fenced at their max id. */
  def migrateToLanes(root: String): Unit =
      graft.operators.IndexLease.withMaintenance(root) {
    // Fences move here, so this is maintenance and follows the same
    // discipline as compaction/rebuild/repair: exclusive lease (no
    // live serve readers), and any CRASHED maintenance journal is
    // replayed first — raising compact.through over an unreplayed
    // pending swap would intertwine two recovery states (the replay's
    // prune acting on a fence the crashed run never saw).
    graft.operators.IndexCompaction.recoverAllPending(root)
    graft.operators.SimilarityQueries.recoverRebuild(root)
    graft.operators.SimilarityQueries.recoverRepair(root)
    val mx = LaneSubdirs.map { d =>
      val p = java.nio.file.Paths.get(root, d)
      val onDisk =
        if (java.nio.file.Files.isDirectory(p))
          graft.operators.IndexCompaction.listBatchIds(p)
        else Nil
      (onDisk :+ graft.operators.IndexCompaction.compactedThrough(root, d)).max
    }.max
    // mx < 0: nothing written yet — lanes already start at 0
    if (mx >= 0) {
      val raises: Map[String, String] = LaneSubdirs
        .filter(d =>
          graft.operators.IndexCompaction.compactedThrough(root, d) < mx)
        .map(d => s"compact.through.$d" -> mx.toString).toMap
      if (raises.nonEmpty)
        graft.operators.IndexManifest.update(root, raises)
    }
  }

  /** stream_index_upsert — incremental inverted-index maintenance:
    * each micro-batch of new documents is merged into the persisted
    * term-bucketed index (snk_text_index's layout) by the SAME
    * appendToIndex kernel the batch build uses. Per-batch cost is
    * batch-sized plus the touched term buckets' df refresh — never a
    * corpus re-tokenize. Exactly-once comes from the LAYOUT, not just
    * the checkpoint: every write is a dynamic partition overwrite
    * scoped by (bucket, batch_id), so a replayed batch overwrites
    * itself instead of double-appending; TextIndexSpec pins both the
    * streamed-vs-batch index parity and the replay idempotence.
    *
    * `mapBatchId` defaults to the EVEN id lane above the compaction
    * fence ([[laneBase]] + 2k) — the other half of the delete sinks'
    * odd-lane contract: an ingest stream and a takedown stream
    * against the same root must never write the same batch_id (stats
    * partitions key on it alone; a collision would silently overwrite
    * one stream's stats row with the other's). Roots built by
    * pre-lane versions of these sinks (identity mapping): run
    * [[migrateToLanes]] once — it fences the legacy ids so both lanes
    * start above them — then resume with fresh checkpoints. */
  def indexUpsertSink(
      docs: DataFrame, indexRoot: String, checkpoint: String,
      mapBatchId: Option[Long => Long] = None)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    val f = mapBatchId.getOrElse {
      val base = laneBase(indexRoot)
      (k: Long) => base + 2 * k
    }
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.TextQueries
          .appendToIndex(batch, indexRoot, f(id))
      }
  }

  /** stream_vector_upsert — incremental IVF ingest: each micro-batch
    * of new vectors is assigned against the index's PERSISTED
    * quantizer (deterministic; ingest never re-clusters — quantizer
    * retraining is a rebuild decision) by the SAME appendToVectorIndex
    * kernel the batch build uses. Replays land as dynamic partition
    * overwrites under (cid, batch_id) — idempotent by layout, the
    * vector twin of stream_index_upsert. The index must be
    * bootstrapped (initVectorIndex / snk_vector_index) first.
    * Same even-lane mapBatchId contract as [[indexUpsertSink]]. */
  def vectorUpsertSink(
      vectors: DataFrame, indexRoot: String, checkpoint: String,
      mapBatchId: Option[Long => Long] = None)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    val f = mapBatchId.getOrElse {
      val base = laneBase(indexRoot)
      (k: Long) => base + 2 * k
    }
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.SimilarityQueries
          .appendToVectorIndex(batch, indexRoot, f(id))
      }
  }

  /** stream_index_delete — a takedown FEED against the serving index:
    * each micro-batch of doc_ids is tombstoned by the SAME
    * deleteFromTextIndex kernel (tombstones + negative stats row;
    * see IndexDeletes), so deleted docs vanish from serve as the
    * batch commits. Exactly-once by layout: replays recompute their
    * newly-deleted set against every OTHER batch's tombstones and
    * overwrite their own partitions.
    *
    * `mapBatchId` folds this stream's 0-based micro-batch counter
    * into the index's SINGLE monotone batch-id space (tombstone and
    * stats partitions key on batch_id alone, so the ingest and
    * takedown streams must not collide). The default pairing — ingest
    * micro-batches on the even lane and takedown micro-batches on the
    * odd lane, both based one past the compaction fence
    * ([[laneBase]]) — keeps the streams' ids advancing together AND
    * clearing the fence after the documented post-compaction restart
    * (fresh checkpoints; the counter restarts at 0 but the base has
    * moved above the fold). Do NOT map the takedown stream far above
    * the ingest stream (e.g. an epoch << 32 base): the compaction
    * fence would then sit above every future ingest id and brick the
    * ingest stream. */
  def indexDeleteSink(
      ids: DataFrame, indexRoot: String, checkpoint: String,
      mapBatchId: Option[Long => Long] = None)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    val f = mapBatchId.getOrElse {
      val base = laneBase(indexRoot)
      (k: Long) => base + 2 * k + 1
    }
    ids.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.TextQueries
          .deleteFromTextIndex(batch.sparkSession, indexRoot,
            batch, f(id))
        ()
      }
  }

  /** stream_vector_delete — the vector twin: micro-batches of vec_ids
    * tombstoned via deleteFromVectorIndex (pure tombstone writes; the
    * frozen quantizer needs no correction). Same mapBatchId contract
    * as [[indexDeleteSink]]. */
  def vectorDeleteSink(
      ids: DataFrame, indexRoot: String, checkpoint: String,
      mapBatchId: Option[Long => Long] = None)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    val f = mapBatchId.getOrElse {
      val base = laneBase(indexRoot)
      (k: Long) => base + 2 * k + 1
    }
    ids.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.SimilarityQueries
          .deleteFromVectorIndex(batch.sparkSession, indexRoot,
            batch, f(id))
        ()
      }
  }

  /** Streaming classifier admission — the stream twin of
    * text_nb_classify (score-the-crawl-as-it-arrives, the production
    * shape of a trained quality/language filter): every micro-batch
    * of incoming docs is scored against the model trained on the
    * STATIC corpus by the same batch seam
    * ([[graft.operators.TextQueries.nbScoreDocs]]) — one scoring
    * rule to audit for both modes, the incrementalDedupSink pattern.
    * Stateless per doc (the model is a set of vocab-bounded
    * broadcast aggregates), so exactly-once comes free with the file
    * sink and there is no watermark to tune. Re-aggregating the
    * model per micro-batch is the fixture shape; a deployment
    * materializes the model tables once and the scoring join is
    * unchanged. */
  def nbClassifySink(
      fresh: DataFrame, corpus: DataFrame, outPath: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    fresh.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.TextQueries.nbScoreDocs(corpus, batch)
          .write.mode("append").parquet(outPath)
      }

  /** Streaming EWMA — ts_ewma's per-key recurrence as
    * flatMapGroupsWithState with O(1) state per user: (last ts,
    * last event_id, raw previous smoothed value). This is the
    * UNBOUNDED-KEY path the batch operator can't be: tsEwma collects
    * each user's whole sequence into one row before folding (fine at
    * any realistic per-user cardinality, a single-task OOM for one
    * hot key with ~10⁸ events — bound documented in SCALE.md), while
    * this twin holds three fields per user forever.
    *
    * Contracts mirrored from the batch fold, pinned by the parity
    * spec:
    *  - order: rows sort (ts, event_id) inside each micro-batch
    *    (batch-bounded memory), and the recurrence consumes them in
    *    that order; state carries the RAW prev (the batch fold also
    *    rounds only at emit).
    *  - seed: the first reading IS the seed (ewma = value), then
    *    0.3·v + 0.7·prev.
    *  - rounding: decimal HALF_UP at 6 dp after the +1e-9 nudge —
    *    Spark round()'s mode, so emits agree bit-for-bit.
    *  - replay/late rows: a row at or before the state's
    *    (last ts, last event_id) is DROPPED — at-least-once
    *    re-delivery can't corrupt the recurrence (the
    *    dropDuplicatesWithinWatermark discipline, enforced in-state
    *    because the recurrence is order-sensitive, not just
    *    duplicate-sensitive). */
  /** Streaming curation ledger — curation_domain_stats as
    * flatMapGroupsWithState with BOUNDED per-source state: exact
    * integer counters (docs, short docs, char sum) plus the SAME
    * deterministic 4096-register HLL sketch agg_distinct_approx uses
    * for the distinct-content term (register = max rank per bucket —
    * order-independent, so any replay/split of the same rows lands on
    * the identical registers and therefore the identical estimate).
    * This is the live form of the per-source ledger: the batch
    * operator's exact countDistinct needs the whole corpus; the
    * stream holds O(sources × 4 KB) forever and its ONE approximate
    * column (`n_unique_approx`, HLL ±~1.6% at p=12) is named as such
    * — every other column is exact and matches the batch ledger.
    * Stream==batch parity on the estimate itself is pinned in
    * StreamingSpec against the engine's own hllRegisters∘hllEstimate
    * fold over the same content keys. */
  case class DomainState(nDocs: Long, nShort: Long, sumChars: Long,
      regs: Array[Byte])
  case class DomainUpdate(source: String, n_docs: Long,
      n_unique_approx: Long, dup_rate_approx: Double,
      short_share: Double, mean_chars: Double, keep: Boolean)

  def domainStatsStream(
      docs: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.Dataset[DomainUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.operators.RelationalQueries.{HLL_M, HLL_P, HLL_RMAX, HLL_ALPHA_M2}
    val spark = docs.sparkSession
    import spark.implicits._
    def estimate(regs: Array[Byte]): Long = {
      // hllEstimate op-for-op: exact integer harmonic sum, the same
      // double division/ln, HALF_UP round — so the emitted estimate
      // equals the batch fold over the same registers bit-for-bit
      var nz = 0
      var sn = BigInt(0)
      var i = 0
      while (i < regs.length) {
        if (regs(i) > 0) { nz += 1; sn += BigInt(1) << (HLL_RMAX - regs(i)) }
        i += 1
      }
      val v = HLL_M - nz
      val eraw = HLL_ALPHA_M2 /
        (v.toDouble + sn.toDouble / 9007199254740992.0)
      val est =
        if (eraw <= 2.5 * HLL_M && v > 0)
          HLL_M.toDouble * math.log(HLL_M.toDouble / v.toDouble)
        else eraw
      BigDecimal(est).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    docs
      // the engine-standard content key (PipelineQueries.contentKey64,
      // the one curation_domain_stats_approx sketches): identical
      // keys → identical registers → the stream's estimate equals the
      // batch qid's column, not just its own batch fold
      .select(col("source"),
        graft.operators.PipelineQueries.contentKey64.as("k"),
        col("n_chars").cast("long").as("n_chars"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DomainState, DomainUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[(String, Long, Long)],
            state: GroupState[DomainState]) =>
          val st = state.getOption
            .getOrElse(DomainState(0L, 0L, 0L, new Array[Byte](HLL_M)))
          var (n, nshort, sc) = (st.nDocs, st.nShort, st.sumChars)
          rows.foreach { case (_, k, nc) =>
            n += 1
            if (nc < 200) nshort += 1
            sc += nc
            val reg = graft.functions.HllSketch.register(k, HLL_P)
            val b = (reg / 64L).toInt
            val rk = (reg % 64L).toByte
            if (rk > st.regs(b)) st.regs(b) = rk
          }
          state.update(DomainState(n, nshort, sc, st.regs))
          val uniq = estimate(st.regs)
          def r6(x: Double) = BigDecimal(x + 1e-9)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          def r4(x: Double) = BigDecimal(x + 1e-9)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          Iterator.single(DomainUpdate(source, n, uniq,
            r6(math.max(0L, n - uniq).toDouble / n),
            r6(nshort.toDouble / n),
            r4(sc.toDouble / n),
            (n - uniq) * 10 <= n && nshort * 10 <= n * 3))
      }
  }

  /** Streaming Count-Min ledger — agg_count_min's register table as
    * live state: events fan out through THE SAME cmsBuckets column
    * expression the batch build uses (one shared kernel, so the two
    * forms can never disagree on a hash), keyed by (d, bucket) with
    * O(1) state per key — at most D×W = 1024 keys forever, the
    * smallest state footprint of any ledger here. Each update emits
    * the register's new cumulative count; counts are ASSOCIATIVE
    * integer sums, so any micro-batch split of the same rows yields
    * identical final registers, pinned register-identical to the
    * batch cmsRegisters build in StreamingSpec. A consumer answers
    * point queries ("how often has key k appeared on this feed so
    * far?") by min-ing its D register reads — the live heavy-key
    * monitor a quota/abuse gate runs against an unbounded stream
    * where exact per-key counts are unaffordable. */
  case class CmsState(n: Long)
  case class CmsUpdate(d: Int, bucket: Long, cnt: Long)

  def countMinStream(
      events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.Dataset[CmsUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(posexplode(
        graft.operators.RelationalQueries.cmsBuckets(col("user_id")))
        .as(Seq("d", "bucket")))
      .as[(Int, Long)]
      .groupByKey(identity)
      .flatMapGroupsWithState[CmsState, CmsUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), rows: Iterator[(Int, Long)],
            state: GroupState[CmsState]) =>
          var n = state.getOption.map(_.n).getOrElse(0L)
          rows.foreach(_ => n += 1)
          state.update(CmsState(n))
          Iterator.single(CmsUpdate(key._1, key._2, n))
      }
  }

  /** Streaming split-integrity ledger — pipeline_split_leakage as
    * flatMapGroupsWithState keyed by (lang, content-hash) with O(1)
    * state per key: a doc count and a 3-bit splits-seen mask. A live
    * training ingest wants this alarm CONTINUOUSLY — the batch qid
    * only catches eval contamination after the fact — so each
    * key-update emits (a) `cross_now`, true the moment a content
    * first appears under a second split (the leak alarm, with lang +
    * hash in hand for the takedown), and (b) the four ledger counters
    * as MONOTONE DELTAS (first-sighting / became-duplicated /
    * became-cross-split transitions fire exactly once per key), so
    * the per-lang ledger is a plain associative SUM over the emitted
    * rows and equals the batch operator's exactly — parity pinned in
    * StreamingSpec with a planted cross-split leak. The split rule is
    * the SAME SampleQueries.hashBucket expression sample_split and
    * the batch audit publish, applied statelessly before keying.
    * State is O(1) per distinct (lang, content) — the streaming-dedup
    * class; a bounded deployment ages keys out with a TTL timeout and
    * accepts misses past the horizon (SCALE.md "Cluster auditing /
    * split integrity"). */
  case class SplitLeakState(nd: Long, mask: Int)
  case class SplitLeakUpdate(lang: String, h: String, d_docs: Long,
      d_contents: Long, d_dup_contents: Long,
      d_cross_split_contents: Long, cross_now: Boolean)

  def splitLeakageStream(
      docs: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.Dataset[SplitLeakUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val bucket = graft.operators.SampleQueries.hashBucket(col("doc_id"))
    docs
      .select(col("lang"), sha2(col("text"), 256).as("h"),
        when(bucket < 980, 1).when(bucket < 990, 2).otherwise(4)
          .as("bit"))
      .as[(String, String, Int)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[SplitLeakState, SplitLeakUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (String, String),
            rows: Iterator[(String, String, Int)],
            state: GroupState[SplitLeakState]) =>
          val st = state.getOption.getOrElse(SplitLeakState(0L, 0))
          var nd = st.nd
          var mask = st.mask
          rows.foreach { case (_, _, bit) => nd += 1; mask |= bit }
          state.update(SplitLeakState(nd, mask))
          val was2 = Integer.bitCount(st.mask) >= 2
          val is2 = Integer.bitCount(mask) >= 2
          Iterator.single(SplitLeakUpdate(
            key._1, key._2,
            d_docs = nd - st.nd,
            d_contents = if (st.nd == 0L) 1L else 0L,
            d_dup_contents = if (st.nd <= 1L && nd >= 2L) 1L else 0L,
            d_cross_split_contents = if (!was2 && is2) 1L else 0L,
            cross_now = !was2 && is2))
      }
  }

  /** Streaming daily-grid interpolation — ts_resample_interpolate's
    * recurrence as flatMapGroupsWithState with O(1) state per user:
    * the LAST reading (ts, value) plus one had-a-predecessor bit. A
    * reading's arrival closes the interval since the previous
    * reading, so every UTC midnight strictly between the two is
    * emitted immediately with the identical
    * `pv + (nv − pv) · Δg/Δ` double arithmetic and HALF_UP 6-dp
    * rounding as the batch windows (parity pinned bit-for-bit in
    * StreamingSpec). Emission per arrival is bounded by the days
    * between consecutive readings; state never grows.
    *
    * Contract mirrored from the batch operator: pure interpolation
    * (nothing emitted before a user's second reading, nothing after
    * the last), grid strictly inside the span, a midnight coincident
    * with a reading emits that reading's value (emitted DIRECTLY,
    * not via the interpolation formula — the batch pass reaches it
    * through a zero numerator, bit-exact). The coincident emission is
    * DEFERRED to the next arrival: the batch grid drops a midnight
    * coinciding with a user's LAST reading (no strictly-later `nv`
    * bracket) and with the FIRST (the grid starts the day after t0),
    * so emitting eagerly at interval close would produce a phantom
    * row whenever the final reading lands on a midnight. In-order
    * input: rows at or before the state's last ts are DROPPED (the
    * ewmaStream discipline); duplicate (user, ts) rows arriving in
    * ONE micro-batch keep min(value) deterministically — the same
    * collapse the batch form applies (ACROSS batches the first
    * batch's min wins; full batch-parity on a duplicate-bearing
    * stream still wants an upstream dropDuplicatesWithinWatermark). */
  case class ResampleState(
      lastTsMicros: Long, lastVal: Double, hadPrev: Boolean)
  case class GridEmit(user_id: Long, grid_ts: java.sql.Timestamp,
      v_interp: Double)

  def resampleStream(
      events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.Dataset[GridEmit] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val DayUs = 86400000000L
    def micros(t: java.sql.Timestamp): Long =
      // floorDiv: /1000 truncates toward zero, which flips the sign
      // contribution of sub-second parts for pre-epoch timestamps
      // and would break the pinned batch parity there
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .selectExpr("user_id", "ts", "value")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ResampleState, GridEmit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long,
            rows: Iterator[(Long, java.sql.Timestamp, Double)],
            state: GroupState[ResampleState]) =>
          // secondary sort on value: duplicate (user, ts) rows inside
          // ONE micro-batch keep the smallest value deterministically
          // (the batch operator collapses duplicates to min(value);
          // a micros-only sort kept whichever row arrived first)
          val sorted = rows.toArray
            .sortBy { case (_, t, v) => (micros(t), v) }
          var st = state.getOption.orNull
          val out = Vector.newBuilder[GridEmit]
          def round6(vi: Double): Double =
            if (java.lang.Double.isFinite(vi))
              BigDecimal(vi + 1e-9)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
            else vi
          sorted.foreach { case (_, t, v) =>
            val tm = micros(t)
            if (st == null) st = ResampleState(tm, v, hadPrev = false)
            else if (tm > st.lastTsMicros) {
              // a NON-FIRST previous reading sitting exactly on a
              // midnight is that grid point's bracketing pair all by
              // itself in the batch pass (pv = the reading, numerator
              // zero), and this arrival proves a strictly-later `nv`
              // exists — emit the reading's value DIRECTLY, bit-exact.
              // (Interpolating it as pv + (v−pv)·Δg/Δ with Δg = Δ can
              // differ by an ulp and flip a 6-dp rounding boundary.)
              if (st.hadPrev && Math.floorMod(st.lastTsMicros, DayUs) == 0L)
                out += GridEmit(user,
                  new java.sql.Timestamp(st.lastTsMicros / 1000L),
                  round6(st.lastVal))
              // first UTC midnight STRICTLY after the previous
              // reading, STRICTLY before this one (a midnight
              // coincident with THIS reading emits when ITS interval
              // closes — the batch grid drops it if no later reading
              // ever arrives)
              var g = (Math.floorDiv(st.lastTsMicros, DayUs) + 1) * DayUs
              while (g < tm) {
                // ((nv−pv) · Δg) / Δ — the batch/oracle expressions
                // are left-associative; a · (Δg/Δ) differs in ulps
                val vi = st.lastVal + (v - st.lastVal) *
                  (g - st.lastTsMicros).toDouble /
                  (tm - st.lastTsMicros).toDouble
                out += GridEmit(user,
                  new java.sql.Timestamp(g / 1000L), round6(vi))
                g += DayUs
              }
              st = ResampleState(tm, v, hadPrev = true)
            } // tm <= last: late/replayed row, dropped
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class EwmaState(lastTsMicros: Long, lastEventId: Long, prev: Double)
  case class EwmaUpdate(user_id: Long, event_id: Long, ewma: Double)

  def ewmaStream(
      events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.Dataset[EwmaUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      // floorDiv: /1000 truncates toward zero, which flips the sign
      // contribution of sub-second parts for pre-epoch timestamps
      // and would break the pinned batch parity there
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .selectExpr("user_id", "ts", "event_id", "value")
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaUpdate](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long,
            rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
            state: GroupState[EwmaState]) =>
          val sorted = rows.toArray
            .sortBy { case (_, t, eid, _) => (micros(t), eid) }
          var st = state.getOption.orNull
          val out = Vector.newBuilder[EwmaUpdate]
          sorted.foreach { case (_, t, eid, v) =>
            val tm = micros(t)
            val late = st != null && (tm < st.lastTsMicros ||
              (tm == st.lastTsMicros && eid <= st.lastEventId))
            if (!late) {
              val e = if (st == null) v else 0.3 * v + 0.7 * st.prev
              st = EwmaState(tm, eid, e)
              val rounded =
                if (java.lang.Double.isFinite(e))
                  BigDecimal(e + 1e-9)
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP)
                    .toDouble
                else e
              out += EwmaUpdate(user, eid, rounded)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

}
