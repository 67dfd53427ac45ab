package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** Streaming ops (SURVEY.md §2.9) via MemoryStream, checked against
  * their batch twins where aggregation semantics allow (batch ==
  * stream-with-complete-output is the unification contract).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

case class Doc(doc_id: Long, lang: String, text: String)

class StreamingSpec extends SparkSpec {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  private val sample = Seq(
    Ev(1, ts(0), 1, "click", 1.0),
    Ev(2, ts(10), 1, "click", 2.0),
    Ev(3, ts(65), 1, "click", 4.0), // second hour
    Ev(4, ts(5), 2, "purchase", 8.0),
    Ev(5, ts(130), 2, "purchase", 16.0)) // third hour, after 2h gap

  test("tumbling window: stream complete-mode equals batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample: _*)
    val q = StreamingOps.tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val stream = spark.table("tumbling").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sortBy(_.toString)
    val batch = StreamingOps.tumblingCounts(sample.toDF()).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).sortBy(_.toString)
    assert(stream.sameElements(batch), "stream must equal batch twin")
    assert(stream.length == 4) // (h10,click)(h11,click)(h10,purchase)(h12,purchase)
  }

  test("deterministic hash sampling on a stream equals the batch sample") {
    // the sampler is a stateless narrow predicate: the same rows
    // survive whether the corpus arrives as one batch or as a stream
    val docs = graft.Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ssample")
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$dir/in")
    val q = graft.operators.SampleQueries.sampleHashFractionFrom(stream)
      .writeStream.format("memory").queryName("ssample")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("ssample").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.operators.SampleQueries.sampleHashFraction(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty,
      s"stream sample ${streamed.size} rows != batch ${batch.size}")
  }

  test("session window: 30-minute inactivity gap splits sessions") {
    import spark.implicits._
    val sessions = StreamingOps.sessionize(sample.toDF())
      .orderBy("user_id", "session_start").collect()
    // user 1: events at 0,10 merge; 65 is its own session → 2 sessions
    // user 2: events at 5 and 130 → 2 sessions
    assert(sessions.length == 4)
    val u1 = sessions.filter(_.getAs[Long]("user_id") == 1)
    assert(u1.head.getAs[Long]("n_events") == 2)
    assert(u1.last.getAs[Long]("n_events") == 1)
  }

  test("dedup within watermark drops re-delivered keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample ++ sample.take(3): _*) // re-deliver first 3
    val q = StreamingOps.dedupWithinWatermark(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val ids = spark.table("dedup").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L, 4L, 5L)),
      s"duplicates must be dropped: ${ids.mkString(",")}")
  }

  test("file ingest + foreachBatch upsert reaches the catalog exactly once") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inDir = s"$tmp/in"; val catalog = s"$tmp/catalog"; val ckpt = s"$tmp/ckpt"
    // seed the catalog with an initial batch write
    val (items0, _) = graft.catalog.ItemAssembly.assemble(
      new graft.ingest.FixtureGranuleSource(
        end = "2022-05-01 00:59:59").granules(spark))
    graft.catalog.CatalogStore.write(items0, catalog)
    val n0 = spark.read.parquet(catalog).count()
    // arrival of new granule-metadata files (next hour)
    new graft.ingest.FixtureGranuleSource(
      start = "2022-05-01 01:01:03", end = "2022-05-01 01:59:59")
      .granules(spark).write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val stream = StreamingOps.fileIngest(spark, inDir, schema)
    val (itemsS, _) = graft.catalog.ItemAssembly.assemble(stream)
    val q = StreamingOps.upsertSink(itemsS, catalog, ckpt).start()
    q.awaitTermination(120000)
    val n1 = spark.read.parquet(catalog).count()
    assert(n1 > n0, "new granules merged in")
    // restart with same checkpoint: no new work, no duplicates
    val q2 = StreamingOps.upsertSink(
      graft.catalog.ItemAssembly.assemble(
        StreamingOps.fileIngest(spark, inDir, schema))._1, catalog, ckpt)
      .start()
    q2.awaitTermination(120000)
    val n2 = spark.read.parquet(catalog).count()
    assert(n2 == n1, "checkpoint makes re-run a no-op")
    val items = spark.read.parquet(catalog)
    assert(items.count() == items.select("item_id").distinct().count())
  }

  test("late item becomes searchable over the LIVE API after its micro-batch") {
    // the reference's NRT loop closed end-to-end (insitu
    // collections.yaml: files arrive 24-48 h late): file-ingest stream
    // → ItemAssembly → stream_upsert_sink → a LIVE StacApiServer whose
    // searches see each merge as soon as its micro-batch commits
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val tmp = java.nio.file.Files.createTempDirectory("graft-nrt").toString
    val inDir = s"$tmp/in"; val catalog = s"$tmp/catalog"; val ckpt = s"$tmp/ckpt"
    val (items0, _) = graft.catalog.ItemAssembly.assemble(
      new graft.ingest.FixtureGranuleSource(
        end = "2022-05-01 00:59:59").granules(spark))
    graft.catalog.CatalogStore.write(items0, catalog)
    val server = graft.catalog.StacApiServer.live(spark, catalog)
    val base = server.start()
    try {
      val http = HttpClient.newHttpClient()
      def searchIds(q: String): Set[String] = {
        val body = http.send(
          HttpRequest.newBuilder(java.net.URI.create(base + q)).GET().build(),
          HttpResponse.BodyHandlers.ofString()).body()
        val f = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(body).get("features")
        (0 until f.size).map(f.get(_).get("id").asText()).toSet
      }
      // the late window (a day BEFORE the catalog's current content)
      val lateWindow = "/search?limit=500&datetime=" +
        "2022-04-30T00:00:00Z%2F2022-04-30T23:59:59Z"
      val before = searchIds(lateWindow)
      assert(before.isEmpty, "late window empty before the stream runs")
      val n0 = searchIds("/search?limit=500").size
      assert(n0 > 0)
      // a granule file LANDS now carrying day-old event times
      new graft.ingest.FixtureGranuleSource(
        start = "2022-04-30 03:00:00", end = "2022-04-30 05:59:59")
        .granules(spark).write.parquet(inDir)
      val schema = spark.read.parquet(inDir).schema
      val (itemsS, _) = graft.catalog.ItemAssembly.assemble(
        StreamingOps.fileIngest(spark, inDir, schema))
      val q = StreamingOps.upsertSink(itemsS, catalog, ckpt).start()
      q.awaitTermination(120000)
      // the SAME live server, no restart: the late items are searchable
      val after = searchIds(lateWindow)
      assert(after.nonEmpty, "late items searchable after their batch")
      assert(searchIds("/search?limit=500").size == n0 + after.size)
      // and the late window search narrows, not just grows: the
      // original hour's items stay outside it
      assert(after.intersect(searchIds("/search?limit=500&datetime=" +
        "2022-05-01T00:00:00Z%2F2022-05-01T23:59:59Z")).isEmpty)
    } finally server.stop()
  }

  test("streaming incremental dedup equals the batch operator exactly once") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val freshBatch = docs.filter(col("doc_id") % 10 === 7)
    freshBatch.write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    def run(): Unit = {
      val stream = StreamingOps.fileIngest(spark, inDir, schema)
      val q = StreamingOps
        .incrementalDedupSink(stream, corpus, outDir, ckpt).start()
      q.awaitTermination(120000)
    }
    run()
    val got = spark.read.parquet(outDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val want = graft.operators.DedupQueries
      .dedupIncrementalFrom(corpus, freshBatch)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == want, "stream micro-batch must equal the batch verdicts")
    assert(got.size == freshBatch.count(), "every fresh doc judged")
    // restart on the same checkpoint: nothing re-judged
    run()
    assert(spark.read.parquet(outDir).count() == got.size)
  }

  test("streaming classifier admission equals the batch scores exactly once") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-snb").toString
    val inDir = s"$tmp/in"; val outDir = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    val docs = graft.Tables.documents(spark, sf)
    val fresh = docs.filter(col("doc_id") % 10 >= 7)
    // two files -> the ingest may split batches; scoring is stateless
    // per doc so the union must equal the batch run regardless
    fresh.filter(col("doc_id") % 2 === 0).write.parquet(inDir)
    fresh.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    def run(): Unit = {
      val stream = StreamingOps.fileIngest(spark, inDir, schema)
      val q = StreamingOps.nbClassifySink(stream, docs, outDir, ckpt).start()
      q.awaitTermination(120000)
    }
    run()
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val got = keyed(spark.read.parquet(outDir))
    val want = keyed(graft.operators.TextQueries.textNbClassifyFrom(docs))
    assert(got == want, "streamed scores must equal the batch operator")
    // restart on the same checkpoint: nothing re-scored
    run()
    assert(spark.read.parquet(outDir).count() == got.size)
  }

  test("streaming packer equals the batch packer across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // feed the corpus in two batches split at the median hash bucket:
    // within every (lang, shard) stream, all batch-1 docs precede all
    // batch-2 docs in bucket order, so arrival order == the batch
    // packer's layout order and the outputs must be bit-identical
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang", "text",
        "CAST(conv(substring(sha2(CAST(doc_id AS STRING), 256), 1, 6), 16, 10) AS LONG) AS bucket")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val cut = docs.map(_._4).sorted.apply(docs.length / 2)
    val batch1 = docs.filter(_._4 < cut).map(d => Doc(d._1, d._2, d._3))
    val batch2 = docs.filter(_._4 >= cut).map(d => Doc(d._1, d._2, d._3))
    val mem = MemoryStream[Doc]
    val q = StreamingOps.packSequencesStream(mem.toDF())
      .writeStream.format("memory").queryName("packed_stream")
      .outputMode("append").start()
    mem.addData(batch1.toIndexedSeq: _*); q.processAllAvailable()
    mem.addData(batch2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    val got = spark.table("packed_stream").collect().map(key).toSet
    val want = graft.operators.TextQueries.textPackSequences(spark, sf)
      .collect().map(key).toSet
    assert(got == want, "streamed packing diverges from the batch layout")
    assert(got.size == docs.length)
  }

  test("streaming budget admission equals the batch draw across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // same replay discipline as the packer test: split at the median
    // hash bucket so per-language arrival order == the batch draw's
    // hash order, making the admitted sets comparable
    val docs = graft.Tables.documents(spark, sf)
      .withColumn("bucket",
        graft.operators.SampleQueries.hashBucket(col("doc_id")))
      .select("doc_id", "lang", "text", "bucket")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val cut = docs.map(_._4).sorted.apply(docs.length / 2)
    val b1 = docs.filter(_._4 < cut).map(d => Doc(d._1, d._2, d._3))
    val b2 = docs.filter(_._4 >= cut).map(d => Doc(d._1, d._2, d._3))
    val mem = MemoryStream[Doc]
    val q = StreamingOps.budgetAdmitStream(mem.toDF())
      .writeStream.format("memory").queryName("admit_stream")
      .outputMode("append").start()
    mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val judged = spark.table("admit_stream").collect()
    val got = judged.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val want = graft.operators.SampleQueries
      .tokenBudgetKeptFrom(graft.Tables.documents(spark, sf))
      .collect().map(_.getLong(1)).toSet
    assert(got == want, "streamed admission diverges from the batch draw")
    // rejected docs flow through flagged, not dropped
    assert(judged.length == docs.length)
  }

  test("streaming anomaly flags equal the batch window up to threshold boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // sf0.01: ~66 events/user, enough to clear the 20-event baseline
    val sfDir = "/root/testdata/sf0.01"
    val evs = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val mid = evs.length / 2
    val mem = MemoryStream[Ev]
    val q = StreamingOps.anomalyStream(mem.toDF())
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    mem.addData(evs.take(mid).toIndexedSeq: _*); q.processAllAvailable()
    mem.addData(evs.drop(mid).toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("anomaly_stream").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val want = graft.operators.WindowQueries.winAnomaly(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(want.nonEmpty, "fixture must produce anomalies")
    // agreeing flags must agree on z exactly
    (got.keySet intersect want.keySet).foreach { id =>
      assert(got(id) == want(id), s"z diverges for $id")
    }
    // any disagreement must sit ON the threshold boundary (the two
    // sides compute variance by different algorithms; last-ulp
    // differences may flip |z| across 2.5 only when z is exactly there)
    val onlyStream = got.keySet diff want.keySet
    val onlyBatch = want.keySet diff got.keySet
    (onlyStream.map(got) ++ onlyBatch.map(want)).foreach { z =>
      assert(math.abs(math.abs(z) - 2.5) < 5e-4,
        s"non-boundary disagreement at z=$z")
    }
    assert((onlyStream.size + onlyBatch.size) <= math.max(2, want.size / 50),
      s"too many boundary disagreements: ${onlyStream.size + onlyBatch.size}")
  }

  test("streaming EWMA equals the batch fold across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the O(1)-per-key streaming twin of ts_ewma (VERDICT r13 task 1):
    // same seed, same 0.3/0.7 recurrence on the RAW prev, same
    // HALF_UP 6-dp emit — fed the whole fixture in ts order split
    // across three micro-batches, every per-event emit must equal the
    // batch collect_list fold bit-for-bit
    val evs = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val mem = MemoryStream[Ev]
    val q = StreamingOps.ewmaStream(mem.toDF())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("update").start()
    val third = evs.length / 3
    mem.addData(evs.take(third).toIndexedSeq: _*); q.processAllAvailable()
    mem.addData(evs.slice(third, 2 * third).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(evs.drop(2 * third).toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("ewma_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val want = graft.operators.TimeSeriesQueries.tsEwma(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(want.nonEmpty && got.size == evs.length,
      s"one emit per event expected: ${got.size} vs ${evs.length}")
    assert(got == want, {
      val bad = want.collect { case (k, v) if got.get(k) != Some(v) =>
        s"$k batch=$v stream=${got.get(k)}" }.take(5)
      s"stream diverges from batch fold: ${bad.mkString("; ")}"
    })
  }

  test("streaming resample equals the batch interpolation grid") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // O(1)-state twin of ts_resample_interpolate: per-(user, ts)
    // deduped readings (the stream contract; the batch op collapses
    // duplicates itself) fed in ts order across three micro-batches
    // must emit EXACTLY the batch grid, values bit-for-bit
    val obs = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("value")).as("value"))
      .orderBy("ts", "user_id")
      .collect()
      .map(r => Ev(0L, r.getTimestamp(1), r.getLong(0), "x",
        r.getDouble(2)))
    val mem = MemoryStream[Ev]
    val q = StreamingOps.resampleStream(mem.toDF())
      .writeStream.format("memory").queryName("resample_stream")
      .outputMode("update").start()
    val third = obs.length / 3
    mem.addData(obs.take(third).toIndexedSeq: _*); q.processAllAvailable()
    mem.addData(obs.slice(third, 2 * third).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(obs.drop(2 * third).toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("resample_stream").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getDouble(2))
      .toMap
    val want = graft.operators.TimeSeriesQueries
      .tsResampleInterpolate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getDouble(2))
      .toMap
    assert(want.nonEmpty && got.size == want.size,
      s"grid cardinality diverges: stream ${got.size} vs batch ${want.size}")
    assert(got == want, {
      val bad = want.collect { case (k, v) if got.get(k) != Some(v) =>
        s"$k batch=$v stream=${got.get(k)}" }.take(5)
      s"stream diverges from batch grid: ${bad.mkString("; ")}"
    })
  }

  test("streaming twins are split-invariant: any micro-batch " +
      "partitioning yields the identical emit set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the state contracts (raw prev, last reading) must make the
    // emit set independent of WHERE the stream is cut — including
    // cuts inside a user's sequence and single-row batches. Seeded
    // deterministic split patterns, no Random.
    val evs = graft.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .orderBy("ts", "event_id").limit(120)
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    def splits(seed: Int): Seq[Seq[Ev]] = {
      var h = seed.toLong
      val cuts = scala.collection.mutable.ArrayBuffer[Int](0)
      while (cuts.last < evs.length) {
        h = h * 6364136223846793005L + 1442695040888963407L
        cuts += math.min(evs.length,
          cuts.last + 1 + math.floorMod(h >>> 33, 17L).toInt)
      }
      cuts.toSeq.sliding(2)
        .map { w => evs.slice(w(0), w(1)).toSeq }
        .filter(_.nonEmpty).toSeq
    }
    def runEwma(batches: Seq[Seq[Ev]], name: String) = {
      val mem = MemoryStream[Ev]
      val q = StreamingOps.ewmaStream(mem.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      batches.foreach { b =>
        mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    val base = runEwma(Seq(evs.toSeq), "ewma_split0")
    assert(base.size == evs.length)
    Seq(1, 2).foreach { seed =>
      val got = runEwma(splits(seed), s"ewma_split$seed")
      assert(got == base, s"ewma emit set moved under split seed $seed")
    }
  }

  test("streaming domain ledger: exact columns match the batch " +
      "ledger, the HLL estimate matches the engine's batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = graft.Tables.documents(spark, sf)
      .select("source", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val mem = MemoryStream[(String, String, Long)]
    val q = StreamingOps.domainStatsStream(
        mem.toDF().toDF("source", "text", "n_chars"))
      .writeStream.format("memory").queryName("domain_stream")
      .outputMode("update").start()
    val third = d.length / 3
    mem.addData(d.take(third).toIndexedSeq: _*); q.processAllAvailable()
    mem.addData(d.slice(third, 2 * third).toIndexedSeq: _*)
    q.processAllAvailable()
    mem.addData(d.drop(2 * third).toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    // update mode emits a ledger row per (source, batch): the LAST
    // emit per source is the final ledger
    val rows = spark.table("domain_stream").collect()
    // n_docs is strictly monotone per source, so maxBy is the
    // order-independent pick of the final ledger (collect() gives no
    // cross-batch ordering guarantee on a memory sink)
    val got = rows.groupBy(_.getString(0)).map { case (s0, rs) =>
      s0 -> rs.maxBy(_.getLong(1))
    }
    // exact columns against the batch operator
    val batch = graft.operators.PipelineQueries
      .curationDomainStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    // the approximate column against the DECLARED batch qid
    // (curation_domain_stats_approx) — same content key, so stream
    // state == the qid's registers == identical estimate
    val hll = graft.operators.PipelineQueries
      .curationDomainStatsApprox(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (s0, r) =>
      val b = batch(s0)
      assert(r.getLong(1) == b.getLong(1), s"$s0 n_docs diverges")
      assert(r.getDouble(4) == b.getDouble(4), s"$s0 short_share")
      assert(r.getDouble(5) == b.getDouble(5), s"$s0 mean_chars")
      assert(r.getLong(2) == hll(s0),
        s"$s0 estimate ${r.getLong(2)} != batch HLL fold ${hll(s0)}")
      // the estimate is within the p=12 error envelope of exact
      val exact = b.getLong(2).toDouble
      assert(math.abs(r.getLong(2) - exact) <= math.max(4.0, exact * 0.08),
        s"$s0 estimate ${r.getLong(2)} far from exact $exact")
    }
  }

  test("streaming EWMA drops replayed / out-of-order rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.ewmaStream(mem.toDF())
      .writeStream.format("memory").queryName("ewma_replay")
      .outputMode("update").start()
    mem.addData(Ev(1, ts(0), 1, "click", 10.0),
      Ev(2, ts(10), 1, "click", 20.0)); q.processAllAvailable()
    // re-delivery of event 2 and a stale pre-state row: both dropped
    mem.addData(Ev(2, ts(10), 1, "click", 20.0),
      Ev(9, ts(5), 1, "click", 99.0),
      Ev(3, ts(20), 1, "click", 30.0)); q.processAllAvailable()
    q.stop()
    val rows = spark.table("ewma_replay").collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), s"late rows leaked: $rows")
    assert(rows(1L) == 10.0)
    assert(rows(2L) == BigDecimal(0.3 * 20.0 + 0.7 * 10.0 + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rows(3L) == BigDecimal(
      0.3 * 30.0 + 0.7 * (0.3 * 20.0 + 0.7 * 10.0) + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("sessionize runs as a real stream (watermark + append)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample: _*)
    val q = StreamingOps.sessionize(mem.toDF())
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // append emits only watermark-closed sessions; the query must at
    // least run without the missing-watermark analysis error
    assert(spark.table("sessions_stream").columns
      .contains("session_start"))
  }

  test("upsert sink bootstraps an empty catalog path") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-boot").toString
    val catalog = s"$tmp/catalog"; val ckpt = s"$tmp/ckpt"
    val inDir = s"$tmp/in"
    new graft.ingest.FixtureGranuleSource(end = "2022-05-01 00:29:59")
      .granules(spark).write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    // no CatalogStore.write first: the sink's first batch must create
    // the catalog rather than die on PATH_NOT_FOUND
    val q = StreamingOps.upsertSink(
      graft.catalog.ItemAssembly.assemble(
        StreamingOps.fileIngest(spark, inDir, schema))._1, catalog, ckpt)
      .start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(catalog).count() > 0)
  }

  test("stream-stream interval join matches its batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val errMem = MemoryStream[Ev]
    val sgMem = MemoryStream[Ev]
    val errors = Seq(Ev(100, ts(30), 1, "error", 0.0))
    val signups = Seq(
      Ev(200, ts(5), 1, "signup", 0.0), // 25 min before → matches
      Ev(201, ts(140), 1, "signup", 0.0), // after the error → no
      Ev(202, ts(25), 2, "signup", 0.0)) // other user → no
    errMem.addData(errors: _*)
    sgMem.addData(signups: _*)
    val q = StreamingOps
      .errorsWithRecentSignups(errMem.toDF(), sgMem.toDF())
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val stream = spark.table("ss_join")
      .select("error_id", "signup_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val batch = StreamingOps
      .errorsWithRecentSignups(errors.toDF(), signups.toDF())
      .select("error_id", "signup_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(stream == batch, s"stream $stream vs batch $batch")
    assert(batch.nonEmpty, "sample must produce at least one pair")
  }

  test("sliding window covers each event in multiple slides") {
    import spark.implicits._
    val slides = StreamingOps.slidingCounts(sample.toDF()).collect()
    // 1h window sliding by 15min ⇒ each event appears in 4 windows
    val totalN = slides.map(_.getAs[Long]("n")).sum
    assert(totalN == sample.length * 4L)
  }

  test("streaming split-leakage ledger: summed deltas equal the " +
      "batch audit; the cross-split alarm fires on a planted leak") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // pick one doc_id per split via the ENGINE's own published rule,
    // so the planted leak is split-crossing by construction
    val buckets = spark.range(0, 200)
      .select(col("id"), graft.operators.SampleQueries
        .hashBucket(col("id")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = buckets.collectFirst { case (i, b) if b < 980 => i }.get
    val testId = buckets.collectFirst { case (i, b) if b >= 990 => i }.get
    val leak = "the exact same eval passage leaked into training"
    val planted = Seq(
      (trainId, "xx", leak, "src", leak.length.toLong),
      (testId, "xx", leak, "src", leak.length.toLong))
    val base = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val all = base ++ planted
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val q = StreamingOps.splitLeakageStream(
        mem.toDF().toDF("doc_id", "lang", "text", "source", "n_chars"))
      .writeStream.format("memory").queryName("splitleak_stream")
      .outputMode("update").start()
    // planted rows split ACROSS batches: the alarm must fire in the
    // batch where the second split first appears, not before
    val third = base.length / 3
    mem.addData(base.take(third) :+ planted(0): _*)
    q.processAllAvailable()
    val alarmsEarly = spark.table("splitleak_stream")
      .filter(col("cross_now") && col("lang") === "xx").count()
    assert(alarmsEarly == 0, "alarm before the second split arrived")
    mem.addData(base.slice(third, 2 * third) :+ planted(1): _*)
    q.processAllAvailable()
    val alarms = spark.table("splitleak_stream")
      .filter(col("cross_now") && col("lang") === "xx").collect()
    assert(alarms.length == 1 && alarms(0).getString(1) ==
      org.apache.commons.codec.digest.DigestUtils.sha256Hex(leak),
      s"exactly one alarm with the leaking hash: ${alarms.toSeq}")
    mem.addData(base.drop(2 * third): _*); q.processAllAvailable()
    q.stop()
    // the ledger is the SUM of the emitted deltas — associative, so
    // any micro-batch split lands on the same totals
    val got = spark.table("splitleak_stream")
      .groupBy("lang").agg(
        sum("d_docs").as("n_docs"),
        sum("d_contents").as("n_contents"),
        sum("d_dup_contents").as("n_dup_contents"),
        sum("d_cross_split_contents").as("n_cross_split_contents"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val dir = java.nio.file.Files
      .createTempDirectory("splitleak").toString
    all.toSeq.toDF("doc_id", "lang", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val want = graft.operators.PipelineQueries
      .pipelineSplitLeakage(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == want, s"stream ledger $got != batch $want")
    assert(want("xx") == ((2L, 1L, 1L, 1L)), want("xx"))
  }

  test("resample coincident midnights: value-exact at a 6-dp " +
      "boundary, first/last-on-midnight dropped — equal to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000L
    // 2024-01-02 00:00:00 UTC as epoch millis (UTC-midnight-aligned
    // by construction — never via a zone-dependent valueOf parse)
    val d0 = java.time.LocalDate.of(2024, 1, 2).toEpochDay * day
    // boundary-crossing pair (ADVICE r14): round6(v) = 1e-6, but the
    // re-associated pv + (v−pv)·1.0 lands an ulp BELOW the HALF_UP
    // boundary and rounds to 0.0 — only a direct emit of v matches
    // the batch zero-numerator path
    val pv = 0.3
    val v = 4.990000000000001e-07
    val rows = Seq(
      // user 1: INTERIOR reading exactly on a midnight (later
      // reading exists) — the grid point must carry round6(v)
      Ev(1, new Timestamp(d0 - day / 2), 1, "x", pv),
      Ev(2, new Timestamp(d0), 1, "x", v),
      Ev(3, new Timestamp(d0 + day / 2), 1, "x", 2.0),
      // user 2: LAST reading on a midnight — the batch grid has no
      // strictly-later bracket there and drops the point
      Ev(4, new Timestamp(d0 - day / 2), 2, "x", 1.0),
      Ev(5, new Timestamp(d0), 2, "x", 5.0),
      // user 3: FIRST reading on a midnight — the batch grid starts
      // the day after t0, so the point never exists
      Ev(6, new Timestamp(d0), 3, "x", 7.0),
      Ev(7, new Timestamp(d0 + day / 2), 3, "x", 9.0))
    val mem = MemoryStream[Ev]
    val q = StreamingOps.resampleStream(mem.toDF())
      .writeStream.format("memory").queryName("resample_midnight")
      .outputMode("update").start()
    rows.foreach { r => mem.addData(r); q.processAllAvailable() }
    q.stop()
    val got = spark.table("resample_midnight").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getDouble(2))
      .toMap
    // batch twin over the identical readings (written as an events
    // table so the DECLARED qid path runs, not a seam)
    val dir = java.nio.file.Files
      .createTempDirectory("resample-mid").toString
    rows.toDF().withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val want = graft.operators.TimeSeriesQueries
      .tsResampleInterpolate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getDouble(2))
      .toMap
    assert(got == want, s"stream $got vs batch $want")
    // and the batch grid is exactly the one interior coincident
    // point, carrying the reading's value on the RIGHT side of the
    // rounding boundary
    assert(want == Map((1L, new Timestamp(d0)) -> 1.0e-6),
      s"unexpected batch grid: $want")
  }

  test("resample keeps min(value) for duplicate (user, ts) rows " +
      "inside one micro-batch — the batch collapse") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val day = 86400000L
    val d0 = java.time.LocalDate.of(2024, 3, 1).toEpochDay * day
    // duplicates arrive LARGEST-FIRST in a single batch: a
    // micros-only sort would keep 9.0 (arrival order); the batch
    // operator collapses to min(value) = 1.0
    val rows = Seq(
      Ev(1, new Timestamp(d0 - day / 2), 7, "x", 9.0),
      Ev(2, new Timestamp(d0 - day / 2), 7, "x", 1.0),
      Ev(3, new Timestamp(d0 + day / 2), 7, "x", 3.0))
    val mem = MemoryStream[Ev]
    val q = StreamingOps.resampleStream(mem.toDF())
      .writeStream.format("memory").queryName("resample_dupmin")
      .outputMode("update").start()
    mem.addData(rows: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("resample_dupmin").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getDouble(2))
      .toMap
    val dir = java.nio.file.Files
      .createTempDirectory("resample-dup").toString
    rows.toDF().withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val want = graft.operators.TimeSeriesQueries
      .tsResampleInterpolate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> r.getDouble(2))
      .toMap
    assert(got == want, s"stream $got vs batch $want")
    // interpolation between min(1.0) and 3.0 at the midpoint = 2.0
    // (keeping the arrival-first 9.0 would have given 6.0)
    assert(want == Map((7L, new Timestamp(d0)) -> 2.0),
      s"unexpected batch grid: $want")
  }

  test("streaming count-min ledger: final registers are identical to " +
      "the batch build, under any micro-batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val users = graft.Tables.events(spark, sf)
      .select("user_id").collect().map(_.getLong(0))
    val want = graft.operators.RelationalQueries.cmsRegisters(
        users.toSeq.toDF("user_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    def streamed(splits: Int): Map[(Int, Long), Long] = {
      val mem = MemoryStream[Long]
      val name = s"cms_stream_$splits"
      val q = StreamingOps.countMinStream(mem.toDF().toDF("user_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      users.grouped(math.max(1, users.length / splits)).foreach { g =>
        mem.addData(g.toIndexedSeq: _*); q.processAllAvailable()
      }
      q.stop()
      // cumulative counts are monotone per register: max = final
      spark.table(name).collect()
        .groupBy(r => (r.getInt(0), r.getLong(1)))
        .map { case (k, rs) => k -> rs.map(_.getLong(2)).max }
    }
    assert(streamed(3) == want,
      "3-split stream registers must equal the batch build")
    assert(streamed(1) == want,
      "single-batch stream registers must equal the batch build")
  }
}
