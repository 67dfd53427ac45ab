package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tombstone deletes on the persisted indexes (IndexDeletes +
  * deleteFromTextIndex / deleteFromVectorIndex): a deleted id must be
  * invisible to every serve path the moment the tombstone lands —
  * with EXACT score parity against an index whose corpus never held
  * the deleted docs (postings, df, and corpus stats all corrected) —
  * replays and re-deletes must be no-ops, and the next compaction
  * must remove the rows physically and clear the tombstones.
  */
class IndexDeleteSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))

  private def tmpRoot(prefix: String): String = {
    val r = Files.createTempDirectory(prefix).toString
    IndexManifest.registerTempRoot(r)
    r
  }

  /** Streamed-in text root (3 batches) with doc_id ≡ 2 (mod 5)
    * tombstoned as batch 3, plus a never-deleted twin over the
    * filtered corpus. */
  private def deletedAndTwin(): (String, String, Long) = {
    val root = tmpRoot("graft-del")
    (0 to 2).foreach { b =>
      TextQueries.appendToIndex(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), root, b.toLong)
    }
    val n = TextQueries.deleteFromTextIndex(spark, root,
      docs.filter(pmod(col("doc_id"), lit(5)) === 2).select("doc_id"), 3L)
    val twin = tmpRoot("graft-del-twin")
    TextQueries.appendToIndex(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 2), twin, 0L)
    (root, twin, n)
  }

  test("text: a deleted doc is invisible with exact filtered-corpus parity") {
    val (root, twin, n) = deletedAndTwin()
    assert(n == docs.filter(pmod(col("doc_id"), lit(5)) === 2).count())
    // single serve: scores depend on postings AND df AND n_docs/avgdl —
    // exact equality proves all three corrections, not just the hide
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
    val alt = Seq("the", "data")
    assert(TextQueries.bm25ServeFrom(spark, root, alt, 7).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin, alt, 7).collect().toSeq)
    // batch serve path shares the correction logic but is its own code
    import spark.implicits._
    val q = TextQueries.BM25_BATCH
      .flatMap { case (id, ts) => ts.distinct.map(id -> _) }
      .toDF("query_id", "term")
    assert(
      TextQueries.bm25ServeBatchFrom(spark, root, q)
        .collect().map(_.toString).sorted.toSeq ==
      TextQueries.bm25ServeBatchFrom(spark, twin, q)
        .collect().map(_.toString).sorted.toSeq)
  }

  test("text: delete replays overwrite themselves; re-deletes are no-ops") {
    val (root, _, n) = deletedAndTwin()
    val ids = docs.filter(pmod(col("doc_id"), lit(5)) === 2).select("doc_id")
    val serveBefore = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
    val statsBefore = spark.read.parquet(s"$root/stats")
      .agg(sum("n_docs"), sum("sum_dl")).collect().head
    // replay of the SAME delete batch recomputes the same newly-set
    assert(TextQueries.deleteFromTextIndex(spark, root, ids, 3L) == n)
    // re-delete of already-dead ids under a FRESH batch is a no-op
    assert(TextQueries.deleteFromTextIndex(spark, root, ids, 4L) == 0L)
    assert(spark.read.parquet(s"$root/deletes")
      .select("doc_id").distinct().count() == n)
    assert(spark.read.parquet(s"$root/stats")
      .agg(sum("n_docs"), sum("sum_dl")).collect().head == statsBefore)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq
      == serveBefore)
  }

  test("text: compaction applies deletes physically and clears tombstones") {
    val (root, twin, _) = deletedAndTwin()
    val before = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
    val stats = TextQueries.compactTextIndex(spark, root)
    assert(stats.forall(!_.noop))
    // rows physically gone from every layout, tombstones cleared
    assert(spark.read.parquet(s"$root/postings")
      .filter(pmod(col("doc_id"), lit(5)) === 2).count() == 0)
    assert(spark.read.parquet(s"$root/doclens")
      .filter(pmod(col("doc_id"), lit(5)) === 2).count() == 0)
    assert(!Files.exists(Paths.get(root, "deletes")))
    // folded stats row equals the live corpus's
    val live = spark.read.parquet(s"$root/stats").collect().head
    val ref = spark.read.parquet(s"$twin/stats").collect().head
    assert(live.getAs[Double]("n_docs") == ref.getAs[Double]("n_docs"))
    assert(live.getAs[Double]("sum_dl") == ref.getAs[Double]("sum_dl"))
    // terms/ df was rebuilt over live postings: the no-tombstone serve
    // path (terms-table df) must still match the twin exactly
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq == before)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
    // stats folded through the DELETE batch id (3) even though
    // postings only held ids 0-2 — ingest must restart above BOTH
    assert(IndexCompaction.compactedThrough(root, "stats") == 3L)
    val e = intercept[IllegalArgumentException] {
      TextQueries.appendToIndex(
        docs.withColumn("doc_id", col("doc_id") + 500000L), root, 3L)
    }
    assert(e.getMessage.contains("at stats"))
    TextQueries.appendToIndex(
      docs.withColumn("doc_id", col("doc_id") + 500000L), root, 4L)
  }

  test("text: delete batches respect the compaction guard") {
    val (root, _, _) = deletedAndTwin()
    TextQueries.compactTextIndex(spark, root)
    val e = intercept[IllegalArgumentException] {
      TextQueries.deleteFromTextIndex(spark, root,
        docs.select("doc_id").limit(1), 2L)
    }
    assert(e.getMessage.contains("compacted through"))
  }

  test("text: durable root serves deletes after reopen") {
    val root = tmpRoot("graft-del-durable")
    TextQueries.buildTextIndexAt(spark, sf, root)
    TextQueries.deleteFromTextIndex(spark, root,
      docs.filter(pmod(col("doc_id"), lit(5)) === 2).select("doc_id"), 1L)
    val served = TextQueries.bm25ServeFrom(
      spark, TextQueries.openTextIndex(root)).collect().toSeq
    val twin = tmpRoot("graft-del-durable-twin")
    TextQueries.appendToIndex(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 2), twin, 0L)
    assert(served == TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
  }

  /** Vector root with every vector ingested and doc_id ≡ 2 (mod 5)
    * tombstoned, plus a twin sharing the SAME quantizer whose corpus
    * never held the deleted vectors. */
  private def vecDeletedAndTwin(): (String, String) = {
    val e = graft.Tables.embeddings(spark, sf)
    val root = tmpRoot("graft-vdel")
    SimilarityQueries.initVectorIndex(e, root)
    val twin = tmpRoot("graft-vdel-twin")
    Files.createDirectories(Paths.get(twin, "centroids"))
    // identical quantizer by construction: copy the frozen centroids
    val src = Paths.get(root, "centroids")
    val walk = Files.walk(src)
    try walk.iterator().forEachRemaining { p =>
      if (Files.isRegularFile(p))
        Files.copy(p, Paths.get(twin, "centroids",
          p.getFileName.toString))
    } finally walk.close()
    SimilarityQueries.appendToVectorIndex(e, root, 0L)
    SimilarityQueries.deleteFromVectorIndex(spark, root,
      e.filter(pmod(col("vec_id"), lit(5)) === 2).select("vec_id"), 1L)
    SimilarityQueries.appendToVectorIndex(
      e.filter(pmod(col("vec_id"), lit(5)) =!= 2), twin, 0L)
    (root, twin)
  }

  test("vector: deleted ids vanish from both serve paths with twin parity") {
    val (root, twin) = vecDeletedAndTwin()
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, sf))
    val qs = e.filter(col("vec_id").isin(0L, 7L, 26L))
      .select(col("vec_id"), col("emb"), col("nrm")).collect()
    qs.foreach { r =>
      val qv = r.getSeq[Double](1).toArray
      val a = SimilarityQueries
        .annServeFrom(spark, root, qv, r.getDouble(2)).collect().toSeq
      assert(a.forall(_.getLong(0) % 5 != 2))
      assert(a == SimilarityQueries
        .annServeFrom(spark, twin, qv, r.getDouble(2)).collect().toSeq)
    }
    val q = e.filter(col("vec_id").isin(0L, 7L, 26L))
      .select(col("vec_id").as("query_id"),
        col("emb").as("qv"), col("nrm").as("qn"))
    val a = SimilarityQueries.annServeBatchFrom(spark, root, q)
      .collect().map(_.toString).sorted.toSeq
    val b = SimilarityQueries.annServeBatchFrom(spark, twin, q)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("vector: compaction applies deletes physically and clears them") {
    val (root, _) = vecDeletedAndTwin()
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, sf))
    val q = e.filter(col("vec_id") === 0L)
      .select(col("emb"), col("nrm")).collect().head
    val qv = q.getSeq[Double](0).toArray
    val before = SimilarityQueries
      .annServeFrom(spark, root, qv, q.getDouble(1)).collect().toSeq
    val st = SimilarityQueries.compactVectorIndex(spark, root)
    assert(!st.noop)
    assert(spark.read.parquet(s"$root/assignments")
      .filter(pmod(col("vec_id"), lit(5)) === 2).count() == 0)
    assert(!Files.exists(Paths.get(root, "deletes")))
    assert(SimilarityQueries
      .annServeFrom(spark, root, qv, q.getDouble(1)).collect().toSeq
      == before)
  }

  test("vector: a replayed delete batch is fenced after compaction") {
    val (root, _) = vecDeletedAndTwin()
    SimilarityQueries.compactVectorIndex(spark, root)
    val e = graft.Tables.embeddings(spark, sf)
    // a previously deleted id legitimately re-ingested after the fold
    SimilarityQueries.appendToVectorIndex(
      e.filter(pmod(col("vec_id"), lit(5)) === 2), root, 2L)
    // the delete stream loses its checkpoint and replays batch 1 —
    // without the fence this would silently re-erase the re-ingested
    // ids; with it the replay fails loudly
    val ex = intercept[IllegalArgumentException] {
      SimilarityQueries.deleteFromVectorIndex(spark, root,
        e.filter(pmod(col("vec_id"), lit(5)) === 2).select("vec_id"), 1L)
    }
    assert(ex.getMessage.contains("at deletes"))
    // fresh delete batches above the fence still land
    assert(SimilarityQueries.deleteFromVectorIndex(spark, root,
      e.filter(col("vec_id") === 7).select("vec_id"), 3L) == 1L)
  }

  test("tombstones do not cost the serve plan its pruning") {
    val (root, _, _) = deletedAndTwin()
    val df = TextQueries.bm25ServeFrom(spark, root)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the anti-join must ride a broadcast; bucket partition pruning
    // and the pushed term filter survive untouched
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      s"tombstones broke bucket pruning:\n$p")
    assert(p.contains("In(term"), s"term filter not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"tombstone filter is not a broadcast anti-join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"serve must not shuffle-join:\n$p")
  }

  test("streamed takedown feed serves like the batch delete") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmpRoot("graft-sdel")
    // the ingest arrives through the STREAMING sink too — two halves
    // over one checkpoint land on the even id lane (0, 2), proving the
    // two streams' lanes interleave against one root without a
    // batch-id collision (stats partitions key on batch_id alone)
    val ingestCkpt = Files.createTempDirectory("graft-sdel-ing").toString
    val docRows = docs.as[(Long, String)].collect().toSeq
    val (d1, d2) = docRows.splitAt(docRows.length / 2)
    val ingest = MemoryStream[(Long, String)]
    ingest.addData(d1: _*)
    graft.streaming.StreamingOps
      .indexUpsertSink(ingest.toDF().toDF("doc_id", "text"), root, ingestCkpt)
      .start().awaitTermination(120000)
    ingest.addData(d2: _*)
    graft.streaming.StreamingOps
      .indexUpsertSink(ingest.toDF().toDF("doc_id", "text"), root, ingestCkpt)
      .start().awaitTermination(120000)
    assert(IndexCompaction.listBatchIds(
      java.nio.file.Paths.get(root, "stats")).sorted == Seq(0L, 2L))
    val delIds = docs.filter(pmod(col("doc_id"), lit(5)) === 2)
      .select("doc_id").as[Long].collect().toSeq
    val (h1, h2) = delIds.splitAt(delIds.length / 2)
    val ckpt = Files.createTempDirectory("graft-sdel-ckpt").toString
    // two AvailableNow runs over one checkpoint: two micro-batch ids,
    // mapped to the odd id lane (2k+1) so they interleave with the
    // even-lane ingest ids instead of towering above them
    val mem = MemoryStream[Long]
    mem.addData(h1: _*)
    graft.streaming.StreamingOps
      .indexDeleteSink(mem.toDF().toDF("doc_id"), root, ckpt)
      .start().awaitTermination(120000)
    mem.addData(h2: _*)
    graft.streaming.StreamingOps
      .indexDeleteSink(mem.toDF().toDF("doc_id"), root, ckpt)
      .start().awaitTermination(120000)
    val twin = tmpRoot("graft-sdel-twin")
    TextQueries.appendToIndex(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 2), twin, 0L)
    val served = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
    assert(served == TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
    // a third run with no new data replays nothing and changes nothing
    graft.streaming.StreamingOps
      .indexDeleteSink(mem.toDF().toDF("doc_id"), root, ckpt)
      .start().awaitTermination(120000)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq == served)
    assert(spark.read.parquet(s"$root/deletes")
      .select("doc_id").distinct().count() == delIds.length)
  }

  test("both stream lanes resume above a compaction fence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmpRoot("graft-lane")
    // ingest lane (even) + takedown lane (odd), then quiesce + compact
    val rows = docs.as[(Long, String)].collect().toSeq
    val ing = MemoryStream[(Long, String)]
    ing.addData(rows: _*)
    val ingCkpt = Files.createTempDirectory("graft-lane-i").toString
    graft.streaming.StreamingOps
      .indexUpsertSink(ing.toDF().toDF("doc_id", "text"), root, ingCkpt)
      .start().awaitTermination(120000)
    val del = MemoryStream[Long]
    del.addData(rows.filter(_._1 % 5 == 2).map(_._1): _*)
    val delCkpt = Files.createTempDirectory("graft-lane-d").toString
    graft.streaming.StreamingOps
      .indexDeleteSink(del.toDF().toDF("doc_id"), root, delCkpt)
      .start().awaitTermination(120000)
    TextQueries.compactTextIndex(spark, root)
    // resume BOTH lanes with fresh checkpoints (the documented
    // post-compaction restart): the fence sits at the delete batch's
    // id, yet each lane's FIRST new batch must clear it — with a
    // fixed 2k/2k+1 mapping the shorter-lived stream would wedge here
    val ing2 = MemoryStream[(Long, String)]
    ing2.addData(rows.map { case (id, t) => (id + 700000L, t) }: _*)
    graft.streaming.StreamingOps
      .indexUpsertSink(ing2.toDF().toDF("doc_id", "text"), root,
        Files.createTempDirectory("graft-lane-i2").toString)
      .start().awaitTermination(120000)
    val del2 = MemoryStream[Long]
    del2.addData(rows.filter(_._1 % 5 == 3).map(_._1): _*)
    graft.streaming.StreamingOps
      .indexDeleteSink(del2.toDF().toDF("doc_id"), root,
        Files.createTempDirectory("graft-lane-d2").toString)
      .start().awaitTermination(120000)
    // serve equals a batch-built twin of (docs minus %5∈{2,3}) ∪ resumed
    val twin = tmpRoot("graft-lane-twin")
    TextQueries.appendToIndex(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 2 &&
        pmod(col("doc_id"), lit(5)) =!= 3)
        .unionByName(docs.withColumn("doc_id", col("doc_id") + 700000L)),
      twin, 0L)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
  }

  test("streamed vector takedown hides ids as batches commit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = graft.Tables.embeddings(spark, sf)
    val root = tmpRoot("graft-svdel")
    SimilarityQueries.initVectorIndex(e, root)
    SimilarityQueries.appendToVectorIndex(e, root, 0L)
    val delIds = e.filter(pmod(col("vec_id"), lit(5)) === 2)
      .select("vec_id").as[Long].collect().toSeq
    val ckpt = Files.createTempDirectory("graft-svdel-ckpt").toString
    val mem = MemoryStream[Long]
    mem.addData(delIds: _*)
    graft.streaming.StreamingOps
      .vectorDeleteSink(mem.toDF().toDF("vec_id"), root, ckpt)
      .start().awaitTermination(120000)
    val q = SimilarityQueries.withNorm(e).filter(col("vec_id") === 0)
      .select(col("emb"), col("nrm")).collect().head
    val served = SimilarityQueries.annServeFrom(spark, root,
      q.getSeq[Double](0).toArray, q.getDouble(1), topK = 100).collect()
    assert(served.nonEmpty && served.forall(_.getLong(0) % 5 != 2))
    // replay run with no new data changes nothing
    graft.streaming.StreamingOps
      .vectorDeleteSink(mem.toDF().toDF("vec_id"), root, ckpt)
      .start().awaitTermination(120000)
    assert(spark.read.parquet(s"$root/deletes")
      .select("vec_id").distinct().count() == delIds.length)
  }

  test("text: a fully-tombstoned bucket dir is removed by compaction") {
    val root = tmpRoot("graft-del-bucket")
    (0 to 2).foreach { b =>
      TextQueries.appendToIndex(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), root, b.toLong)
    }
    // the bucket with the fewest distinct docs — tombstone its WHOLE
    // membership so the delete-applying fold empties the bucket dir
    val target = spark.read.parquet(s"$root/postings")
      .groupBy(col("bucket").cast("int").as("bucket"))
      .agg(countDistinct(col("doc_id")).as("n"))
      .orderBy(col("n"), col("bucket")).collect().head.getInt(0)
    val victimIds = spark.read.parquet(s"$root/postings")
      .filter(col("bucket") === target).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    import spark.implicits._
    assert(TextQueries.deleteFromTextIndex(spark, root,
      victimIds.toDF("doc_id"), 3L) == victimIds.length)
    TextQueries.compactTextIndex(spark, root)
    // the emptied dir must be GONE: a stale survivor (it has no staged
    // counterpart — Spark writes no partition dir for zero rows) would
    // resurrect the docs the moment their tombstones were cleared
    assert(!Files.exists(Paths.get(root, "postings", s"bucket=$target")))
    assert(!Files.exists(Paths.get(root, "deletes")))
    assert(spark.read.parquet(s"$root/postings")
      .filter(col("doc_id").isin(victimIds.map(Long.box): _*))
      .count() == 0)
    // full serve parity against a twin that never held the victims
    val twin = tmpRoot("graft-del-bucket-twin")
    TextQueries.appendToIndex(
      docs.filter(!col("doc_id").isin(victimIds.map(Long.box): _*)),
      twin, 0L)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
  }

  test("vector: a fully-tombstoned cid list dir is removed by compaction") {
    val e = graft.Tables.embeddings(spark, sf)
    val root = tmpRoot("graft-vdel-cid")
    SimilarityQueries.initVectorIndex(e, root)
    SimilarityQueries.appendToVectorIndex(e, root, 0L)
    val target = spark.read.parquet(s"$root/assignments")
      .groupBy(col("cid").cast("long").as("cid"))
      .agg(countDistinct(col("vec_id")).as("n"))
      .orderBy(col("n"), col("cid")).collect().head.getLong(0)
    val victimIds = spark.read.parquet(s"$root/assignments")
      .filter(col("cid") === target).select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    import spark.implicits._
    assert(SimilarityQueries.deleteFromVectorIndex(spark, root,
      victimIds.toDF("vec_id"), 1L) == victimIds.length)
    SimilarityQueries.compactVectorIndex(spark, root)
    assert(!Files.exists(Paths.get(root, "assignments", s"cid=$target")))
    assert(!Files.exists(Paths.get(root, "deletes")))
    assert(spark.read.parquet(s"$root/assignments")
      .filter(col("vec_id").isin(victimIds.map(Long.box): _*))
      .count() == 0)
  }

  /** A root whose doclens/ sidecar covers only SOME ingest batches —
    * the shape an upgraded pre-sidecar deployment has after its first
    * post-upgrade append: postings batches 0-2, sidecar rows for
    * batch 2 only. */
  private def partialSidecarRoot(): String = {
    val root = tmpRoot("graft-del-partial")
    (0 to 2).foreach { b =>
      TextQueries.appendToIndex(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), root, b.toLong)
    }
    Seq(0L, 1L).foreach { b =>
      IndexManifest.deleteRecursively(
        Paths.get(root, "doclens", s"batch_id=$b"))
    }
    root
  }

  test("text: deletes land for docs whose batch predates the sidecar") {
    val root = partialSidecarRoot()
    // victims live in batch 0 — the sidecar has no row for them, and a
    // sidecar-trusting delete would silently return 0 (a failed
    // takedown); coverage pricing must re-derive their lengths from
    // exactly the uncovered postings batches
    import spark.implicits._
    val ids = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select("doc_id").orderBy("doc_id").limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(TextQueries.deleteFromTextIndex(spark, root,
      ids.toDF("doc_id"), 3L) == ids.length)
    // the stats correction priced the REAL lengths: parity with a twin
    val twin = tmpRoot("graft-del-partial-twin")
    TextQueries.appendToIndex(
      docs.filter(!col("doc_id").isin(ids.map(Long.box): _*)), twin, 0L)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
  }

  test("text: compaction backfills a partial sidecar before folding") {
    val root = partialSidecarRoot()
    TextQueries.compactTextIndex(spark, root)
    // post-fold the sidecar must cover the whole corpus — the fold
    // relabels batch ids, so an unfilled gap would be undetectable
    // (and every later delete of an old-batch doc a silent no-op)
    assert(spark.read.parquet(s"$root/doclens").count() == docs.count())
    import spark.implicits._
    val ids = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .select("doc_id").orderBy("doc_id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(TextQueries.deleteFromTextIndex(spark, root,
      ids.toDF("doc_id"), 4L) == ids.length)
  }

  test("text: compaction re-derives stats after a crashed delete") {
    val root = tmpRoot("graft-del-crash")
    (0 to 1).foreach { b =>
      TextQueries.appendToIndex(
        docs.filter(pmod(col("doc_id"), lit(2)) === b), root, b.toLong)
    }
    // simulate deleteFromTextIndex dying between its tombstone write
    // and its negative stats row: tombstones exist, stats un-corrected
    val victims = docs.filter(pmod(col("doc_id"), lit(5)) === 2)
      .select("doc_id")
    IndexDeletes.writeTombstones(victims, root, "doc_id", 2L)
    TextQueries.compactTextIndex(spark, root)
    // the fold must NOT trust the (skewed) per-batch stats sum — it
    // re-derives from the live doclens, so the skew cannot become
    // permanent
    val twin = tmpRoot("graft-del-crash-twin")
    TextQueries.appendToIndex(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 2), twin, 0L)
    val live = spark.read.parquet(s"$root/stats").collect().head
    val ref = spark.read.parquet(s"$twin/stats").collect().head
    assert(live.getAs[Double]("n_docs") == ref.getAs[Double]("n_docs"))
    assert(live.getAs[Double]("sum_dl") == ref.getAs[Double]("sum_dl"))
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
  }

  test("migrateToLanes lets both streams join a pre-lane root immediately") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmpRoot("graft-mig")
    // a legacy root: three identity-mapped ingest batches (the
    // pre-lane sink behavior), never compacted — no fence anywhere
    (0 to 2).foreach { b =>
      TextQueries.appendToIndex(
        docs.filter(pmod(col("doc_id"), lit(3)) === b), root, b.toLong)
    }
    graft.streaming.StreamingOps.migrateToLanes(root)
    // both lanes start one past the legacy ids: base = 4 (even)
    // — WITHOUT a compaction, the legacy batch dirs untouched
    val rows = docs.as[(Long, String)].collect().toSeq
    val ing = MemoryStream[(Long, String)]
    ing.addData(rows.map { case (id, t) => (id + 800000L, t) }: _*)
    graft.streaming.StreamingOps
      .indexUpsertSink(ing.toDF().toDF("doc_id", "text"), root,
        Files.createTempDirectory("graft-mig-i").toString)
      .start().awaitTermination(120000)
    val del = MemoryStream[Long]
    del.addData(rows.filter(_._1 % 5 == 2).map(_._1): _*)
    graft.streaming.StreamingOps
      .indexDeleteSink(del.toDF().toDF("doc_id"), root,
        Files.createTempDirectory("graft-mig-d").toString)
      .start().awaitTermination(120000)
    assert(IndexCompaction.listBatchIds(
      Paths.get(root, "postings")).sorted == Seq(0L, 1L, 2L, 4L))
    assert(IndexCompaction.listBatchIds(
      Paths.get(root, IndexDeletes.Subdir)) == Seq(5L))
    // serve parity: (legacy ∪ streamed) minus the takedown set
    val twin = tmpRoot("graft-mig-twin")
    TextQueries.appendToIndex(
      docs.filter(pmod(col("doc_id"), lit(5)) =!= 2)
        .unionByName(docs.withColumn("doc_id", col("doc_id") + 800000L)),
      twin, 0L)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
    // the armed fence rejects a legacy id replay loudly
    val e = intercept[IllegalArgumentException] {
      TextQueries.appendToIndex(docs.limit(1), root, 2L)
    }
    assert(e.getMessage.contains("compacted through"))
    // re-running re-fences at the new max id — a later re-adoption
    // (fresh checkpoints again) starts above the streamed batches
    graft.streaming.StreamingOps.migrateToLanes(root)
    assert(graft.streaming.StreamingOps.laneBase(root) >= 6L)
    // fences only rise: a compaction folding to a LOWER max batch id
    // (postings top out at 4, the migration fence sits at 5) must not
    // lower the stamped fence — that would re-admit the legacy-id
    // replays the migration promised to reject
    TextQueries.compactTextIndex(spark, root)
    assert(IndexCompaction.compactedThrough(root, "postings") >= 5L,
      "compaction lowered a migration fence")
  }

  test("migrateToLanes is maintenance: leased, and replays pending journals") {
    val root = tmpRoot("graft-mig-mnt")
    (0 to 1).foreach { b =>
      TextQueries.appendToIndex(
        docs.filter(pmod(col("doc_id"), lit(2)) === b), root, b.toLong)
    }
    // it moves fences, so it refuses under a live serve lease — the
    // same discipline as the swap ops
    IndexLease.withServeLease(root) {
      val e = intercept[IllegalStateException] {
        graft.streaming.StreamingOps.migrateToLanes(root)
      }
      assert(e.getMessage.contains("serve lease"))
    }
    // and a crashed compaction's journal replays BEFORE fences rise —
    // raising compact.through over an unreplayed pending swap would
    // intertwine two recovery states
    val before = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
    IndexCompaction.stage(spark, root, "postings", Seq("bucket"),
      identity, mx = 1L)
    IndexCompaction.journal(root, "postings", 1L)
    graft.streaming.StreamingOps.migrateToLanes(root)
    assert(!Files.exists(Paths.get(root, "postings.compacting")))
    assert(IndexCompaction.listBatchIds(
      Paths.get(root, "postings")) == Seq(1L))
    assert(IndexCompaction.compactedThrough(root, "postings") == 1L)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq == before)
  }

  test("the declared delete qids audit the serve-visible live set") {
    val t = TextQueries.snkTextIndexDelete(spark, sf).collect().head
    assert(t.getAs[Long]("n_tombstones") ==
      docs.filter(pmod(col("doc_id"), lit(7)) === 3).count())
    assert(t.getAs[Long]("n_docs") ==
      docs.filter(pmod(col("doc_id"), lit(7)) =!= 3).count())
    val v = SimilarityQueries.snkVectorIndexDelete(spark, sf).collect().head
    assert(v.getAs[Long]("n_tombstones") > 0)
    assert(v.getAs[Long]("n_live_vectors") > 0)
  }
}
