package graft.operators

import graft.SparkSpec

/** The persisted inverted index (snk_text_index / text_bm25_indexed):
  * the index-served BM25 must reproduce the scan-time BM25 exactly,
  * and serving must touch only the pruned index artifacts — never the
  * corpus. (The audit numbers themselves are oracle-checked by the
  * driver gate; here we pin path parity and the serve plan.)
  */
class TextIndexSpec extends SparkSpec {

  test("index-served bm25 equals scan-time bm25 row for row") {
    val served = TextQueries.textBm25Indexed(spark, sf).collect().toSeq
    val scanned = TextQueries.textBm25(spark, sf).collect().toSeq
    assert(served == scanned,
      s"index path diverged:\nserved=$served\nscanned=$scanned")
  }

  test("serve plan prunes term buckets and never scans the corpus") {
    // the qid routes through the collecting IndexServe facade (a local
    // relation after return) — the plan under pin lives in the lazy
    // internal the facade executes
    val df = TextQueries.bm25ServeFrom(spark,
      TextQueries.buildTextIndex(spark, sf))
    df.collect() // AQE finalizes on execution
    val p = df.queryExecution.executedPlan.toString
    // the bucket predicate must act as directory-level partition
    // pruning, and the term predicate as a pushed row-group filter
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      s"no bucket partition pruning:\n$p")
    assert(p.contains("In(term"), s"term filter not pushed:\n$p")
    // df and stats arrive broadcast; the top-20 is a heap, not a sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), s"serve must not shuffle-join:\n$p")
    // nothing corpus-sized: the documents table is absent from the plan
    assert(!p.contains("documents.parquet"),
      s"serving must read the index, not the corpus:\n$p")
  }

  test("arbitrary term sets serve from the same built index") {
    val root = TextQueries.buildTextIndex(spark, sf)
    val a = TextQueries.bm25ServeFrom(spark, root,
      terms = Seq("the", "data"), k = 5).collect().toSeq
    val b = TextQueries.bm25ServeFrom(spark, root,
      terms = Seq("the", "data"), k = 5).collect().toSeq
    assert(a == b, "serve must be deterministic for any term set")
    assert(a.size <= 5)
    // unknown terms: empty result, not an error
    assert(TextQueries.bm25ServeFrom(spark, root,
      terms = Seq("zzz_not_a_token"), k = 5).collect().isEmpty)
  }

  test("batch serve hash-matches N independent single-query serves") {
    import org.apache.spark.sql.functions.col
    val root = TextQueries.buildTextIndex(spark, sf)
    val batch = TextQueries.textBm25ServeBatch(spark, sf)
    for ((id, terms) <- TextQueries.BM25_BATCH) {
      val slice = batch.filter(col("query_id") === id).drop("query_id")
        .orderBy(col("bm25").desc, col("doc_id")).collect().toSeq
      val single = TextQueries.bm25ServeFrom(spark, root, terms, 20)
        .collect().toSeq
      assert(slice == single,
        s"query $id diverged from its single serve:\n$slice\nvs\n$single")
    }
  }

  test("batch serve is one job: scans don't multiply with queries") {
    import spark.implicits._
    val q = TextQueries.BM25_BATCH
      .flatMap { case (id, ts) => ts.distinct.map(id -> _) }
      .toDF("query_id", "term")
    val df = TextQueries.bm25ServeBatchFrom(spark,
      TextQueries.buildTextIndex(spark, sf), q)
    df.collect() // AQE finalizes on execution
    // AQE's string repeats the tree under "== Initial Plan ==" — count
    // scans in the final section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly the index's two QUERY-DEPENDENT artifacts are scanned —
    // postings and terms — however many queries the batch carries;
    // per-query routing is the broadcast join on term, not extra
    // scans, and the corpus stats fold enters as a driver-memoized
    // literal (liveTextStats), not a scan
    val nScans = "FileScan".r.findAllIn(p).size
    assert(nScans == 2, s"expected 2 index scans, got $nScans:\n$p")
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      s"batched bucket pruning missing:\n$p")
    // per-query top-k through the bounded-heap operator, not a
    // corpus-sized window sort
    assert(p.contains("TopKPerGroup"), s"heap top-k missing:\n$p")
    assert(!p.contains("Window"), s"window leaked into batch serve:\n$p")
    assert(!p.contains("documents.parquet"),
      s"serving must read the index, not the corpus:\n$p")
  }

  test("audit counts the written postings, not the in-flight frame") {
    val row = TextQueries.snkTextIndex(spark, sf).collect().head
    val nDocs = row.getAs[Long]("n_docs")
    val nPostings = row.getAs[Long]("n_postings")
    val totalTf = row.getAs[Long]("total_tf")
    assert(nDocs > 0 && nPostings >= nDocs && totalTf >= nPostings,
      s"degenerate audit: $row")
  }

  test("stream-maintained index serves identically to the batch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (h1, h2) = docs.splitAt(docs.length / 2)
    val root = java.nio.file.Files
      .createTempDirectory("graft-ixstream").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ixckpt").toString
    // two AvailableNow runs over ONE checkpoint: the second start
    // resumes from the offset log, so the halves arrive as two
    // distinct batch ids — a restart, not a replay
    val mem = MemoryStream[(Long, String)]
    mem.addData(h1: _*)
    graft.streaming.StreamingOps
      .indexUpsertSink(mem.toDF().toDF("doc_id", "text"), root, ckpt)
      .start().awaitTermination(120000)
    mem.addData(h2: _*)
    graft.streaming.StreamingOps
      .indexUpsertSink(mem.toDF().toDF("doc_id", "text"), root, ckpt)
      .start().awaitTermination(120000)
    val streamed = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
    val batch = TextQueries.textBm25(spark, sf).collect().toSeq
    assert(streamed == batch,
      s"incremental index diverged:\nstreamed=$streamed\nbatch=$batch")
  }

  test("an empty batch is a no-op, before and after the first data") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft-ixempty").toString
    // empty FIRST batch: must not create an unreadable postings dir
    TextQueries.appendToIndex(docs.limit(0), root, 0L)
    TextQueries.appendToIndex(docs, root, 1L)
    TextQueries.appendToIndex(docs.limit(0), root, 2L)
    val ref = java.nio.file.Files
      .createTempDirectory("graft-ixref").toString
    TextQueries.appendToIndex(docs, ref, 0L)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, ref).collect().toSeq)
  }

  test("incremental maintenance matches scan-time bm25 on random corpora and splits") {
    // seeded trials: arbitrary tiny corpora, arbitrary 1-3-way batch
    // splits through the SAME merge kernel — the served top-20 must
    // equal the scan-time computation every time (including corpora
    // where no document contains any query term → both sides empty)
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val vocab = Vector("spark", "vector", "stream", "the", "a", "data",
      "x1", "y2", "lake", "row")
    for (trial <- 1 to 4) {
      val nDocs = 5 + rng.nextInt(20)
      val docs = (1 to nDocs).map { i =>
        val len = 1 + rng.nextInt(30)
        (i.toLong,
          Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" "),
          "en", "synth", 0L)
      }
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-ixprop$trial").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-ixproot$trial").toString
      val k = 1 + rng.nextInt(3)
      val shuffled = rng.shuffle(docs)
      val batchSize = math.max(1, (shuffled.size + k - 1) / k)
      shuffled.grouped(batchSize).zipWithIndex.foreach { case (p, id) =>
        TextQueries.appendToIndex(
          p.map { case (d, t, _, _, _) => (d, t) }.toDF("doc_id", "text"),
          root, id.toLong)
      }
      val served = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
      val scanned = TextQueries.textBm25(spark, dir).collect().toSeq
      assert(served == scanned,
        s"trial $trial (n=$nDocs, k=$k) diverged:\n$served\nvs\n$scanned")
    }
  }

  test("replaying a batch id overwrites itself — no double counting") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val once = java.nio.file.Files
      .createTempDirectory("graft-ixonce").toString
    val twice = java.nio.file.Files
      .createTempDirectory("graft-ixtwice").toString
    TextQueries.appendToIndex(docs, once, 0L)
    TextQueries.appendToIndex(docs, twice, 0L)
    TextQueries.appendToIndex(docs, twice, 0L) // simulated streaming retry
    def counts(root: String): (Long, Long) = {
      val p = spark.read.parquet(s"$root/postings")
      val st = spark.read.parquet(s"$root/stats")
        .agg(org.apache.spark.sql.functions.sum("n_docs")).collect()
        .head.getDouble(0).toLong
      (p.count(), st)
    }
    assert(counts(once) == counts(twice),
      "a replayed batch must overwrite its own partitions, not append")
    assert(TextQueries.bm25ServeFrom(spark, once).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twice).collect().toSeq)
  }
}
