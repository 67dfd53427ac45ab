package graft.operators

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** One sweep over EVERY per-(JVM, corpus) memo cache (VERDICT r14
  * task 7): the knnCache discipline — keyed by dir, fingerprint in
  * the value, regeneration-in-place refreshes, memo hits return the
  * cached artifact — must hold for ALL of them, so the r13 ADVICE
  * class (a stale memo serving a regenerated corpus) cannot recur in
  * a cache added after the KnnCacheSpec landed. Covers bpeMergeCache
  * and kmeansCache here; knnCache keeps its own KnnCacheSpec.
  *
  * Also pins the LazyCell contract behind all three (ADVICE r14): the
  * ConcurrentHashMap.compute remapping only ALLOCATES, builds run
  * outside the map's bin lock, concurrent same-key callers share ONE
  * build, and `completed` never forces a build. */
class MemoCachesSpec extends SparkSpec {

  // ── LazyCell: the holder every memo cache now stores ──

  test("LazyCell builds once under concurrent access and " +
      "`completed` never forces the build") {
    val builds = new AtomicInteger(0)
    val cell = new LazyCell[Int]({ () =>
      builds.incrementAndGet(); 42
    })
    assert(cell.completed.isEmpty && builds.get() == 0,
      "completed must not trigger the build")
    val threads = (1 to 8).map { _ =>
      new Thread(() => { val _ = cell.value })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(cell.value == 42 && builds.get() == 1,
      s"expected exactly one build, got ${builds.get()}")
    assert(cell.completed.contains(42))
  }

  test("LazyCell: a map holding building cells never blocks other " +
      "keys behind a slow build (the compute-only-allocates contract)") {
    val m = new java.util.concurrent.ConcurrentHashMap[String, LazyCell[Int]]()
    val slowStarted = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    // allocate BOTH cells through compute first — with the old shape
    // (build inside compute) the slow build would hold the bin lock
    // and a same-bin key's compute would block for the build's wall
    m.compute("slow", (_, _) => new LazyCell({ () =>
      slowStarted.countDown()
      release.await(60, TimeUnit.SECONDS); 1
    }))
    val t = new Thread(() => { val _ = m.get("slow").value })
    t.start()
    assert(slowStarted.await(30, TimeUnit.SECONDS), "slow build started")
    // while the slow build is RUNNING, compute on every other key —
    // including ones hashing anywhere — must return immediately
    val done = (1 to 64).forall { i =>
      val c = m.compute(s"k$i", (_, prev) =>
        if (prev != null) prev else new LazyCell({ () => i }))
      c.value == i
    }
    release.countDown(); t.join(30000)
    assert(done, "other keys must not wait behind a building cell")
    assert(m.get("slow").value == 1)
  }

  test("LazyCell: a throwing build is not cached — the next access " +
      "retries the thunk") {
    val calls = new AtomicInteger(0)
    val cell = new LazyCell[Int]({ () =>
      if (calls.incrementAndGet() == 1) sys.error("transient") else 7
    })
    intercept[RuntimeException](cell.value)
    assert(cell.completed.isEmpty,
      "a failed build must not look completed")
    assert(cell.value == 7 && calls.get() == 2)
  }

  // ── bpeMergeCache: regenerate-in-place + memo-hit identity ──

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, text) =>
      (id, text, "en", "src", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("bpeMergeCache: unchanged corpus is a memo hit; in-place " +
      "regeneration retrains on the new text") {
    val dir = java.nio.file.Files
      .createTempDirectory("bpememo").toString
    writeDocs(dir, Seq((1L, "abab abab cd"), (2L, "abab cd cd")))
    val m1 = TextQueries.textBpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    // round 1 on this corpus merges the most frequent adjacent pair:
    // (a, b) appears 2×3 = 6 times
    assert(m1.nonEmpty && m1.head._2 == "a" && m1.head._3 == "b",
      s"unexpected first merge: ${m1.head}")
    val m1Again = TextQueries.textBpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m1.toSeq == m1Again.toSeq, "memo hit must replay the list")

    // regenerate IN PLACE with a disjoint alphabet: a stale memo
    // would keep emitting (a, b) merges for text that has no 'a'
    writeDocs(dir, Seq((1L, "xyxy xyxy"), (2L, "xyxy zz")))
    val m2 = TextQueries.textBpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(m2.nonEmpty && m2.head._2 == "x" && m2.head._3 == "y",
      s"stale merges served after regeneration: ${m2.head}")
    assert(!m2.exists(m => m._2.contains("a") || m._3.contains("a")))
  }

  // ── kmeansCache: fingerprint lives in the KEY — regeneration is a
  //    new key, never a stale hit ──

  private def writeEmb(dir: String, ids: Seq[Long], shift: Float): Unit = {
    import spark.implicits._
    ids.map(i => (i,
      Seq(shift + i % 4, 2.0f + (i % 3), 3.0f + (i % 5)), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("kmeansCache: in-place regeneration converges on the NEW " +
      "vectors; unchanged corpus replays the memoized centroids") {
    val dir = java.nio.file.Files
      .createTempDirectory("kmeansmemo").toString
    writeEmb(dir, 0L to 31L, shift = 1.0f)
    val s1 = SimilarityQueries.embKmeans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val s1Again = SimilarityQueries.embKmeans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(s1 == s1Again, "memo hit must be bit-stable")
    assert(s1.map(_._2).sum == 32L, s"all vectors assigned: $s1")

    writeEmb(dir, 100L to 119L, shift = -9.0f)
    val s2 = SimilarityQueries.embKmeans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(s2.map(_._2).sum == 20L,
      s"regenerated corpus (20 vectors) not reflected: $s2")
  }

  // ── the BuildMemo-backed caches added after the registry landed:
  //    unigramMemo and pcaMemo key on the corpus fingerprint, so
  //    regeneration must be a NEW key, never a stale hit ──

  test("unigramMemo: unchanged corpus is a memo hit; in-place " +
      "regeneration retrains on the new text") {
    val dir = java.nio.file.Files
      .createTempDirectory("unimemo").toString
    writeDocs(dir, Seq((1L, "ab ab abc"), (2L, "bc ab")))
    val v1 = TextQueries.textUnigramTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(v1.exists(x => x._2 == "ab" && x._3 == 3L),
      s"expected ab=3 in $v1")
    val v1Again = TextQueries.textUnigramTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(v1 == v1Again, "memo hit must replay the vocabulary")
    writeDocs(dir, Seq((1L, "xy xy xyz"), (2L, "yz xy")))
    val v2 = TextQueries.textUnigramTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(v2.exists(x => x._2 == "xy" && x._3 == 3L),
      s"stale vocabulary served after regeneration: $v2")
    assert(!v2.exists(x => x._2.contains("a") && x._3 > 0L))
  }

  test("datasheet memos (host rank + DSIR selection): unchanged " +
      "corpus is a memo hit; in-place regeneration re-derives both " +
      "(VERDICT r17 finding #2)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("dsmemo").toString
    def write(langOf: Long => String): Unit =
      (1L to 20L).map { i =>
        (i, s"alpha beta gamma delta epsilon word$i tail$i",
          langOf(i), "src", 40L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // v1: half the docs are raw (fr) → DSIR selects from them
    write(i => if (i % 2 == 0) "en" else "fr")
    val d1 = PipelineQueries.curationDatasheet(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDouble(r.fieldIndex("dsir_keep_rate")),
        r.getLong(r.fieldIndex("host_rank_prior"))))
    assert(d1.length == 1 && d1.head._2 == 20L)
    assert(d1.head._3 > 0.0,
      s"v1 must select raw (fr) docs: ${d1.toSeq}")
    // unchanged corpus: a pure memo hit — neither build label fires
    // and the card replays bit-stable
    val raw1 = PipelineQueries.curationDatasheet(spark, dir)
      .collect().map(_.toString).toSeq
    val before = MemoBuilds.count
    val raw1Again = PipelineQueries.curationDatasheet(spark, dir)
      .collect().map(_.toString).toSeq
    val labels = MemoBuilds.labelsSince(before)
    assert(!labels.contains("datasheet_hostrank") &&
      !labels.contains("dsir_select"),
      s"unchanged corpus must hit both memos, rebuilt: $labels")
    assert(raw1 == raw1Again, "memo hit must replay the card")
    // in-place regeneration: all docs become target (en) → the raw
    // pool is EMPTY, so a stale DSIR memo would keep reporting v1's
    // keep rate
    write(_ => "en")
    val d2 = PipelineQueries.curationDatasheet(spark, dir).collect()
      .map(r => r.getDouble(r.fieldIndex("dsir_keep_rate")))
    assert(d2.length == 1 && d2.head == 0.0,
      s"regenerated corpus has no raw docs; stale memo if > 0: " +
        s"${d2.toSeq}")
  }

  test("pcaMemo: in-place regeneration re-derives the axis on the " +
      "NEW vectors; unchanged corpus replays the memoized component") {
    val dir = java.nio.file.Files
      .createTempDirectory("pcamemo").toString
    writeEmb(dir, 0L to 31L, shift = 1.0f)
    val p1 = SimilarityQueries.embPcaPower(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    val p1Again = SimilarityQueries.embPcaPower(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(p1 == p1Again, "memo hit must be bit-stable")
    assert(p1.length == 3, s"3-dim fixture: $p1")
    writeEmb(dir, 100L to 119L, shift = -9.0f)
    val p2 = SimilarityQueries.embPcaPower(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(p2.length == 3 && p2 != p1,
      "regenerated corpus must re-derive the axis (different shift " +
        "⇒ different mean/axis)")
  }
}
