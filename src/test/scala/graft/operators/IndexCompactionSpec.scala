package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction of the persisted index layouts (IndexCompaction +
  * compactTextIndex / compactVectorIndex): folding streamed batch
  * partitions must move bytes, never change serve results; replays of
  * folded batch ids must fail loudly; an interrupted swap must replay
  * from the journal to the same end state.
  */
class IndexCompactionSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))

  private def tmpRoot(prefix: String): String = {
    val r = Files.createTempDirectory(prefix).toString
    IndexManifest.registerTempRoot(r)
    r
  }

  /** A text index root fed as `k` disjoint batches by doc_id mod k. */
  private def multiBatchTextRoot(k: Int): String = {
    val root = tmpRoot("graft-cpx")
    (0 until k).foreach { b =>
      TextQueries.appendToIndex(
        docs.filter(pmod(col("doc_id"), lit(k)) === b), root, b.toLong)
    }
    root
  }

  test("text compaction: serve parity, one file per bucket, stats folded") {
    val root = multiBatchTextRoot(3)
    val before = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
    // batch_id is the fold target, relabeled by design (see the
    // IndexCompaction batch-id contract) — compare content without it
    val postingsBefore = spark.read.parquet(s"$root/postings")
      .drop("batch_id").collect().map(_.toString).sorted
    val stats = TextQueries.compactTextIndex(spark, root)
    assert(stats.forall(!_.noop))
    assert(stats.map(_.subdir) == Seq("postings", "stats", "doclens"))
    // fewer files, single batch partition everywhere
    stats.foreach { st =>
      assert(st.filesAfter < st.filesBefore,
        s"${st.subdir}: $st did not shrink")
    }
    assert(IndexCompaction.listBatchIds(
      Paths.get(root, "postings")) == Seq(2L))
    assert(IndexCompaction.listBatchIds(Paths.get(root, "stats")) == Seq(2L))
    // exactly one data file per bucket directory
    val bucketDirs = Files.list(Paths.get(root, "postings")).iterator()
    bucketDirs.forEachRemaining { d =>
      if (Files.isDirectory(d)) {
        val n = IndexCompaction.countDataFiles(d)
        assert(n == 1, s"$d holds $n data files after compaction")
      }
    }
    // content identical modulo the batch_id relabel: every posting row
    // and the serve output
    val postingsAfter = spark.read.parquet(s"$root/postings")
      .drop("batch_id").collect().map(_.toString).sorted
    assert(postingsAfter.toSeq == postingsBefore.toSeq)
    assert(spark.read.parquet(s"$root/stats").count() == 1)
    val after = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
    assert(after == before, s"compaction changed serve:\n$after\nvs\n$before")
    // arbitrary term sets too, not just the fixed query
    val alt = TextQueries.bm25ServeFrom(spark, root,
      terms = Seq("the", "data"), k = 5).collect().toSeq
    val ref = multiBatchTextRoot(1)
    assert(alt == TextQueries.bm25ServeFrom(spark, ref,
      terms = Seq("the", "data"), k = 5).collect().toSeq)
  }

  test("compacting an already-compact root is a no-op") {
    val root = multiBatchTextRoot(2)
    assert(TextQueries.compactTextIndex(spark, root).forall(!_.noop))
    val second = TextQueries.compactTextIndex(spark, root)
    assert(second.forall(_.noop))
    assert(IndexCompaction.compactedThrough(root, "postings") == 1L)
  }

  test("replaying a folded batch id fails loudly; fresh ids still append") {
    val root = multiBatchTextRoot(3)
    TextQueries.compactTextIndex(spark, root)
    val e = intercept[IllegalArgumentException] {
      TextQueries.appendToIndex(docs, root, 1L)
    }
    assert(e.getMessage.contains("compacted through 2"))
    // ingest continues above the compaction point: new docs under a
    // fresh id serve identically to a never-compacted twin
    val extra = docs.withColumn("doc_id", col("doc_id") + 100000L)
    TextQueries.appendToIndex(extra, root, 3L)
    val twin = tmpRoot("graft-cpxtwin")
    TextQueries.appendToIndex(docs.unionByName(extra), twin, 0L)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
  }

  test("a swap interrupted after the journal entry replays to completion") {
    val root = multiBatchTextRoot(3)
    val before = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
    // run phases 1+2 (stage + journal) and crash before the swap
    IndexCompaction.stage(spark, root, "postings", Seq("bucket"),
      identity, mx = 2L)
    IndexCompaction.journal(root, "postings", 2L)
    assert(Files.exists(Paths.get(root, "postings.compacting", "_STAGED")))
    // recovery (as run by the open paths) finishes the swap
    IndexCompaction.recover(root, "postings")
    assert(!Files.exists(Paths.get(root, "postings.compacting")))
    assert(IndexCompaction.compactedThrough(root, "postings") == 2L)
    assert(IndexCompaction.listBatchIds(
      Paths.get(root, "postings")) == Seq(2L))
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq == before)
  }

  test("an append into a crashed compaction replays the journal first") {
    // the r12-advice data-loss sequence: compaction crashes between
    // journal and swap; a streaming sink resumes appends; the crashed
    // run's journal eventually replays and its staged-set prune would
    // delete the freshly appended dirs. The append kernels now replay
    // the journal BEFORE landing anything, so the prune's view of
    // "live" is current and the fresh batch survives every later replay.
    val root = multiBatchTextRoot(3)
    IndexCompaction.stage(spark, root, "postings", Seq("bucket"),
      identity, mx = 2L)
    IndexCompaction.journal(root, "postings", 2L)
    val extra = docs.withColumn("doc_id", col("doc_id") + 100000L)
    TextQueries.appendToIndex(extra, root, 3L)
    // the pending swap was replayed before the append landed
    assert(IndexCompaction.compactedThrough(root, "postings") == 2L)
    assert(!Files.exists(Paths.get(root, "postings.compacting")))
    // the eventual replay site (open paths / next compact) is now a
    // no-op and cannot eat batch 3
    IndexCompaction.recover(root, "postings")
    assert(IndexCompaction.listBatchIds(
      Paths.get(root, "postings")).sorted == Seq(2L, 3L))
    val twin = tmpRoot("graft-cpxresume")
    TextQueries.appendToIndex(docs.unionByName(extra), twin, 0L)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
    // and a resumed batch id at-or-below the fold point is rejected by
    // the fence the pre-append replay just raised
    intercept[IllegalArgumentException] {
      TextQueries.appendToIndex(docs, root, 2L)
    }
  }

  test("a crash before the staging marker abandons the attempt intact") {
    val root = multiBatchTextRoot(2)
    val before = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
    // half-written staging dir, no _STAGED marker, stale journal entry
    Files.createDirectories(Paths.get(root, "postings.compacting"))
    IndexManifest.update(root, Map("compact.pending.postings" -> "1"))
    IndexCompaction.recover(root, "postings")
    assert(!Files.exists(Paths.get(root, "postings.compacting")))
    assert(IndexCompaction.compactedThrough(root, "postings") == -1L)
    assert(IndexCompaction.listBatchIds(
      Paths.get(root, "postings")).sorted == Seq(0L, 1L))
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq == before)
  }

  test("recovery lease: stale leases are broken, only own lease removed") {
    val root = tmpRoot("graft-lease")
    val lease = Paths.get(root, "x.recovering")
    // a crashed holder's lease: wrong token, stale mtime
    Files.write(lease, "dead-holder".getBytes)
    Files.setLastModifiedTime(lease,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000L))
    var ran = false
    IndexCompaction.withRecoveryLease(root, "x") {
      ran = true
      // we hold it now: file present, carrying OUR token (not the
      // dead holder's)
      assert(Files.exists(lease))
      assert(!new String(Files.readAllBytes(lease)).contains("dead-holder"))
      // simulate OUR lease being broken and re-acquired by another
      // process mid-body: the exit path must NOT delete their lease
      Files.write(lease, "other-holder".getBytes)
    }
    assert(ran)
    assert(Files.exists(lease) &&
      new String(Files.readAllBytes(lease)) == "other-holder",
      "exit path removed a lease it no longer owned")
    Files.deleteIfExists(lease)
  }

  test("vector compaction: ANN serve parity on the same root, pre vs post") {
    val e = graft.Tables.embeddings(spark, sf)
    val root = tmpRoot("graft-cpv")
    SimilarityQueries.initVectorIndex(e, root)
    (0 to 2).foreach { b =>
      SimilarityQueries.appendToVectorIndex(
        e.filter(pmod(col("vec_id"), lit(3)) === b), root, b.toLong)
    }
    val q = SimilarityQueries.withNorm(e).filter(col("vec_id") === 0)
      .select(col("emb"), col("nrm")).collect().head
    val qv = q.getSeq[Double](0).toArray
    def serve() = SimilarityQueries
      .annServeFrom(spark, root, qv, q.getDouble(1)).collect().toSeq
    val before = serve()
    val st = SimilarityQueries.compactVectorIndex(spark, root)
    assert(!st.noop && st.filesAfter < st.filesBefore)
    assert(IndexCompaction.listBatchIds(
      Paths.get(root, "assignments")) == Seq(2L))
    assert(serve() == before)
    // folded ids rejected, fresh ids accepted
    intercept[IllegalArgumentException] {
      SimilarityQueries.appendToVectorIndex(e, root, 2L)
    }
    SimilarityQueries.appendToVectorIndex(
      e.withColumn("vec_id", col("vec_id") + 100000L), root, 3L)
    assert(serve().size == before.size)
  }

  test("interleaved ingest/compact cycles keep serving the full corpus") {
    // the deployment lifecycle: stream, quiesce+compact, stream more,
    // compact again — the second fold merges the compacted segment
    // with the post-compaction batches
    val root = tmpRoot("graft-cpxlife")
    val d0 = docs
    val d1 = docs.withColumn("doc_id", col("doc_id") + 100000L)
    val d2 = docs.withColumn("doc_id", col("doc_id") + 200000L)
    TextQueries.appendToIndex(d0.filter(col("doc_id") % 2 === 0), root, 0L)
    TextQueries.appendToIndex(d0.filter(col("doc_id") % 2 === 1), root, 1L)
    TextQueries.compactTextIndex(spark, root)
    TextQueries.appendToIndex(d1, root, 2L)
    TextQueries.appendToIndex(d2, root, 3L)
    val secondFold = TextQueries.compactTextIndex(spark, root)
    assert(secondFold.forall(!_.noop))
    assert(IndexCompaction.compactedThrough(root, "postings") == 3L)
    val twin = tmpRoot("graft-cpxlifetwin")
    TextQueries.appendToIndex(d0.unionByName(d1).unionByName(d2), twin, 0L)
    assert(TextQueries.bm25ServeFrom(spark, root).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
    assert(spark.read.parquet(s"$root/stats").count() == 1)
  }

  test("the declared compact qids audit one batch partition") {
    val t = TextQueries.snkTextIndexCompact(spark, sf).collect().head
    assert(t.getAs[Long]("n_batch_parts") == 1L)
    // and the audit numbers equal the single-batch sink's
    val ref = TextQueries.snkTextIndex(spark, sf).collect().head
    assert(t.getAs[Long]("n_postings") == ref.getAs[Long]("n_postings"))
    assert(t.getAs[Long]("total_tf") == ref.getAs[Long]("total_tf"))
    val v = SimilarityQueries.snkVectorIndexCompact(spark, sf).collect().head
    assert(v.getAs[Long]("n_batch_parts") == 1L)
    // same vectors as the single-batch build (degenerate vectors are
    // absent from BOTH by the assignment contract)
    val vref = SimilarityQueries.snkVectorIndex(spark, sf).collect().head
    assert(v.getAs[Long]("n_vectors") == vref.getAs[Long]("n_vectors"))
  }
}
