package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The cross-session deployment contract for the persisted indexes:
  * build into a caller-chosen durable root, stamp a manifest, drop all
  * in-JVM state, REOPEN by root, and serve identically — plus the
  * failure modes (missing/foreign manifest, engine-constant mismatch,
  * corrupted artifact) and the stale-memo fix (a corpus regenerated in
  * place must build a fresh index, not hit the old cache key).
  */
class IndexDurabilitySpec extends SparkSpec {

  test("text index: build at a durable root, reopen, serve identically") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-durable-text").toString
    TextQueries.buildTextIndexAt(spark, sf, root)
    val before = TextQueries.bm25ServeFrom(spark, root).collect().toSeq
    // "close the session": the only in-JVM serving state is the build
    // memo — drop it, then reopen strictly through the manifest path
    TextQueries.invalidateIndexCache()
    val reopened = TextQueries.openTextIndex(root)
    val after = TextQueries.bm25ServeFrom(spark, reopened).collect().toSeq
    assert(after == before && after.nonEmpty,
      s"reopened serve diverged:\n$after\nvs\n$before")
  }

  test("vector index: build at a durable root, reopen, serve identically") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-durable-vec").toString
    SimilarityQueries.buildVectorIndexAt(spark, sf, root)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>").as("emb"))
      .filter(col("vec_id") === 0).collect()
    val qv = e.head.getSeq[Double](0).toArray
    val qn = math.sqrt(qv.map(v => v * v).sum)
    val before = SimilarityQueries.annServeFrom(spark, root, qv, qn)
      .collect().toSeq
    SimilarityQueries.invalidateIndexCache()
    val reopened = SimilarityQueries.openVectorIndex(spark, root)
    val after = SimilarityQueries.annServeFrom(spark, reopened, qv, qn)
      .collect().toSeq
    assert(after == before && after.nonEmpty,
      s"reopened serve diverged:\n$after\nvs\n$before")
  }

  test("open fails loudly on missing manifests and constant mismatches") {
    // no manifest at all (half-built or foreign directory)
    val bare = java.nio.file.Files
      .createTempDirectory("graft-bare").toString
    val e1 = intercept[IllegalArgumentException] {
      TextQueries.openTextIndex(bare)
    }
    assert(e1.getMessage.contains("manifest"))
    // a completed root whose engine constants drifted: doctor the
    // manifest to a different bucket count — serving would silently
    // prune wrong buckets, so open must refuse
    val doctored = java.nio.file.Files
      .createTempDirectory("graft-doctored").toString
    IndexManifest.write(doctored, "text-bm25", Map("n_buckets" -> "16"))
    val e2 = intercept[IllegalArgumentException] {
      TextQueries.openTextIndex(doctored)
    }
    assert(e2.getMessage.contains("n_buckets"))
    // wrong kind: a vector root opened as a text index
    IndexManifest.write(bare, "vector-ivf", Map())
    val e3 = intercept[IllegalArgumentException] {
      TextQueries.openTextIndex(bare)
    }
    assert(e3.getMessage.contains("kind"))
  }

  test("vector open cross-checks the quantizer against the manifest") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-vec-corrupt").toString
    SimilarityQueries.buildVectorIndexAt(spark, sf, root)
    // corrupt the artifact: rewrite centroids/ to a single list while
    // the manifest still records the full count
    spark.read.parquet(s"$root/centroids").limit(1)
      .write.mode("overwrite").parquet(s"$root/centroids_new")
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.iterator().forEachRemaining(rm) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    rm(java.nio.file.Paths.get(s"$root/centroids"))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$root/centroids_new"),
      java.nio.file.Paths.get(s"$root/centroids"))
    val e = intercept[IllegalArgumentException] {
      SimilarityQueries.openVectorIndex(spark, root)
    }
    assert(e.getMessage.contains("centroids"))
  }

  test("text lifecycle: build, stream-append, compact, reopen, serve") {
    // the deployment sequence durability and compaction must survive
    // TOGETHER: a durable build, streamed appends, a quiesce-time
    // fold, session close, and a fresh open — the manifest must carry
    // BOTH the build keys (or open() refuses) and compactedThrough
    // (or a replayed batch id silently overwrites the merged corpus).
    val root = java.nio.file.Files
      .createTempDirectory("graft-life-text").toString
    IndexManifest.registerTempRoot(root)
    TextQueries.buildTextIndexAt(spark, sf, root)
    val d1 = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .withColumn("doc_id", col("doc_id") + 100000L)
    val d2 = d1.withColumn("doc_id", col("doc_id") + 100000L)
    TextQueries.appendToIndex(d1, root, 1L)
    TextQueries.appendToIndex(d2, root, 2L)
    val stats = TextQueries.compactTextIndex(spark, root)
    assert(stats.forall(!_.noop))
    // close the session and reopen strictly through the manifest path
    TextQueries.invalidateIndexCache()
    val reopened = TextQueries.openTextIndex(root)
    assert(IndexCompaction.compactedThrough(reopened, "postings") == 2L,
      "compactedThrough must survive the reopen")
    // a replayed folded id is still rejected AFTER reopen
    val e = intercept[IllegalArgumentException] {
      TextQueries.appendToIndex(d1, reopened, 2L)
    }
    assert(e.getMessage.contains("compacted through 2"))
    // serve equals a never-compacted single-batch twin of the full
    // corpus; ingest continues above the fold point
    val base = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val twin = java.nio.file.Files
      .createTempDirectory("graft-life-text-twin").toString
    IndexManifest.registerTempRoot(twin)
    TextQueries.appendToIndex(base.unionByName(d1).unionByName(d2),
      twin, 0L)
    assert(TextQueries.bm25ServeFrom(spark, reopened).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
    val d3 = d2.withColumn("doc_id", col("doc_id") + 100000L)
    TextQueries.appendToIndex(d3, reopened, 3L)
    TextQueries.appendToIndex(d3, twin, 1L)
    assert(TextQueries.bm25ServeFrom(spark, reopened).collect().toSeq ==
      TextQueries.bm25ServeFrom(spark, twin).collect().toSeq)
  }

  test("vector lifecycle: build, stream-append, compact, reopen, serve") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-life-vec").toString
    IndexManifest.registerTempRoot(root)
    SimilarityQueries.buildVectorIndexAt(spark, sf, root)
    val e = graft.Tables.embeddings(spark, sf)
    val e1 = e.withColumn("vec_id", col("vec_id") + 100000L)
    SimilarityQueries.appendToVectorIndex(e1, root, 1L)
    val st = SimilarityQueries.compactVectorIndex(spark, root)
    assert(!st.noop)
    SimilarityQueries.invalidateIndexCache()
    val reopened = SimilarityQueries.openVectorIndex(spark, root)
    assert(IndexCompaction.compactedThrough(reopened, "assignments") == 1L,
      "compactedThrough must survive the reopen")
    intercept[IllegalArgumentException] {
      SimilarityQueries.appendToVectorIndex(e1, reopened, 1L)
    }
    val q = SimilarityQueries.withNorm(e).filter(col("vec_id") === 0)
      .select(col("emb"), col("nrm")).collect().head
    val qv = q.getSeq[Double](0).toArray
    val served = SimilarityQueries
      .annServeFrom(spark, reopened, qv, q.getDouble(1)).collect().toSeq
    assert(served.nonEmpty)
    // ingest continues above the fold point on the reopened root
    SimilarityQueries.appendToVectorIndex(
      e.withColumn("vec_id", col("vec_id") + 200000L), reopened, 2L)
    assert(SimilarityQueries
      .annServeFrom(spark, reopened, qv, q.getDouble(1)).collect()
      .toSeq.size == served.size)
  }

  test("an unmarked .bak with a vanished manifest refuses to guess") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft-bak-scope").toString
    IndexManifest.update(root, Map("compact.through.postings" -> "7"))
    // a stale sibling copy appears (operator cp, a backup tool, a
    // pre-marker engine's fallback store) and then the main manifest
    // vanishes. Serving the .bak could resurrect old journal state;
    // serving NOTHING reads as ct = -1 and fails every replay guard
    // open. Neither silent choice is safe — the read must refuse.
    Files.copy(Paths.get(root, IndexManifest.FILE),
      Paths.get(root, s"${IndexManifest.FILE}.bak"))
    IndexManifest.update(root, Map("compact.through.postings" -> "9"))
    Files.delete(Paths.get(root, IndexManifest.FILE))
    val e = intercept[IllegalStateException] {
      IndexManifest.readIfExists(root)
    }
    assert(e.getMessage.contains("refusing to guess"))
    // a root stamped by the non-atomic store path keeps the designed
    // absent-window fallback (the .bak is then the just-previous map)
    Files.createFile(Paths.get(root, s"${IndexManifest.FILE}.nonatomic"))
    assert(IndexManifest.readIfExists(root)
      .get("compact.through.postings").contains("7"))
  }

  test("a corpus regenerated in place invalidates the build memo") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-regen").toString
    def writeCorpus(marker: String, n: Int): Unit =
      (1 to n).map(i => (i.toLong, s"spark $marker doc$i", "en", "synth", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    writeCorpus("alpha", 8)
    val root1 = TextQueries.buildTextIndex(spark, dir)
    val served1 = TextQueries.bm25ServeFrom(spark, root1,
      terms = Seq("alpha"), k = 50).collect().length
    assert(served1 == 8, "all alpha docs contain the term")
    // regenerate IN PLACE with different content (different size ⇒
    // different file-stat fingerprint even within an mtime tick)
    writeCorpus("beta", 12)
    val root2 = TextQueries.buildTextIndex(spark, dir)
    assert(root2 != root1,
      "the stale memo served an index for the old corpus")
    assert(TextQueries.bm25ServeFrom(spark, root2,
      terms = Seq("beta"), k = 50).collect().length == 12)
    assert(TextQueries.bm25ServeFrom(spark, root2,
      terms = Seq("alpha"), k = 50).collect().isEmpty)
  }
}
