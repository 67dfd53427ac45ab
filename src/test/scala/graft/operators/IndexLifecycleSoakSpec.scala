package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Composed lifecycle soak (VERDICT r12 task 6): single-op specs are
  * green in isolation — this drives one TEXT root and one VECTOR root
  * through alternating streamed ingest, streamed takedowns,
  * compaction, repair (vector), and a rebuild, across ≥3 quiesce
  * cycles, asserting at every quiesce point:
  *
  *   1. serve parity against a from-scratch index of the live corpus
  *      (text; the vector quantizer is Lloyd-order-dependent, so the
  *      vector root asserts the serve-visible live SET instead),
  *   2. fence monotonicity on every folded subdir,
  *   3. no ghost directories (postings doc_ids and assignment cid
  *      dirs are subsets of what is live/centroid-backed),
  *   4. the stats row equals the doclens-derived fold.
  */
class IndexLifecycleSoakSpec extends SparkSpec {

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def docs = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))

  private def embs = graft.Tables.embeddings(spark, sf)

  private def tmpRoot(prefix: String): String = {
    val r = Files.createTempDirectory(prefix).toString
    IndexManifest.registerTempRoot(r)
    r
  }

  private def ckpt(): String =
    Files.createTempDirectory("graft-soak-ck").toString

  /** Run one streamed ingest of `batch` into the text root. */
  private def streamTextIngest(root: String, batch: DataFrame): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    ms.addData(batch.as[(Long, String)].collect().toSeq: _*)
    graft.streaming.StreamingOps
      .indexUpsertSink(ms.toDF().toDF("doc_id", "text"), root, ckpt())
      .start().awaitTermination(120000)
  }

  private def streamTextTakedown(root: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Long]
    ms.addData(ids: _*)
    graft.streaming.StreamingOps
      .indexDeleteSink(ms.toDF().toDF("doc_id"), root, ckpt())
      .start().awaitTermination(120000)
  }

  private def streamVecIngest(root: String, batch: DataFrame): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Float], Int)]
    ms.addData(batch.select(col("vec_id"),
        col("embedding").cast("array<float>"), col("label"))
      .as[(Long, Seq[Float], Int)].collect().toSeq: _*)
    graft.streaming.StreamingOps
      .vectorUpsertSink(
        ms.toDF().toDF("vec_id", "embedding", "label"), root, ckpt())
      .start().awaitTermination(120000)
  }

  private def streamVecTakedown(root: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Long]
    ms.addData(ids: _*)
    graft.streaming.StreamingOps
      .vectorDeleteSink(ms.toDF().toDF("vec_id"), root, ckpt())
      .start().awaitTermination(120000)
  }

  private val TextSubdirs = Seq("postings", "stats", "doclens")

  private def fences(root: String, subdirs: Seq[String]): Map[String, Long] =
    subdirs.map(d => d -> IndexCompaction.compactedThrough(root, d)).toMap

  test("text root survives 3 ingest/takedown/compact cycles with parity") {
    val root = tmpRoot("graft-soak-text")
    var live = Map.empty[Long, DataFrame] // shift -> live docs frame
    var ingestedIds = Set.empty[Long]
    var tombstoned = Set.empty[Long]
    var prevFences = fences(root, TextSubdirs)

    def quiesceAsserts(cycle: Int, postCompact: Boolean): Unit = {
      val liveDocs = live.values.reduce(_ unionByName _)
        .filter(!col("doc_id").isin(tombstoned.toSeq.map(Long.box): _*))
      // 1. serve parity vs a from-scratch index of the live corpus
      val twin = tmpRoot(s"graft-soak-twin$cycle")
      TextQueries.appendToIndex(liveDocs, twin, 0L)
      Seq(Seq("spark", "vector", "stream"), Seq("the", "data")).foreach { q =>
        assert(
          TextQueries.bm25ServeFrom(spark, root, q, 15).collect().toSeq ==
            TextQueries.bm25ServeFrom(spark, twin, q, 15).collect().toSeq,
          s"cycle $cycle: serve diverged from from-scratch twin for $q")
      }
      // 2. fences only ever rise
      val f = fences(root, TextSubdirs)
      f.foreach { case (d, v) =>
        assert(v >= prevFences(d), s"cycle $cycle: fence fell at $d")
      }
      prevFences = f
      // 3. no ghosts: everything in postings was actually ingested;
      // after a delete-applying compaction the tombstoned rows are
      // physically gone and the tombstones cleared
      val inPostings = spark.read.parquet(s"$root/postings")
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(inPostings.subsetOf(ingestedIds),
        s"cycle $cycle: postings hold never-ingested ids")
      if (postCompact) {
        assert(inPostings == (ingestedIds -- tombstoned),
          s"cycle $cycle: post-compaction postings != live set")
        assert(!IndexDeletes.hasParquet(Paths.get(root, "deletes")),
          s"cycle $cycle: tombstones survived the compaction")
        // one batch partition per bucket dir
        val s0 = Files.list(Paths.get(root, "postings"))
        try s0.iterator().asScala.filter(Files.isDirectory(_)).foreach { b =>
          assert(IndexCompaction.listBatchIds(b).size <= 1,
            s"cycle $cycle: bucket $b still holds multiple batch dirs")
        } finally s0.close()
      }
      // 4. stats fold == doclens-derived fold over the live rows
      val st = spark.read.parquet(s"$root/stats")
        .agg(sum(col("n_docs")), sum(col("sum_dl"))).collect().head
      val dl = spark.read.parquet(s"$root/doclens")
        .filter(!col("doc_id").isin(tombstoned.toSeq.map(Long.box): _*))
        .dropDuplicates("doc_id")
        .agg(count(lit(1)).cast("double"), sum(col("dl"))).collect().head
      assert(st.getDouble(0) == dl.getDouble(0) &&
        st.getDouble(1) == dl.getDouble(1),
        s"cycle $cycle: stats row ${st} != doclens fold ${dl}")
    }

    (1 to 3).foreach { cycle =>
      val shift = (cycle - 1) * 100000L
      val batch = docs.withColumn("doc_id", col("doc_id") + shift)
      live += shift -> batch
      ingestedIds ++= batch.select("doc_id").collect().map(_.getLong(0))
      streamTextIngest(root, batch)
      // takedown: every (mod 5 == cycle) id of THIS cycle's batch
      val doomed = batch.filter(pmod(col("doc_id"), lit(5)) === cycle)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      streamTextTakedown(root, doomed)
      tombstoned ++= doomed
      quiesceAsserts(cycle, postCompact = false)
      TextQueries.compactTextIndex(spark, root)
      quiesceAsserts(cycle, postCompact = true)
    }
  }

  test("vector root survives ingest/takedown/compact/repair/rebuild cycles") {
    val root = tmpRoot("graft-soak-vec")
    SimilarityQueries.initVectorIndex(embs, root)
    var ingested = Set.empty[Long]
    var tombstoned = Set.empty[Long]
    var prevFence = IndexCompaction.compactedThrough(root, "assignments")

    def quiesceAsserts(stage: String, physical: Boolean,
        sidecarAutoFresh: Boolean = false): Unit = {
      // 2. fence monotone
      val f = IndexCompaction.compactedThrough(root, "assignments")
      assert(f >= prevFence, s"$stage: assignments fence fell")
      prevFence = f
      // 3. no ghost lists: every assignment cid dir has a centroid
      val cids = spark.read.parquet(s"$root/centroids")
        .select("cid").collect().map(_.getLong(0)).toSet
      val dirCids = {
        val s0 = Files.list(Paths.get(root, "assignments"))
        try s0.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("cid="))
          .map(_.stripPrefix("cid=").toLong).toSet
        finally s0.close()
      }
      assert(dirCids.subsetOf(cids),
        s"$stage: centroid-less assignment dirs ${dirCids -- cids}")
      // 1+3. the stored vector set: subset of ingested always; exactly
      // the live set once deletes have been applied physically
      val stored = spark.read.parquet(s"$root/assignments")
        .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
      assert(stored.subsetOf(ingested), s"$stage: never-ingested vectors")
      if (physical)
        assert(stored == (ingested -- tombstoned),
          s"$stage: stored set != live set after physical delete")
      // serve-visible set: a tombstoned id must never surface; a live
      // vector's own embedding must find itself first
      val alive = (ingested -- tombstoned).min
      val q = SimilarityQueries.withNorm(
          spark.read.parquet(s"$root/assignments")
            .filter(col("vec_id") === alive)
            .select(col("vec_id"), lit(0).as("label"),
              col("emb").as("embedding")).limit(1))
        .select(col("emb"), col("nrm")).collect().head
      val served = SimilarityQueries.annServeFrom(spark, root,
        q.getSeq[Double](0).toArray, q.getDouble(1), topK = 50).collect()
      assert(served.nonEmpty && served.head.getLong(0) == alive,
        s"$stage: live vector $alive does not find itself")
      assert(served.forall(r => !tombstoned.contains(r.getLong(0))),
        s"$stage: tombstoned id served")
      // 5. the PQ sidecar rides the whole lifecycle. Freshness
      // contract per quiesce kind: a MAINTENANCE commit
      // (compact/repair/rebuild) auto-refreshes the sidecar
      // (refreshIfPresent), so at those quiesces the sidecar must
      // ALREADY be fresh with no manual rebuild; a STREAMED ingest
      // leaves it stale by design, and the serve path must REFUSE
      // (never silently miss the new vectors) until rebuilt.
      if (sidecarAutoFresh) {
        assert(PqIndex.sidecarFresh(root),
          s"$stage: maintenance commit did not auto-refresh the sidecar")
      } else if (Files.exists(Paths.get(root, "pq"))) {
        assert(!PqIndex.sidecarFresh(root),
          s"$stage: sidecar claims fresh after a streamed ingest")
        val refused = intercept[IllegalArgumentException] {
          PqIndex.annTopKPqFrom(spark, root,
            q.getSeq[Double](0).toArray, q.getDouble(1), topK = 50)
        }
        assert(refused.getMessage.contains("stale"),
          s"$stage: unexpected refusal message: ${refused.getMessage}")
        PqIndex.buildSidecar(spark, root)
      } else PqIndex.buildSidecar(spark, root)
      // at this fixture size the refine shortlist covers every probed
      // candidate, so the refined PQ serve must agree EXACTLY with
      // the exact serve
      val pq = PqIndex.annTopKPqFrom(spark, root,
        q.getSeq[Double](0).toArray, q.getDouble(1), topK = 50).collect()
      assert(pq.toSeq == served.toSeq,
        s"$stage: PQ serve diverged from the exact serve")
    }

    // cycle 1: streamed ingest + takedown, then compaction
    streamVecIngest(root, embs)
    ingested ++= embs.select("vec_id").collect().map(_.getLong(0))
    val doomed1 = embs.filter(pmod(col("vec_id"), lit(5)) === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    streamVecTakedown(root, doomed1)
    tombstoned ++= doomed1
    quiesceAsserts("cycle1-quiesce", physical = false)
    SimilarityQueries.compactVectorIndex(spark, root)
    quiesceAsserts("cycle1-compacted", physical = true,
      sidecarAutoFresh = true)

    // cycle 2: a diffuse drifted cloud floods lists; repair splits them
    val d = embs.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).first().getInt(0)
    val cloud = embs.filter(col("embedding").isNotNull)
      .select((col("vec_id") + 400000L).as("vec_id"), col("label"),
        expr("""transform(embedding,
          (x, i) -> 1.0 + 0.25 * cos(CAST(vec_id * (i + 1) AS DOUBLE)))""")
          .as("embedding"))
    streamVecIngest(root, cloud)
    ingested ++= cloud.select("vec_id").collect().map(_.getLong(0))
    quiesceAsserts("cycle2-quiesce", physical = false)
    SimilarityQueries.repairVectorIndex(spark, root, imbalance = 2.0)
    quiesceAsserts("cycle2-repaired", physical = false,
      sidecarAutoFresh = true)

    // cycle 3: more ingest + takedown, then a full rebuild (applies
    // tombstones, retrains the quantizer)
    val extra = embs.withColumn("vec_id", col("vec_id") + 800000L)
    streamVecIngest(root, extra)
    ingested ++= extra.select("vec_id").collect().map(_.getLong(0))
    val doomed3 = extra.filter(pmod(col("vec_id"), lit(7)) === 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    streamVecTakedown(root, doomed3)
    tombstoned ++= doomed3
    quiesceAsserts("cycle3-quiesce", physical = false)
    SimilarityQueries.rebuildVectorIndex(spark, root)
    quiesceAsserts("cycle3-rebuilt", physical = true,
      sidecarAutoFresh = true)
    assert(!Files.exists(Paths.get(root, "deletes")),
      "rebuild must clear applied tombstones")
  }
}
