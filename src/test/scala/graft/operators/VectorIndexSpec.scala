package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted IVF index (snk_vector_index / sim_ann_ivf_indexed):
  * structural invariants of the written artifact, serve-path recall
  * against the exact answer, and the pruned-serve plan.
  */
class VectorIndexSpec extends SparkSpec {

  test("every non-degenerate vector is stored in at most IVF_ASSIGN lists") {
    val root = SimilarityQueries.buildVectorIndex(spark, sf)
    val a = spark.read.parquet(s"$root/assignments")
    val nVectors = graft.Tables.embeddings(spark, sf)
      .withColumn("nrm", graft.functions.ArrayDot.l2Norm(
        col("embedding").cast("array<double>")))
      .filter(col("nrm") > 0).count()
    assert(a.select("vec_id").distinct().count() == nVectors,
      "every non-degenerate vector must appear in the index")
    val maxLists = a.groupBy("vec_id").count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxLists <= SimilarityQueries.IVF_ASSIGN,
      s"a vector landed in $maxLists lists")
  }

  test("indexed serve recalls a meaningful share of exact top-10") {
    val exact = SimilarityQueries.simTopkCosine(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val served = SimilarityQueries.simAnnIvfIndexed(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(served).size.toDouble / exact.size
    assert(recall >= 0.5, s"indexed IVF recall@10 = $recall too low")
  }

  test("sf0.1 batch serve holds mean recall@10 >= 0.9 at the default " +
    "probe width") {
    // the serving-tier quality bar, measured where the bench runs
    // (sf0.1, the largest fixture) over a 32-query spread — not just
    // the single fixture query. The k/2 default probe width was
    // chosen from the recall-vs-probe curve in SCALE.md "IVF recall";
    // this pin catches any future k/nprobe/assignment regression.
    val dir = "/root/testdata/sf0.1"
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("emb"), col("nrm"))
    val all = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val n = all.length
    val root = SimilarityQueries.buildVectorIndex(spark, dir)
    val qs = (0 until 32).map(i => all(i * n / 32)).distinct
    def exactTop10(qv: Array[Double], qn: Double): Set[Long] =
      all.map { case (id, v, nr) =>
        (id, v.indices.map(i => v(i) * qv(i)).sum / (nr * qn))
      }.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    import spark.implicits._
    val qdf = qs.map { case (id, qv, qn) => (id, qv.toSeq, qn) }
      .toDF("query_id", "qv", "qn")
    val served = SimilarityQueries.annServeBatchFrom(spark, root, qdf)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = qs.map { case (id, qv, qn) =>
      val t = exactTop10(qv, qn)
      t.intersect(served.getOrElse(id, Set.empty)).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, f"sf0.1 mean recall@10 = $mean%.3f below the bar")
    assert(recalls.min >= 0.6,
      f"worst query recall@10 = ${recalls.min}%.2f collapsed")
  }

  test("jittered 10x fixture holds mean recall@10 >= 0.9 at the default " +
    "probe width") {
    // the NON-degenerate large-corpus pin (VERDICT r11 task 1):
    // verbatim 10x replication gives recall = 1.000 trivially, so the
    // 20k-vector fixture perturbs each copy with deterministic
    // hash-uniform noise (amplitude ~1.5x the corpus's typical
    // |component| spread across the copy cluster) — near-neighbors
    // are CLOSE but nothing is verbatim, the regime a trained
    // quantizer must actually route. Full curve + streamed-ingest +
    // post-rebuild numbers in SCALE.md ("IVF recall, jittered");
    // this pin re-measures the batch-built serve path end-to-end.
    val dir = JitterFixture.ensure(spark, "/root/testdata/sf0.1",
      java.nio.file.Files.createTempDirectory("graft-jitter-pin")
        .toString + "/sf")
    val root = java.nio.file.Files
      .createTempDirectory("graft-jitter-pin-root").toString
    IndexManifest.registerTempRoot(root)
    SimilarityQueries.buildVectorIndexAt(spark, dir, root)
    val (mean, min) = JitterFixture.recallAt(spark, dir, root,
      nQueries = 16)
    assert(mean >= 0.9,
      f"jittered 10x mean recall@10 = $mean%.3f below the bar")
    assert(min >= 0.6,
      f"jittered 10x worst recall@10 = $min%.2f collapsed")
    // the PQ read path in the SAME clustered regime (the one the
    // 100 TB extrapolation relies on): refined ADC must match the
    // exact serve's bar here — measured 1.000/1.00 in the SCALE.md
    // study, pinned with the exact path's margins
    PqIndex.buildSidecar(spark, root)
    val (pm, pn) = JitterFixture.recallAt(spark, dir, root,
      nQueries = 16, pq = true)
    assert(pm >= 0.9,
      f"jittered 10x PQ mean recall@10 = $pm%.3f below the bar")
    assert(pn >= 0.6,
      f"jittered 10x PQ worst recall@10 = $pn%.2f collapsed")
  }

  test("serving twice from one index is deterministic") {
    val a = SimilarityQueries.simAnnIvfIndexed(spark, sf).collect().toSeq
    val b = SimilarityQueries.simAnnIvfIndexed(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("stream-ingested index serves identically to the batch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // batch reference: quantizer + all assignments in one shot
    val ref = java.nio.file.Files
      .createTempDirectory("graft-vecref").toString
    val corpus = graft.Tables.embeddings(spark, sf)
    SimilarityQueries.initVectorIndex(corpus, ref)
    SimilarityQueries.appendToVectorIndex(corpus, ref, 0L)
    // streamed: SAME persisted quantizer (assignment is deterministic
    // given quantizer + vector), vectors arriving in two batches
    val str = java.nio.file.Files
      .createTempDirectory("graft-vecstr").toString
    SimilarityQueries.initVectorIndex(corpus, str)
    val rows = corpus.select("vec_id", "embedding", "label")
      .as[(Long, Seq[Float], Int)].collect().toSeq
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-vecckpt").toString
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    mem.addData(h1: _*)
    graft.streaming.StreamingOps.vectorUpsertSink(
        mem.toDF().toDF("vec_id", "embedding", "label"), str, ckpt)
      .start().awaitTermination(120000)
    mem.addData(h2: _*)
    graft.streaming.StreamingOps.vectorUpsertSink(
        mem.toDF().toDF("vec_id", "embedding", "label"), str, ckpt)
      .start().awaitTermination(120000)
    def serve(root: String) = {
      // the shared serve path, parameterized by root via the cache —
      // compare the raw artifacts instead: same quantizer ⇒ identical
      // assignment sets must produce identical list contents
      spark.read.parquet(s"$root/assignments")
        .select(col("cid").cast("long"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(serve(str) == serve(ref),
      "streamed ingest must reproduce the batch build's lists exactly")
  }

  test("replaying a vector batch overwrites itself — no double counting") {
    val corpus = graft.Tables.embeddings(spark, sf)
    val root = java.nio.file.Files
      .createTempDirectory("graft-vecreplay").toString
    SimilarityQueries.initVectorIndex(corpus, root)
    SimilarityQueries.appendToVectorIndex(corpus, root, 0L)
    val once = spark.read.parquet(s"$root/assignments").count()
    SimilarityQueries.appendToVectorIndex(corpus, root, 0L) // retry
    assert(spark.read.parquet(s"$root/assignments").count() == once)
    // an empty batch is a no-op
    SimilarityQueries.appendToVectorIndex(corpus.limit(0), root, 1L)
    assert(spark.read.parquet(s"$root/assignments").count() == once)
  }

  test("arbitrary query vectors serve from the same built index") {
    val root = SimilarityQueries.buildVectorIndex(spark, sf)
    // a vector OUTSIDE the corpus: any direction works — the serve
    // path must be total in the query, not tied to vec_id=0
    val dim = graft.Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).collect().head.getInt(0)
    val qv = Array.tabulate(dim)(i => math.sin(i + 1.0))
    val qn = math.sqrt(qv.map(v => v * v).sum)
    val a = SimilarityQueries.annServeFrom(spark, root, qv, qn, topK = 5)
      .collect().toSeq
    val b = SimilarityQueries.annServeFrom(spark, root, qv, qn, topK = 5)
      .collect().toSeq
    assert(a == b, "serve must be deterministic for any query")
    assert(a.size <= 5 && a.nonEmpty, s"unexpected result size: ${a.size}")
  }

  test("batch serve hash-matches N independent single-query serves") {
    val root = SimilarityQueries.buildVectorIndex(spark, sf)
    val batch = SimilarityQueries.simAnnServeBatch(spark, sf)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
    for (id <- SimilarityQueries.ANN_BATCH_IDS) {
      val qv = e.filter(col("vec_id") === id)
        .collect().head.getSeq[Double](1).toArray
      val qn = math.sqrt(qv.map(v => v * v).sum)
      val slice = batch.filter(col("query_id") === id).drop("query_id")
        .orderBy(col("sim").desc, col("vec_id")).collect().toSeq
      val single = SimilarityQueries.annServeFrom(spark, root, qv, qn)
        .collect().toSeq
      assert(slice == single,
        s"query $id diverged from its single serve:\n$slice\nvs\n$single")
    }
  }

  test("batch serve is one job over one pruned assignments scan") {
    val root = SimilarityQueries.buildVectorIndex(spark, sf)
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, sf))
    val qdf = e.filter(col("vec_id")
        .isin(SimilarityQueries.ANN_BATCH_IDS.map(Long.box): _*))
      .select(col("vec_id").as("query_id"),
        col("emb").as("qv"), col("nrm").as("qn"))
    val df = SimilarityQueries.annServeBatchFrom(spark, root, qdf)
    df.collect() // AQE finalizes on execution
    // AQE's string repeats the tree under "== Initial Plan ==" — count
    // scans in the final section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the union of all probed lists prunes ONE assignments scan; the
    // probe pairs ride a broadcast join — queries never add scans
    val nScans = "FileScan".r.findAllIn(p).size
    assert(nScans == 1, s"expected 1 assignments scan, got $nScans:\n$p")
    assert(p.contains("PartitionFilters") && p.contains("cid"),
      s"probed-list pruning missing:\n$p")
    assert(p.contains("TopKPerGroup"), s"heap top-k missing:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle joins at serve:\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"serve must read the index, not the corpus:\n$p")
  }

  test("occupancy audit flags imbalance growth under a skewed streamed batch") {
    import spark.implicits._
    // fresh root so the skewed ingest can't pollute the shared memo
    val root = java.nio.file.Files
      .createTempDirectory("graft-vec-audit").toString
    val corpus = graft.Tables.embeddings(spark, sf)
    SimilarityQueries.initVectorIndex(corpus, root)
    SimilarityQueries.appendToVectorIndex(corpus, root, 0L)
    def audit() = SimilarityQueries.ivfAuditFrom(spark, root).collect().head
    val before = audit()
    val imbalanceBefore = before.getAs[Double]("imbalance")
    assert(before.getAs[Long]("n_assignments") > 0)
    // a drifted corpus: one direction repeated — every copy assigns to
    // the SAME lists under the frozen quantizer, which is exactly the
    // drift the audit exists to surface
    val dim = corpus.select(size(col("embedding"))).collect().head.getInt(0)
    val spike = corpus.agg(max(col("vec_id").cast("long")))
      .collect().head.getLong(0)
    val skewed = (1 to 400).map { i =>
      (spike + i, Seq.tabulate(dim)(j => math.cos(j * 0.1).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    SimilarityQueries.appendToVectorIndex(skewed, root, 1L)
    val after = audit()
    val imbalanceAfter = after.getAs[Double]("imbalance")
    assert(imbalanceAfter > imbalanceBefore,
      s"skewed ingest must grow the imbalance signal: " +
        s"$imbalanceBefore -> $imbalanceAfter")
    assert(after.getAs[Long]("n_assignments") >
      before.getAs[Long]("n_assignments"))
  }

  test("serve plan prunes assignment lists and re-ranks only probed members") {
    val root = SimilarityQueries.buildVectorIndex(spark, sf)
    val q = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, sf))
      .filter(col("vec_id") === 0)
      .select(col("emb"), col("nrm")).collect().head
    val df = SimilarityQueries.annServeFrom(spark, root,
      q.getSeq[Double](0).toArray, q.getDouble(1))
    df.collect() // AQE finalizes on execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cid"),
      s"probe ids must prune list directories:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"re-rank joins the 1-row query broadcast, never a shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
