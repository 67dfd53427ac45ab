package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The PQ sidecar (sim_ann_ivf_pq / sim_ann_pq_audit): ADC-serve
  * recall against the exact answer, deterministic rebuilds, the
  * staleness refusal, delete visibility, and the pruned codes-only
  * serve plan.
  */
class PqIndexSpec extends SparkSpec {

  private def freshIndexedRoot(dir: String): String = {
    val root = Files.createTempDirectory("graft-pq").toString
    IndexManifest.registerTempRoot(root)
    SimilarityQueries.buildVectorIndexAt(spark, dir, root)
    root
  }

  test("sf0.1 refined ADC serve holds mean recall@10 >= 0.85 vs the " +
    "GLOBAL exact answer at the default probe width") {
    // the quality bar for the compressed read path, measured where the
    // bench runs: recall folds BOTH losses (IVF probe miss + the PQ
    // shortlist missing a true neighbor) and must stay close to the
    // exact serve's 0.9 bar (VectorIndexSpec) to be worth the
    // codes-shaped candidate scan. Pure (unrefined) ADC@10 measured
    // 0.48 here — near-uniform 64-dim data packs the true top-10 into
    // a sim band narrower than the quantization noise, which is
    // exactly why the serve refines (see PqIndex.RefineFactor).
    val dir = "/root/testdata/sf0.1"
    val root = SimilarityQueries.buildVectorIndex(spark, dir)
    PqIndex.buildSidecar(spark, root)
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("emb"), col("nrm"))
    val all = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val n = all.length
    val qs = (0 until 24).map(i => all(i * n / 24)).distinct
    def exactTop10(qv: Array[Double], qn: Double): Set[Long] =
      all.map { case (id, v, nr) =>
        (id, v.indices.map(i => v(i) * qv(i)).sum / (nr * qn))
      }.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val recalls = qs.map { case (_, qv, qn) =>
      val served = IndexServe.annTopKPq(spark, root, qv, qn)
        .collect().map(_.getLong(0)).toSet
      val t = exactTop10(qv, qn)
      t.intersect(served).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    info(f"refined ADC mean recall@10 = $mean%.3f, min = ${recalls.min}%.2f")
    assert(mean >= 0.85, f"ADC mean recall@10 = $mean%.3f below the bar")
    assert(recalls.min >= 0.5,
      f"worst ADC recall@10 = ${recalls.min}%.2f collapsed")
  }

  test("two sidecar builds over one corpus are byte-identical " +
    "(deterministic training)") {
    val root = freshIndexedRoot(sf)
    PqIndex.buildSidecar(spark, root)
    def snapshot(): (Set[String], Set[String]) = (
      spark.read.parquet(s"$root/pq/codebooks").collect()
        .map(_.toString).toSet,
      spark.read.parquet(s"$root/pq/codes").collect().map { r =>
        s"${r.get(0)}|${r.get(1)}|${
          r.getAs[Array[Byte]](2).map(b => b & 0xff).mkString(",")}|${r.get(3)}"
      }.toSet)
    val (cb1, codes1) = snapshot()
    // force a rebuild: drop the completion marker (the sidecar is
    // derived data — absence of the fingerprint just means re-encode)
    IndexManifest.update(root, Map("pq.fingerprint" -> "forced-stale"))
    assert(!PqIndex.sidecarFresh(root))
    PqIndex.buildSidecar(spark, root)
    val (cb2, codes2) = snapshot()
    assert(cb1 == cb2, "codebooks must be identical across rebuilds")
    assert(codes1 == codes2, "codes must be identical across rebuilds")
  }

  test("a stale sidecar refuses to serve; rebuild re-admits it and " +
    "finds the new batch") {
    val root = freshIndexedRoot(sf)
    PqIndex.buildSidecar(spark, root)
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, sf))
    // land a new batch: the assignments fingerprint moves
    val batch = graft.Tables.embeddings(spark, sf).limit(3)
      .withColumn("vec_id", col("vec_id") + 500000L)
    SimilarityQueries.appendToVectorIndex(batch, root, batchId = 1L)
    val q = e.filter(col("vec_id") === 1).select(col("emb"), col("nrm"))
      .collect().head
    val qv = q.getSeq[Double](0).toArray
    val qn = q.getDouble(1)
    val ex = intercept[IllegalArgumentException] {
      IndexServe.annTopKPq(spark, root, qv, qn)
    }
    assert(ex.getMessage.contains("stale"), ex.getMessage)
    PqIndex.buildSidecar(spark, root)
    // vec_id 1's clone landed at 500001 with an IDENTICAL embedding:
    // after the rebuild its list is certainly probed (it shares the
    // query's own nearest centroids) and its ADC score ties the
    // query's own, so it must appear in the top-10
    val served = IndexServe.annTopKPq(spark, root, qv, qn)
      .collect().map(_.getLong(0)).toSet
    assert(served.contains(500001L),
      s"freshly landed identical vector must be served: $served")
  }

  test("tombstoned vectors vanish from the ADC serve immediately") {
    val root = freshIndexedRoot(sf)
    PqIndex.buildSidecar(spark, root)
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, sf))
    val q = e.filter(col("vec_id") === 0).select(col("emb"), col("nrm"))
      .collect().head
    val qv = q.getSeq[Double](0).toArray
    val qn = q.getDouble(1)
    val before = IndexServe.annTopKPq(spark, root, qv, qn)
      .collect().map(_.getLong(0))
    val victim = before.head
    import spark.implicits._
    SimilarityQueries.deleteFromVectorIndex(spark, root,
      Seq(victim).toDF("vec_id"), batchId = 1L)
    val after = IndexServe.annTopKPq(spark, root, qv, qn)
      .collect().map(_.getLong(0)).toSet
    assert(!after.contains(victim),
      "tombstone must hide the vector from the PQ serve without a " +
        "sidecar rebuild")
  }

  test("phase 1 scans ONLY pruned code partitions; phase 2 reads only " +
    "a shortlist-filtered pruned fetch — the corpus is never touched") {
    val root = freshIndexedRoot(sf)
    PqIndex.buildSidecar(spark, root)
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, sf))
    val q = e.filter(col("vec_id") === 0).select(col("emb"), col("nrm"))
      .collect().head
    val qv = q.getSeq[Double](0).toArray
    val qn = q.getDouble(1)
    // phase 1: the candidate scan is codes-shaped — ~M+8 bytes per
    // probed member, never the full-vector lists, never the corpus
    val p1 = PqIndex.adcShortlistForQuery(spark, root, qv, qn, 64)
      .queryExecution.executedPlan.toString
    assert(p1.contains("pq/codes"), "phase 1 must scan the codes")
    assert(!p1.contains("assignments"),
      "the ADC candidate scan must not touch the full-vector lists")
    assert(!p1.contains("embeddings.parquet"),
      "the ADC candidate scan must not touch the corpus")
    assert(p1.contains("PartitionFilters") && p1.contains("cid"),
      "probed cids must prune code partitions at planning time")
    // phase 2 (the returned frame): a pruned point-fetch of at most
    // shortN full vectors, vec_id-filtered at the scan
    val p2 = PqIndex.annTopKPqFrom(spark, root, qv, qn)
      .queryExecution.executedPlan.toString
    assert(p2.contains("assignments"), "refine must fetch full vectors")
    assert(!p2.contains("embeddings.parquet"),
      "refine must not touch the corpus")
    assert(p2.contains("PartitionFilters") && p2.contains("cid"),
      "refine fetch must stay partition-pruned to the probed lists")
    assert(p2.contains("vec_id"),
      "refine fetch must filter to the shortlist at the scan")
  }

  test("batch PQ serve is per-query hash-identical to N single PQ " +
    "serves") {
    val dir = "/root/testdata/sf0.01"
    val root = SimilarityQueries.buildVectorIndex(spark, dir)
    PqIndex.buildSidecar(spark, root)
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, dir))
    val ids = SimilarityQueries.ANN_BATCH_IDS
    val qs = e.filter(col("vec_id").isin(ids.map(Long.box): _*))
      .select(col("vec_id"), col("emb"), col("nrm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    import spark.implicits._
    val qdf = qs.toSeq.map { case (id, qv, qn) => (id, qv.toSeq, qn) }
      .toDF("query_id", "qv", "qn")
    val batch = IndexServe.annTopKPqBatch(spark, root, qdf)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getDouble(2))).toSet).toMap
    qs.foreach { case (id, qv, qn) =>
      val single = IndexServe.annTopKPq(spark, root, qv, qn)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(batch.getOrElse(id, Set.empty) == single,
        s"query $id: batch and single PQ serves must agree exactly")
    }
  }

  test("the batch phase-1 plan is ONE codes scan for the whole query " +
    "table") {
    val root = freshIndexedRoot(sf)
    PqIndex.buildSidecar(spark, root)
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, sf))
    import spark.implicits._
    val qdf = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"),
        col("emb").as("qv"), col("nrm").as("qn"))
    // the batch serve runs two jobs; pin the RETURNED (phase 2) plan:
    // one pruned assignments fetch, never the corpus, and no codes
    // re-scan (the shortlist was already collected)
    val plan = PqIndex.annTopKPqBatchFrom(spark, root, qdf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("assignments"))
    assert(!plan.contains("embeddings.parquet"),
      "batch refine must not touch the corpus")
    assert(!plan.contains("pq/codes"),
      "phase 2 must not re-scan the codes")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"refine must be ONE pruned fetch, saw $scans:\n$plan")
  }

  test("scheduled vector maintenance refreshes an existing sidecar " +
    "automatically; ingest leaves it stale by design") {
    val root = freshIndexedRoot(sf)
    PqIndex.buildSidecar(spark, root)
    // ingest: stale by design (per-batch re-encode would serialize
    // the stream on retraining) — the serve refuses until maintenance
    val batch = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 7)
      .withColumn("vec_id", col("vec_id") + 700000L)
    SimilarityQueries.appendToVectorIndex(batch, root, batchId = 1L)
    assert(!PqIndex.sidecarFresh(root),
      "an append must leave the sidecar stale")
    // compaction (the scheduled maintenance op) heals it in-lease
    SimilarityQueries.compactVectorIndex(spark, root)
    assert(PqIndex.sidecarFresh(root),
      "compaction must refresh an existing sidecar")
    // and the healed sidecar really serves the appended vector
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(spark, sf))
    val q = e.filter(col("vec_id") === 7).select(col("emb"), col("nrm"))
      .collect().head
    val served = IndexServe.annTopKPq(spark, root,
      q.getSeq[Double](0).toArray, q.getDouble(1))
      .collect().map(_.getLong(0)).toSet
    assert(served.contains(700007L),
      s"appended identical vector must serve after the refresh: $served")
    // rebuild retrains the sub-quantizers over the rebuilt lists
    SimilarityQueries.appendToVectorIndex(
      graft.Tables.embeddings(spark, sf).limit(3)
        .withColumn("vec_id", col("vec_id") + 900000L), root, batchId = 9L)
    SimilarityQueries.rebuildVectorIndex(spark, root)
    assert(PqIndex.sidecarFresh(root),
      "rebuild must refresh an existing sidecar")
    // a root WITHOUT a sidecar is untouched by maintenance
    val bare = freshIndexedRoot(sf)
    SimilarityQueries.compactVectorIndex(spark, bare)
    assert(!Files.exists(Paths.get(bare, "pq")),
      "maintenance must not conjure a sidecar nobody built")
  }

  test("codes are M bytes per assignment row - the 100 TB read-path " +
    "contract the audit qid hash-checks") {
    val audit = PqIndex.simAnnPqAudit(spark, sf).collect().head
    assert(audit.getBoolean(1), "codes_complete")
    assert(audit.getBoolean(2), "code_width_ok")
    assert(audit.getBoolean(3), "nrm_parity")
    assert(audit.getBoolean(4), "sidecar_fresh")
    // and the physical artifact really is small: total code bytes ~
    // M+8 per row vs 8*d for the full vectors
    val root = SimilarityQueries.buildVectorIndex(spark, sf)
    def bytes(p: String): Long = {
      val dir = Paths.get(root, p)
      val s = Files.walk(dir)
      try s.filter(f => f.toString.endsWith(".parquet"))
        .mapToLong(f => Files.size(f)).sum
      finally s.close()
    }
    val codeBytes = bytes("pq/codes")
    val listBytes = bytes("assignments")
    info(s"codes $codeBytes B vs lists $listBytes B")
    assert(codeBytes * 4 < listBytes,
      s"PQ codes ($codeBytes B) must be far smaller than the " +
        s"full-vector lists ($listBytes B)")
  }
}
