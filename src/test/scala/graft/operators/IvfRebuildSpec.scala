package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The audit→rebuild lifecycle (rebuildVectorIndex): a drifted ingest
  * must be repairable in place — retrain on the live set, reassign,
  * swap atomically — with the vector set preserved, pending
  * tombstones applied, the batch-id space fenced, and an interrupted
  * swap replaying from the journal.
  */
class IvfRebuildSpec extends SparkSpec {

  private def e = graft.Tables.embeddings(spark, sf)

  private def tmpRoot(prefix: String): String = {
    val r = Files.createTempDirectory(prefix).toString
    IndexManifest.registerTempRoot(r)
    r
  }

  private def floodedRoot(): String = {
    val root = tmpRoot("graft-rb")
    SimilarityQueries.initVectorIndex(e, root)
    SimilarityQueries.appendToVectorIndex(e, root, 0L)
    SimilarityQueries.appendToVectorIndex(
      SimilarityQueries.driftClones(e), root, 1L)
    root
  }

  test("rebuild repairs planted drift and fences the id space") {
    val root = floodedRoot()
    val before = SimilarityQueries.ivfAuditFrom(spark, root).collect().head
    val liveBefore = spark.read.parquet(s"$root/assignments")
      .select("vec_id").distinct().count()
    val newId = SimilarityQueries.rebuildVectorIndex(spark, root)
    assert(newId == 2L)
    val after = SimilarityQueries.ivfAuditFrom(spark, root).collect().head
    // the flood piled into few lists; the retrained quantizer has
    // centroids inside the drifted region, so skew must drop
    assert(after.getAs[Double]("imbalance") <
      before.getAs[Double]("imbalance"),
      s"rebuild did not reduce imbalance: $before -> $after")
    assert(spark.read.parquet(s"$root/assignments")
      .select("vec_id").distinct().count() == liveBefore)
    // the drifted region is now servable: an all-ones query's top
    // neighbors are the clones themselves at cosine 1
    val d = e.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).first().getInt(0)
    val ones = Array.fill(d)(1.0)
    val top = SimilarityQueries.annServeFrom(spark, root,
      ones, math.sqrt(d.toDouble)).collect()
    assert(top.nonEmpty && top.head.getDouble(1) > 0.999999)
    assert(top.head.getLong(0) >= 200000L)
    // every pre-rebuild batch id is fenced off; ingest resumes above
    intercept[IllegalArgumentException] {
      SimilarityQueries.appendToVectorIndex(e, root, newId)
    }
    SimilarityQueries.appendToVectorIndex(
      e.withColumn("vec_id", col("vec_id") + 900000L), root, newId + 1)
  }

  test("rebuild applies pending tombstones and clears them") {
    val root = floodedRoot()
    SimilarityQueries.deleteFromVectorIndex(spark, root,
      e.filter(pmod(col("vec_id"), lit(5)) === 2).select("vec_id"), 2L)
    SimilarityQueries.rebuildVectorIndex(spark, root)
    assert(spark.read.parquet(s"$root/assignments")
      .filter(pmod(col("vec_id"), lit(5)) === 2 &&
        col("vec_id") < 200000L).count() == 0)
    assert(!Files.exists(Paths.get(root, "deletes")))
  }

  test("an interrupted rebuild swap replays from the journal") {
    val root = tmpRoot("graft-rb-crash")
    SimilarityQueries.buildVectorIndexAt(spark, sf, root)
    val served = SimilarityQueries.annServeBatchFrom(spark, root,
      SimilarityQueries.withNorm(e).filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"),
          col("emb").as("qv"), col("nrm").as("qn"))).count()
    // hand-build the crash state: a fully staged rebuild (same
    // artifacts, new generation) whose swap never ran
    val tmp = Paths.get(root, "rebuild.staging")
    def copyTree(from: java.nio.file.Path, to: java.nio.file.Path): Unit = {
      val w = Files.walk(from)
      try w.iterator().forEachRemaining { p =>
        val t = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      } finally w.close()
    }
    copyTree(Paths.get(root, "assignments"), tmp.resolve("assignments"))
    copyTree(Paths.get(root, "centroids"), tmp.resolve("centroids"))
    Files.createFile(tmp.resolve("_STAGED"))
    val nLists = spark.read.parquet(s"$root/centroids").count()
    IndexManifest.update(root, Map(
      "rebuild.pending" -> "7",
      "rebuild.pending.nlists" -> nLists.toString))
    // the open path replays the swap to completion
    SimilarityQueries.openVectorIndex(spark, root)
    assert(!Files.exists(tmp))
    val m = IndexManifest.readIfExists(root)
    assert(!m.contains("rebuild.pending"))
    assert(m.get("compact.through.assignments").contains("7"))
    assert(m.get("n_lists").contains(nLists.toString))
    intercept[IllegalArgumentException] {
      SimilarityQueries.appendToVectorIndex(e, root, 7L)
    }
    // staged == live content, so serving is unchanged
    assert(SimilarityQueries.annServeBatchFrom(spark, root,
      SimilarityQueries.withNorm(e).filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"),
          col("emb").as("qv"), col("nrm").as("qn"))).count() == served)
  }

  test("rebuild debris without the staged marker is abandoned") {
    val root = floodedRoot()
    Files.createDirectories(Paths.get(root, "rebuild.staging"))
    IndexManifest.update(root, Map(
      "rebuild.pending" -> "9", "rebuild.pending.nlists" -> "1"))
    SimilarityQueries.recoverRebuild(root)
    assert(!Files.exists(Paths.get(root, "rebuild.staging")))
    val m = IndexManifest.readIfExists(root)
    assert(!m.contains("rebuild.pending"))
    assert(!m.contains("compact.through.assignments"))
  }

  test("durable root: rebuild then reopen serves with the new quantizer") {
    val root = tmpRoot("graft-rb-durable")
    SimilarityQueries.buildVectorIndexAt(spark, sf, root)
    SimilarityQueries.appendToVectorIndex(
      SimilarityQueries.driftClones(e), root, 1L)
    SimilarityQueries.rebuildVectorIndex(spark, root)
    // reopen cross-checks the UPDATED n_lists against the new quantizer
    SimilarityQueries.openVectorIndex(spark, root)
    val d = e.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).first().getInt(0)
    val top = SimilarityQueries.annServeFrom(spark, root,
      Array.fill(d)(1.0), math.sqrt(d.toDouble)).collect()
    assert(top.nonEmpty && top.head.getDouble(1) > 0.999999)
  }

  test("the declared rebuild qid preserves the vector set") {
    val row = SimilarityQueries.simAnnIvfRebuild(spark, sf).collect().head
    assert(row.getAs[Boolean]("vectors_preserved"))
    assert(row.getAs[Long]("n_vectors") > 0)
  }
}
