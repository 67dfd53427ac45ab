package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

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

  /** Recursive (relative-path, size) listing — the "did repair touch
    * this directory" fingerprint. */
  private def listing(p: java.nio.file.Path): Set[(String, Long)] = {
    val w = Files.walk(p)
    try w.iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(f => (p.relativize(f).toString, Files.size(f))).toSet
    finally w.close()
  }

  test("repair splits only the flagged lists and leaves the rest alone") {
    val root = floodedRoot()
    val before = SimilarityQueries.ivfAuditFrom(spark, root).collect().head
    val liveBefore = spark.read.parquet(s"$root/assignments")
      .select("vec_id").distinct().count()
    // occupancy + untouched-dir fingerprints before the repair. The
    // spec corpus is small, so the planted flood lands short of the
    // production 8× trigger — the tests drive the repair at 2× (its
    // imbalance parameter) for a deterministic flag set.
    val occ = spark.read.parquet(s"$root/assignments")
      .groupBy(col("cid").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mean = occ.map(_._2).sum.toDouble / occ.length
    val flagged = occ.filter(_._2 > 2.0 * mean).map(_._1).toSet
    assert(flagged.nonEmpty, "fixture must flag at least one list")
    val untouchedDirs = occ.map(_._1).filterNot(flagged)
      .map(cid => cid -> listing(Paths.get(root, "assignments", s"cid=$cid")))
      .toMap
    val newId = SimilarityQueries.repairVectorIndex(spark, root,
      imbalance = 2.0)
    assert(newId == 2L)
    // IO pin: every unflagged list directory is byte-identical
    untouchedDirs.foreach { case (cid, before) =>
      assert(listing(Paths.get(root, "assignments", s"cid=$cid")) == before,
        s"repair touched unflagged list $cid")
    }
    // audit green, live set preserved, manifest consistent
    val after = SimilarityQueries.ivfAuditFrom(spark, root).collect().head
    assert(!after.getAs[Boolean]("rebuild_due"),
      s"repair left the audit red: $before -> $after")
    assert(after.getAs[Double]("imbalance") <
      before.getAs[Double]("imbalance"))
    assert(spark.read.parquet(s"$root/assignments")
      .select("vec_id").distinct().count() == liveBefore)
    assert(IndexManifest.readIfExists(root).get("n_lists")
      .contains(spark.read.parquet(s"$root/centroids").count().toString))
    // the drifted region still serves: an all-ones query's neighbors
    // are the clones at cosine 1 (the identical flood was HASH-split,
    // so its children rank consecutively for this query)
    val d = e.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).first().getInt(0)
    val top = SimilarityQueries.annServeFrom(spark, root,
      Array.fill(d)(1.0), math.sqrt(d.toDouble), topK = 50).collect()
    assert(top.nonEmpty && top.forall(_.getDouble(1) > 0.999999))
    assert(top.forall(_.getLong(0) >= 200000L))
    // original corpus still serves itself (untouched lists intact)
    val q = SimilarityQueries.withNorm(e).filter(col("vec_id") === 0)
      .select(col("emb"), col("nrm")).collect().head
    val self = SimilarityQueries.annServeFrom(spark, root,
      q.getSeq[Double](0).toArray, q.getDouble(1)).collect()
    assert(self.nonEmpty && self.head.getLong(0) == 0L)
    // the id space is fenced; ingest resumes above
    intercept[IllegalArgumentException] {
      SimilarityQueries.appendToVectorIndex(e, root, newId)
    }
    SimilarityQueries.appendToVectorIndex(
      e.withColumn("vec_id", col("vec_id") + 900000L), root, newId + 1)
  }

  test("repair splits a diffuse (non-identical) skew geometrically") {
    val root = tmpRoot("graft-rp-geo")
    SimilarityQueries.initVectorIndex(e, root)
    SimilarityQueries.appendToVectorIndex(e, root, 0L)
    // a DIFFUSE cloud near all-ones: distinct vectors, same far-from-
    // corpus region, so they flood the same list(s) but CAN be split
    val cloud = e.filter(col("embedding").isNotNull)
      .select((col("vec_id") + 400000L).as("vec_id"), col("label"),
        expr("""transform(embedding,
          (x, i) -> 1.0 + 0.25 * cos(CAST(vec_id * (i + 1) AS DOUBLE)))""")
          .as("embedding"))
    SimilarityQueries.appendToVectorIndex(cloud, root, 1L)
    val occ0 = spark.read.parquet(s"$root/assignments")
      .groupBy(col("cid").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mean0 = occ0.map(_._2).sum.toDouble / occ0.length
    val flagged = occ0.filter(_._2 > 2.0 * mean0).map(_._1).toSet
    assert(flagged.nonEmpty, "diffuse cloud must flood at least one list")
    val worstBefore = occ0.map(_._2).max
    SimilarityQueries.repairVectorIndex(spark, root, imbalance = 2.0)
    // geometric split: the worst list shrank, and no single child of a
    // split holds ~everything (the degenerate-hash path asserts
    // nothing about geometry, so a dominant child here means the
    // k-means split silently failed)
    val occ1 = spark.read.parquet(s"$root/assignments")
      .groupBy(col("cid").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(occ1.map(_._2).max < worstBefore,
      s"split did not shrink the worst list: $worstBefore -> ${occ1.map(_._2).max}")
    // every cloud vector still findable by its own direction
    val qr = SimilarityQueries.withNorm(cloud)
      .filter(col("vec_id") === 400007L)
      .select(col("emb"), col("nrm")).collect().head
    val top = SimilarityQueries.annServeFrom(spark, root,
      qr.getSeq[Double](0).toArray, qr.getDouble(1)).collect()
    assert(top.nonEmpty && top.head.getLong(0) == 400007L)
  }

  test("repair keeps rows its ranker cannot place (NaN embeddings)") {
    // NaN-element embeddings ride Spark's NaN-greatest ordering past
    // nrm > 0 guards, but score NaN against every centroid, so the
    // split's nearest-child ranker cannot place them (near1 = -1).
    // They must fold into a child that HAS a centroid instead of
    // silently vanishing — the repair's nothing-lost invariant.
    val root = tmpRoot("graft-rp-nan")
    SimilarityQueries.initVectorIndex(e, root)
    SimilarityQueries.appendToVectorIndex(e, root, 0L)
    // a diffuse cloud so the split takes the geometric (non-degenerate)
    // path — the one that ranks members against refined children
    val cloud = e.filter(col("embedding").isNotNull)
      .select((col("vec_id") + 400000L).as("vec_id"), col("label"),
        expr("""transform(embedding,
          (x, i) -> 1.0 + 0.25 * cos(CAST(vec_id * (i + 1) AS DOUBLE)))""")
          .as("embedding"))
    SimilarityQueries.appendToVectorIndex(cloud, root, 1L)
    val occ = spark.read.parquet(s"$root/assignments")
      .groupBy(col("cid").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mean = occ.map(_._2).sum.toDouble / occ.length
    val fx = occ.maxBy(_._2)._1
    assert(occ.maxBy(_._2)._2 > 2.0 * mean, "fixture must flag a list")
    // plant the NaN member directly in the flooded list's layout (the
    // shape a guard-skirting ingest would have landed)
    val d = e.filter(col("embedding").isNotNull)
      .select(size(col("embedding"))).first().getInt(0)
    import spark.implicits._
    Seq((fx, 999999L, Seq.fill(d)(Double.NaN), Double.NaN))
      .toDF("cid", "vec_id", "emb", "nrm")
      .withColumn("batch_id", lit(1L))
      .repartition(1)
      .write.partitionBy("cid", "batch_id").mode("append")
      .parquet(s"$root/assignments")
    val liveBefore = spark.read.parquet(s"$root/assignments")
      .select("vec_id").distinct().count()
    SimilarityQueries.repairVectorIndex(spark, root, imbalance = 2.0)
    val a = spark.read.parquet(s"$root/assignments")
    // nothing lost — the NaN row included
    assert(a.select("vec_id").distinct().count() == liveBefore)
    assert(a.filter(col("vec_id") === 999999L).count() >= 1,
      "repair dropped the unplaceable NaN member")
    // and it sits in a list that HAS a centroid (reachable + auditable)
    val cids = spark.read.parquet(s"$root/centroids")
      .select("cid").collect().map(_.getLong(0)).toSet
    val nanCids = a.filter(col("vec_id") === 999999L)
      .select(col("cid").cast("long")).collect().map(_.getLong(0))
    assert(nanCids.forall(cids.contains),
      s"NaN member landed in centroid-less list(s): ${nanCids.toSeq}")
  }

  test("repair leaves tombstones armed for the untouched lists") {
    val root = floodedRoot()
    SimilarityQueries.deleteFromVectorIndex(spark, root,
      e.filter(pmod(col("vec_id"), lit(5)) === 2).select("vec_id"), 2L)
    SimilarityQueries.repairVectorIndex(spark, root, imbalance = 2.0)
    // unlike rebuild, repair must NOT clear tombstones: rows of
    // unflagged lists were never rewritten, so clearing would
    // resurrect them at serve time
    assert(Files.exists(Paths.get(root, "deletes")))
    val q = SimilarityQueries.withNorm(e).filter(col("vec_id") === 0)
      .select(col("emb"), col("nrm")).collect().head
    val served = SimilarityQueries.annServeFrom(spark, root,
      q.getSeq[Double](0).toArray, q.getDouble(1), topK = 100).collect()
    assert(served.nonEmpty &&
      served.forall(r => r.getLong(0) % 5 != 2 || r.getLong(0) >= 200000L))
  }

  test("an interrupted repair swap replays from the journal") {
    val root = tmpRoot("graft-rp-crash")
    SimilarityQueries.buildVectorIndexAt(spark, sf, root)
    val served = SimilarityQueries.annServeBatchFrom(spark, root,
      SimilarityQueries.withNorm(e).filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id"),
          col("emb").as("qv"), col("nrm").as("qn"))).count()
    assert(served >= 0)
    val tmp = Paths.get(root, "repair.staging")
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
      "repair.pending" -> "7",
      "repair.pending.nlists" -> nLists.toString))
    SimilarityQueries.openVectorIndex(spark, root)
    assert(!Files.exists(tmp))
    val m = IndexManifest.readIfExists(root)
    assert(!m.contains("repair.pending"))
    assert(m.get("compact.through.assignments").contains("7"))
    intercept[IllegalArgumentException] {
      SimilarityQueries.appendToVectorIndex(e, root, 7L)
    }
  }

  test("a replaced list with no staged counterpart is pruned at swap") {
    // the ghost-list case: a flagged list whose keeper child came out
    // of the split EMPTY writes no staged cid dir — the swap must
    // delete the live dir anyway (marker-driven), or its members
    // survive duplicated and every later audit counts them twice
    val root = tmpRoot("graft-rp-ghost")
    SimilarityQueries.initVectorIndex(e, root)
    SimilarityQueries.appendToVectorIndex(e, root, 0L)
    val victim = spark.read.parquet(s"$root/assignments")
      .groupBy(col("cid").cast("long").as("cid"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("cid")).collect().head.getLong(0)
    val victimIds = spark.read.parquet(s"$root/assignments")
      .filter(col("cid") === victim).select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // hand-build the crash state: a staged repair whose marker says
    // cid=victim was replaced but stages nothing for it (the empty-
    // keeper shape), with the centroids unchanged
    val tmp = Paths.get(root, "repair.staging")
    Files.createDirectories(tmp.resolve("assignments"))
    val w = Files.walk(Paths.get(root, "centroids"))
    try w.iterator().forEachRemaining { p =>
      val t = tmp.resolve("centroids").resolve(
        Paths.get(root, "centroids").relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    } finally w.close()
    Files.write(tmp.resolve("_STAGED"),
      s"v2\nreplaced:cid=$victim".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    val nLists = spark.read.parquet(s"$root/centroids").count()
    IndexManifest.update(root, Map(
      "repair.pending" -> "5",
      "repair.pending.nlists" -> nLists.toString))
    SimilarityQueries.recoverRepair(root)
    assert(!Files.exists(Paths.get(root, "assignments", s"cid=$victim")),
      "ghost list survived the marker-driven swap")
    assert(!Files.exists(tmp))
    // soft assignment: every victim-list member also lives in its
    // second list, so nothing is fully lost — only the replaced dir
    val remaining = spark.read.parquet(s"$root/assignments")
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
    assert(victimIds.forall(remaining.contains),
      "pruning the replaced dir lost sole copies")
  }

  test("the declared repair qid preserves the vector set") {
    val row = SimilarityQueries.simAnnIvfRepair(spark, sf).collect().head
    assert(row.getAs[Boolean]("vectors_preserved"))
    assert(row.getAs[Long]("n_vectors") > 0)
  }
}
