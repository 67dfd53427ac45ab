package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall study for the persisted IVF index: for each fixture scale,
  * build the index once and measure mean recall@10 over a spread of
  * query vectors as a function of the probe width. The resulting
  * curve drives the ivfNProbe tuning recorded in SCALE.md.
  *
  * Run: sbt "Test/runMain graft.operators.RecallProbe"
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-recall-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args.toSeq match {
      case Seq("--jitter", src, dst) =>
        runJitterLifecycle(spark, src, dst)
      case "--pq" +: dirs if dirs.nonEmpty =>
        dirs.foreach(runPq(spark, _))
      case Seq("--pqjitter", src, dst) =>
        JitterFixture.ensure(spark, src, dst)
        runPq(spark, dst)
      case dirs if dirs.nonEmpty => dirs.foreach(run(spark, _))
      case _ =>
        Seq("0.001", "0.01", "0.1")
          .map(sf => s"/root/testdata/sf$sf").foreach(run(spark, _))
    } finally spark.stop()
  }

  /** The round-12 jittered-sf1.0 study (VERDICT r11 task 1): a 10×
    * fixture whose copies are PERTURBED, not verbatim — the regime
    * where recall is a real measurement — probed through the full
    * lifecycle: batch build (curve over probe widths), streamed
    * ingest against the first copy's quantizer, and the post-rebuild
    * index.
    *
    * Run: sbt "Test/runMain graft.operators.RecallProbe --jitter
    *   /root/testdata/sf0.1 /tmp/sf1.0-jitter"
    */
  def runJitterLifecycle(s: SparkSession, src: String, dst: String): Unit = {
    JitterFixture.ensure(s, src, dst)
    // 1. batch-built index: the standard curve
    run(s, dst)
    // 2. streamed ingest: quantizer trained on the BASE copy only,
    // the nine jittered copies appended as stream batches — the
    // live-deployment shape (ingest never re-clusters)
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(s, dst))
    val root = java.nio.file.Files
      .createTempDirectory("graft-recall-jitter-stream").toString
    IndexManifest.registerTempRoot(root)
    val base = graft.Tables.embeddings(s, dst)
      .filter(col("vec_id") < 1000000L)
    SimilarityQueries.initVectorIndex(base, root)
    (0 until 10).foreach { j =>
      SimilarityQueries.appendToVectorIndex(
        graft.Tables.embeddings(s, dst)
          .filter(col("vec_id") >= j * 1000000L &&
            col("vec_id") < (j + 1) * 1000000L),
        root, j.toLong)
    }
    val k2 = s.read.parquet(s"$root/centroids").count().toInt
    val (m2, n2) = JitterFixture.recallAt(s, dst, root, nQueries = 32)
    println(f"   streamed-ingest (k=$k2, default nprobe): " +
      f"mean_recall@10=$m2%.3f  min_recall@10=$n2%.3f")
    // 3. after the full rebuild (quantizer retrained on everything)
    SimilarityQueries.rebuildVectorIndex(s, root)
    val k3 = s.read.parquet(s"$root/centroids").count().toInt
    val (m3, n3) = JitterFixture.recallAt(s, dst, root, nQueries = 32)
    println(f"   post-rebuild    (k=$k3, default nprobe): " +
      f"mean_recall@10=$m3%.3f  min_recall@10=$n3%.3f")
  }

  /** PQ study: refined-ADC recall vs the exact serve at the default
    * probe width, plus the physical read-size ratio. Run:
    * sbt "Test/runMain graft.operators.RecallProbe --pq <dirs...>" or
    * --pqjitter <src> <dst> for the jittered 10× fixture. */
  def runPq(s: SparkSession, dir: String): Unit = {
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(s, dir))
      .select(col("vec_id"), col("emb"), col("nrm"))
    val all = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val n = all.length
    val root = java.nio.file.Files
      .createTempDirectory("graft-pqprobe").toString
    IndexManifest.registerTempRoot(root)
    SimilarityQueries.buildVectorIndexAt(s, dir, root)
    PqIndex.buildSidecar(s, root)
    val k = s.read.parquet(s"$root/centroids").count().toInt
    val qids = (0 until 32).map(i => all(i * n / 32)._1).distinct
    val queries = all.filter(t => qids.contains(t._1))
    def exactTop10(qv: Array[Double], qn: Double): Set[Long] =
      all.map { case (id, v, nr) =>
        (id, (0 until v.length).map(i => v(i) * qv(i)).sum / (nr * qn))
      }.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val truth = queries.map { case (id, qv, qn) =>
      id -> exactTop10(qv, qn)
    }.toMap
    import s.implicits._
    val qdf = queries.toSeq.map { case (id, qv, qn) => (id, qv.toSeq, qn) }
      .toDF("query_id", "qv", "qn")
    def recallOf(served: Map[Long, Set[Long]]): (Double, Double) = {
      val rs = truth.map { case (id, t) =>
        t.intersect(served.getOrElse(id, Set.empty)).size.toDouble / t.size
      }
      (rs.sum / rs.size, rs.min)
    }
    def grouped(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val (em, en) = recallOf(grouped(
      SimilarityQueries.annServeBatchFrom(s, root, qdf)))
    val (pm, pn) = recallOf(grouped(
      PqIndex.annTopKPqBatchFrom(s, root, qdf)))
    def bytes(sub: String): Long = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(root, sub))
      try st.filter(f => f.toString.endsWith(".parquet"))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally st.close()
    }
    val cb = bytes("pq/codes")
    val ab = bytes("assignments")
    println(f"== PQ $dir: n=$n k=$k  exact mean/min@10=$em%.3f/$en%.2f  " +
      f"refined-PQ mean/min@10=$pm%.3f/$pn%.2f  " +
      f"codes=${cb / 1024}%d KiB vs lists=${ab / 1024}%d KiB " +
      f"(${ab.toDouble / cb}%.1fx)")
  }

  def run(s: SparkSession, dir: String): Unit = {
    val e = SimilarityQueries.withNorm(graft.Tables.embeddings(s, dir))
      .select(col("vec_id"), col("emb"), col("nrm"))
    val all = e.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val n = all.length
    val root = java.nio.file.Files
      .createTempDirectory("graft-recallprobe").toString
    IndexManifest.registerTempRoot(root)
    SimilarityQueries.buildVectorIndexAt(s, dir, root)
    val k = s.read.parquet(s"$root/centroids").count().toInt

    // 32 queries spread across the id range
    val qids = (0 until 32).map(i => all(i * n / 32)._1).distinct
    val queries = all.filter(t => qids.contains(t._1))
    def exactTop10(qv: Array[Double], qn: Double): Set[Long] =
      all.map { case (id, v, nr) =>
        val dot = (0 until v.length).map(i => v(i) * qv(i)).sum
        (id, dot / (nr * qn))
      }.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val truth = queries.map { case (id, qv, qn) =>
      id -> exactTop10(qv, qn)
    }.toMap

    import s.implicits._
    val qdf = queries.toSeq.map { case (id, qv, qn) => (id, qv.toSeq, qn) }
      .toDF("query_id", "qv", "qn")
    val default = SimilarityQueries.ivfNProbe(k)
    val widths = Seq(math.max(3, k / 16), math.max(3, k / 8),
      math.max(3, k / 4), default, math.max(3, k / 3),
      math.max(3, k / 2), (k * 2) / 3, k).distinct.sorted
    println(s"== $dir: n=$n k=$k default_nprobe=$default")
    for (w <- widths) {
      val served = SimilarityQueries
        .annServeBatchFrom(s, root, qdf, nprobeOverride = Some(w))
        .collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val recalls = truth.map { case (id, t) =>
        t.intersect(served.getOrElse(id, Set.empty)).size.toDouble / t.size
      }
      val mean = recalls.sum / recalls.size
      val mn = recalls.min
      println(f"   nprobe=$w%3d  probe_share=${w.toDouble / k}%.2f  " +
        f"mean_recall@10=$mean%.3f  min_recall@10=$mn%.3f")
    }
  }
}
