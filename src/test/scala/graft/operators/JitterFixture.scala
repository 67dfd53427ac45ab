package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The jittered 10× embedding fixture (round-12, VERDICT r11 task 1):
  * verbatim 10× replication makes recall@10 = 1.000 trivially (copies
  * route to identical lists), so the large-scale recall story needs a
  * corpus whose near-neighbors are CLOSE but not identical. Copy j of
  * vector v is v + noise(vec_id, j, dim) with deterministic
  * hash-uniform noise of amplitude `scale` (≈ 20% of the corpus's
  * typical |component| at the default) — every base grows a tight
  * 10-point cluster, the regime a trained quantizer is supposed to
  * exploit, with nothing verbatim except copy 0 (the base itself).
  * Deterministic end-to-end: same src ⇒ same fixture bytes.
  */
object JitterFixture {

  /** Write `copies`× jittered embeddings for `srcDir` under `dstDir`
    * (skips if already present — keyed by a marker file). Returns
    * dstDir. */
  def ensure(s: SparkSession, srcDir: String, dstDir: String,
      copies: Int = 10, scale: Double = 0.15): String = synchronized {
    val marker = java.nio.file.Paths.get(dstDir, "_JITTER_DONE")
    if (java.nio.file.Files.exists(marker)) return dstDir
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dstDir))
    val base = graft.Tables.embeddings(s, srcDir)
    val jittered: DataFrame = (0 until copies).map { j =>
      if (j == 0) base
      else base.select(
        (col("vec_id") + lit(j * 1000000L)).as("vec_id"),
        expr(
          s"""transform(embedding, (x, i) -> CAST(x + $scale *
             |  (pmod(xxhash64(vec_id, i, $j), 1000) / 1000.0 - 0.5)
             |  AS FLOAT))""".stripMargin).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    jittered.select(col("vec_id"), col("embedding"), col("label"))
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$dstDir/embeddings.parquet")
    java.nio.file.Files.createFile(marker)
    dstDir
  }

  /** Mean/min recall@10 of the persisted serve path at `root` against
    * brute-force ground truth over `nQueries` queries spread across
    * the corpus of `dir`. */
  def recallAt(s: SparkSession, dir: String, root: String,
      nQueries: Int = 16, nprobe: Option[Int] = None,
      pq: Boolean = false): (Double, Double) = {
    import s.implicits._
    val all = SimilarityQueries.withNorm(graft.Tables.embeddings(s, dir))
      .select(col("vec_id"), col("emb"), col("nrm"))
      .collect().map(r =>
        (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val n = all.length
    val queries = (0 until nQueries).map(i => all(i * n / nQueries))
      .distinctBy(_._1)
    def exactTop10(qv: Array[Double], qn: Double): Set[Long] =
      all.map { case (id, v, nr) =>
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += v(i) * qv(i); i += 1 }
        (id, dot / (nr * qn))
      }.sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val truth = queries.map { case (id, qv, qn) =>
      id -> exactTop10(qv, qn)
    }.toMap
    val qdf = queries.map { case (id, qv, qn) => (id, qv.toSeq, qn) }
      .toDF("query_id", "qv", "qn")
    val served = (if (pq)
        PqIndex.annTopKPqBatchFrom(s, root, qdf, nprobe = nprobe)
      else SimilarityQueries.annServeBatchFrom(s, root, qdf,
        nprobeOverride = nprobe))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = truth.map { case (id, t) =>
      t.intersect(served.getOrElse(id, Set.empty)).size.toDouble / t.size
    }
    (recalls.sum / recalls.size, recalls.min)
  }
}
