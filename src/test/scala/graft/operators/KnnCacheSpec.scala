package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The k-NN graph memo's staleness discipline (ADVICE r13): the cache
  * is keyed by corpus DIR with the fingerprint in the value, so an
  * in-place corpus regeneration must (a) serve the NEW graph and
  * (b) unpersist the stale entry's blocks instead of leaking them in
  * the block manager for the life of the JVM. */
class KnnCacheSpec extends SparkSpec {

  private def writeCorpus(dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.map(i => (i, Seq(1.0f + i, 2.0f, 3.0f + (i % 3)), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("in-place corpus regeneration evicts and unpersists the " +
      "stale graph") {
    val dir = java.nio.file.Files
      .createTempDirectory("knncache").toString
    writeCorpus(dir, 0L to 9L)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ids1 = SimilarityQueries.simKnnJoin(spark, dir)
      .select("a").distinct().collect().map(_.getLong(0)).toSet
    assert(ids1.subsetOf((0L to 9L).toSet) && ids1.nonEmpty)
    val afterFirst = sc.getPersistentRDDs.keySet
    val firstBlocks = afterFirst -- before
    assert(firstBlocks.nonEmpty, "first build should persist the graph")

    // regenerate the corpus in place: different ids → new fingerprint
    writeCorpus(dir, 100L to 109L)
    val ids2 = SimilarityQueries.simKnnJoin(spark, dir)
      .select("a").distinct().collect().map(_.getLong(0)).toSet
    assert(ids2.subsetOf((100L to 109L).toSet) && ids2.nonEmpty,
      s"stale graph served after regeneration: $ids2")
    val afterSecond = sc.getPersistentRDDs.keySet
    assert((firstBlocks & afterSecond).isEmpty,
      s"stale graph blocks leaked: ${firstBlocks & afterSecond}")
  }

  test("unchanged corpus is served from the memo (same cached plan)") {
    val dir = java.nio.file.Files
      .createTempDirectory("knncache2").toString
    writeCorpus(dir, 0L to 7L)
    val g1 = SimilarityQueries.simKnnJoin(spark, dir)
    val g2 = SimilarityQueries.simKnnJoin(spark, dir)
    assert(g1 eq g2, "same fingerprint must return the memoized frame")
  }
}
