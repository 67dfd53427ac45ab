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

  test("serving twice from one index is deterministic") {
    val a = SimilarityQueries.simAnnIvfIndexed(spark, sf).collect().toSeq
    val b = SimilarityQueries.simAnnIvfIndexed(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("serve plan prunes assignment lists and re-ranks only probed members") {
    val df = SimilarityQueries.simAnnIvfIndexed(spark, sf)
    df.collect() // AQE finalizes on execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cid"),
      s"probe ids must prune list directories:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"re-rank joins the 1-row query broadcast, never a shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
