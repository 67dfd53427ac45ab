package graft.operators

import graft.SparkSpec

/** The property rand()-sampling lacks: hash sampling returns the SAME
  * rows regardless of partitioning or rerun. */
class SampleSpec extends SparkSpec {

  test("hash sample is stable across reruns and partitionings") {
    val a = SampleQueries.sampleHashFraction(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val b = SampleQueries.sampleHashFraction(spark, sf)
      .repartition(17)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    // splits partition the corpus: disjoint and complete
    val splits = SampleQueries.sampleSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum ==
      graft.Tables.documents(spark, sf).count())
    // stratified quota: exactly 12 per language
    val perLang = SampleQueries.sampleStratified(spark, sf)
      .groupBy("lang").count().collect().map(_.getLong(1))
    assert(perLang.nonEmpty && perLang.forall(_ == 12L))
  }
}
