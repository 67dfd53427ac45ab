package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** text_ppl_kn: the property the oracle gate can't state — the
  * continuation-count insight that distinguishes Kneser-Ney from
  * frequency-interpolated smoothing (text_ppl_filter's form): a word
  * frequent ONLY inside one collocation must back off WORSE than a
  * word of identical corpus frequency spread across many contexts. */
class PplKnSpec extends SparkSpec {
  import spark.implicits._

  test("the Francisco property: same corpus frequency, one context " +
      "vs ten contexts - the one-collocation word scores higher NLL " +
      "after an unseen context") {
    // train ids (%10 < 7): 'francisco' appears 10x but ONLY after
    // 'san'; 'common' appears 10x after ten DISTINCT words
    val docs = (Seq(
      1L -> Iterator.fill(10)("san francisco").mkString(" ")) ++
      Seq("aa", "bb", "cc", "dd", "ee").zipWithIndex.map {
        case (w, i) => (2L + i) -> s"$w common" } ++
      Seq("ff", "gg", "hh", "ii", "jj").zipWithIndex.map {
        case (w, i) => (11L + i) -> s"$w common" } ++
      // test ids (%10 >= 7): one bigram each, unseen context 'xyz'
      Seq(17L -> "xyz francisco", 28L -> "xyz common"))
      .toDF("doc_id", "text")
    val out = TextQueries.textPplKnFrom(docs)
      .select(col("doc_id"), col("nll"), col("n_bigrams")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out(17L)._2 == 1L && out(28L)._2 == 1L)
    assert(out(17L)._1 > out(28L)._1,
      s"francisco (1 continuation context) must score strictly worse " +
        s"than common (10 contexts): ${out(17L)._1} vs ${out(28L)._1}")
  }

  test("scores are partition-invariant") {
    val a = TextQueries.textPplKn(spark, sf)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = TextQueries.textPplKnFrom(
      graft.Tables.documents(spark, sf).repartition(11))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
