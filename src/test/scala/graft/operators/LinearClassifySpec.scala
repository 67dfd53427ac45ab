package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** text_classify_linear: the properties the oracle gate can't state —
  * driver/distributed bit parity, partitioning invariance, and the
  * planted separation where the subword linear model beats
  * text_nb_classify (VERDICT r16 task 2's "done" bar). */
class LinearClassifySpec extends SparkSpec {
  import spark.implicits._

  test("driver and distributed training paths are bit-identical " +
      "(batch updates are order-free integer sums)") {
    val docs = graft.Tables.documents(spark, sf)
    val a = LinearClassifyQueries.textClassifyLinearFrom(docs)
      .orderBy("doc_id").collect()
    val b = LinearClassifyQueries
      .textClassifyLinearFrom(docs.repartition(7), driverMax = 0L)
      .orderBy("doc_id").collect()
    assert(a.nonEmpty)
    assert(a.sameElements(b),
      "distributed path (driverMax=0, repartitioned input) must equal " +
        "the driver loop row for row")
  }

  /** Planted fixture: every word is UNIQUE in the corpus, but class-a
    * words carry the subword prefix 'axq' and class-b words 'bxq'.
    * Word-feature Naive Bayes sees only out-of-vocabulary tokens at
    * test time — smoothing collapses every per-token term to the
    * same unseen-mass constant, so its verdict degenerates to the
    * class-size/total-mass prior and one class gets everything. The
    * hashed char-trigram perceptron reads the prefix and is exact —
    * fastText's published subword advantage, planted. */
  private def plantedDocs = {
    def word(cls: String, i: Int) = f"${cls}q$i%04d"
    // doc_ids chosen so %10<7 trains and %10>=7 scores, both classes
    // in both splits
    val rows = (0 until 40).map { k =>
      val cls = if (k % 2 == 0) "ax" else "bx"
      val lang = if (cls == "ax") "aa" else "bb"
      val docId = (k / 10) * 10 + (k % 10) // 0..9, 10..19, ...
      val text = (0 until 8).map(j => word(cls, k * 8 + j)).mkString(" ")
      (docId.toLong, text, lang)
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("planted subword separation: the linear model is exact where " +
      "text_nb_classify degenerates to a single class") {
    val docs = plantedDocs
    val truth = docs.filter(pmod(col("doc_id"), lit(10)) >= 7)
      .select(col("doc_id"), col("lang")).as[(Long, String)]
      .collect().toMap
    assert(truth.nonEmpty && truth.values.toSet.size == 2,
      "test split must contain both classes")

    val lin = LinearClassifyQueries.textClassifyLinearFrom(docs)
      .select(col("doc_id"), col("pred_lang")).as[(Long, String)]
      .collect().toMap
    val nb = TextQueries.textNbClassifyFrom(docs)
      .select(col("doc_id"), col("pred_lang")).as[(Long, String)]
      .collect().toMap

    def acc(pred: Map[Long, String]): Double =
      truth.count { case (d, y) => pred.get(d).contains(y) }.toDouble /
        truth.size

    assert(acc(lin) == 1.0,
      s"linear must be exact on the planted prefixes, got ${acc(lin)}")
    assert(nb.values.toSet.size == 1,
      "NB must degenerate to one class on all-OOV test docs " +
        s"(got ${nb.values.toSet})")
    assert(acc(lin) > acc(nb),
      s"linear (${acc(lin)}) must beat NB (${acc(nb)})")
  }

  test("training reaches a fixed point on separable data: the " +
      "distributed path stops early and matches the driver loop") {
    val docs = plantedDocs
    val a = LinearClassifyQueries.textClassifyLinearFrom(docs)
      .orderBy("doc_id").collect()
    val b = LinearClassifyQueries
      .textClassifyLinearFrom(docs, driverMax = 0L)
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
    // every test prediction's score must be strictly positive —
    // the separating weights actually fired (not an all-zero model)
    assert(a.forall(_.getLong(2) > 0L),
      "converged model must produce positive argmax scores")
  }

  test("quality head distills the rule filter exactly when the " +
      "quality signal is in the prefix (planted hash-spam vs prose)") {
    // hq: 60 words of stop-worded prose (passes every Gopher rule);
    // lq: 60 hash-runs (fails the hash-ratio rule). The lq prefix is
    // wall-to-wall '###' trigrams — linearly separable by design.
    val prose = ("the data with fast scan " * 12).trim
    val spam = (Seq.fill(60)("#####")).mkString(" ")
    val docs = (0 until 40).map { k =>
      val lq = k % 2 == 1
      (k.toLong, if (lq) spam else prose, "en")
    }.toDF("doc_id", "text", "lang")
    // sanity: gopher labels split exactly on the plant
    val truth = TextQueries.gopherRulesFrom(docs)
      .filter(pmod(col("doc_id"), lit(10)) >= 7)
      .select(col("doc_id"),
        when(col("keep"), "hq").otherwise("lq").as("y"))
      .as[(Long, String)].collect().toMap
    assert(truth.values.toSet == Set("hq", "lq"),
      s"plant must produce both verdicts, got ${truth.values.toSet}")
    val out = LinearClassifyQueries.textQualityLinearFrom(docs)
      .select(col("doc_id"), col("pred_quality")).as[(Long, String)]
      .collect().toMap
    assert(out.keySet == truth.keySet)
    assert(truth.forall { case (d, y) => out(d) == y },
      s"distilled filter must be exact on the plant: out=$out truth=$truth")
  }

  test("quality head at the gate corpus: deterministic verdicts in " +
      "{hq, lq} over the whole test split") {
    val out = LinearClassifyQueries.textQualityLinear(spark, sf)
      .select(col("doc_id"), col("pred_quality")).as[(Long, String)]
      .collect().toMap
    val nTest = graft.Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(10)) >= 7).count()
    assert(out.size == nTest)
    assert(out.values.toSet.subsetOf(Set("hq", "lq")))
  }
}
