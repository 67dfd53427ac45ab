package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** text_nb_classify pins: planted disjoint vocabularies are
  * recovered on the held-out split, smoothing keeps unseen tokens
  * from crashing or dominating, the argmax tie-break is the
  * documented (score desc, lang asc), and the train/score split is
  * exactly doc_id % 10. */
class NbClassifySpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  private def predict(d: DataFrame): Map[Long, (String, Double)] =
    TextQueries.textNbClassifyFrom(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("planted disjoint vocabularies classify the held-out split") {
    // train docs: ids with doc_id % 10 < 7; test docs: % 10 >= 7
    val rows = Seq[(Long, String, String)](
      (0L, "aa", "apple banana cherry apple"),
      (10L, "aa", "banana apple apple cherry banana"),
      (20L, "aa", "cherry cherry apple"),
      (1L, "bb", "xylo zebra quark zebra"),
      (11L, "bb", "quark quark zebra xylo"),
      (21L, "bb", "zebra xylo quark"),
      // held out — pure class-aa words and pure class-bb words
      (7L, "aa", "apple cherry banana"),
      (18L, "bb", "zebra quark quark"))
    val p = predict(docs(rows))
    assert(p.keySet == Set(7L, 18L))
    assert(p(7L)._1 == "aa")
    assert(p(18L)._1 == "bb")
    assert(p.values.forall { case (_, s) => !s.isNaN && s < 0.0 })
  }

  test("all-unseen tokens fall back to priors with lang-asc tie-break") {
    // symmetric classes: same token totals, same doc counts — an
    // unseen-vocabulary test doc scores identically under both, and
    // the documented tie-break picks the lexicographically smaller
    val rows = Seq[(Long, String, String)](
      (0L, "bb", "one two three"),
      (10L, "aa", "four five six"),
      (8L, "zz", "never seen words"))
    val p = predict(docs(rows))
    assert(p(8L)._1 == "aa")
  }

  test("the split is exactly doc_id % 10: train docs are never scored") {
    val rows = Seq[(Long, String, String)](
      (6L, "aa", "apple apple"), // 6 % 10 = 6 → train
      (17L, "aa", "apple"), // 17 % 10 = 7 → scored
      (29L, "bb", "zebra")) // 29 % 10 = 9 → scored
    val p = predict(docs(rows))
    assert(p.keySet == Set(17L, 29L))
  }

  test("dirty input: a doc_id under two langs counts ONCE in ntr " +
      "(the oracle's count(DISTINCT doc_id)) — priors stay exact") {
    // ADVICE r14: ntr was derived as Σ per-class prior counts, which
    // equals count(DISTINCT doc_id) only when every train doc
    // carries one lang. Plant the violation and pin the hand model:
    //   train: doc 0 under BOTH aa ("apple apple") and bb ("zebra"),
    //          doc 10 under aa ("apple")
    //   model: cnt(aa,apple)=3, cnt(bb,zebra)=1, tot aa=3 bb=1, V=2
    //   priors: nd_aa=2, nd_bb=1, ntr = 2 DISTINCT docs (not 3)
    //   doc 7 "apple": aa = ln(4/5) + ln(2/2), bb = ln(1/3) + ln(1/2)
    val rows = Seq[(Long, String, String)](
      (0L, "aa", "apple apple"),
      (0L, "bb", "zebra"),
      (10L, "aa", "apple"),
      (7L, "zz", "apple"))
    val p = predict(docs(rows))
    assert(p.keySet == Set(7L))
    val wantAa = BigDecimal(
      1.0 * math.log(4.0 / 5.0) + math.log(2.0 / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p(7L) == (("aa", wantAa)),
      s"got ${p(7L)}, want (aa, $wantAa) — ntr drifted from " +
        "count(DISTINCT doc_id)?")
  }

  test("top-features audit surfaces the planted class vocabulary") {
    val rows = Seq[(Long, String, String)](
      (0L, "aa", "apple banana cherry apple shared"),
      (10L, "aa", "banana apple apple cherry banana shared"),
      (1L, "bb", "xylo zebra quark zebra shared"),
      (11L, "bb", "quark quark zebra xylo shared"))
    val out = TextQueries.textNbTopFeaturesFrom(docs(rows)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val byClass = out.groupBy(_._1)
    assert(byClass.keySet == Set("aa", "bb"))
    byClass.values.foreach(f => assert(f.length <= 5))
    // class-exclusive tokens dominate; the shared token never beats
    // every exclusive one
    val aaToks = byClass("aa").sortBy(-_._3).map(_._2)
    val bbToks = byClass("bb").sortBy(-_._3).map(_._2)
    assert(Set("apple", "banana", "cherry").subsetOf(aaToks.toSet))
    assert(Set("xylo", "zebra", "quark").subsetOf(bbToks.toSet))
    assert(aaToks.head != "shared" && bbToks.head != "shared")
    // log-odds of an exclusive token is positive, shared ~ 0
    assert(byClass("aa").filter(_._2 == "apple").head._3 > 0.0)
  }

  test("fixture smoke: every held-out doc gets exactly one label") {
    val d = graft.Tables.documents(spark, sf)
    val out = TextQueries.textNbClassify(spark, sf)
    val expected = d.filter("doc_id % 10 >= 7").count()
    assert(out.count() == expected)
    assert(out.select("doc_id").distinct().count() == expected)
  }

  // ── text_langid_nb: the char-bigram twin through the same core ──

  private def predictLid(d: DataFrame): Map[Long, (String, Double)] =
    TextQueries.textLangidNbFrom(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("langid: planted disjoint alphabets classify the held-out " +
      "split on char bigrams alone") {
    // class-disjoint CHARACTER sets — word features would also
    // separate these, but the point is the bigram tokenizer: the
    // held-out docs share no whole WORD with training, only bigrams
    val rows = Seq[(Long, String, String)](
      (0L, "aa", "abab baba abba"),
      (10L, "aa", "aabb bbaa abab"),
      (1L, "bb", "xyxy yxyx xxyy"),
      (11L, "bb", "yyxx xyyx yxxy"),
      (7L, "aa", "bbab abaa"), // unseen words, familiar bigrams
      (18L, "bb", "xxyx yxyy"))
    val p = predictLid(docs(rows))
    assert(p.keySet == Set(7L, 18L))
    assert(p(7L)._1 == "aa" && p(18L)._1 == "bb")
  }

  test("langid: reads only the bounded prefix") {
    // doc 7's prefix is class-aa bigrams; beyond LID_PREFIX it is
    // drowned in class-bb characters — the cap must win
    val aaPrefix = "ab" * (TextQueries.LID_PREFIX / 2)
    val bbTail = " xy" * 500
    val rows = Seq[(Long, String, String)](
      (0L, "aa", "abab abab"), (10L, "aa", "baba baba"),
      (1L, "bb", "xyxy xyxy"), (11L, "bb", "yxyx yxyx"),
      (7L, "zz", aaPrefix + bbTail))
    val p = predictLid(docs(rows))
    assert(p(7L)._1 == "aa", s"prefix cap ignored: ${p(7L)}")
  }

  test("langid: single-char docs drop out on both ends") {
    val rows = Seq[(Long, String, String)](
      (0L, "aa", "abab"), (1L, "bb", "xyxy"),
      (7L, "aa", "a"), (18L, "bb", "xzxz"))
    val p = predictLid(docs(rows))
    assert(p.keySet == Set(18L)) // doc 7 has no bigram
  }

  test("langid fixture smoke: one label per held-out doc, labels " +
      "from the trained set, bit-stable under repartitioning") {
    // NOTE the fixture's text is lang-INDEPENDENT word soup (the
    // labels drive nothing in the generator), so accuracy against
    // the true labels is chance BY CONSTRUCTION for every possible
    // classifier — what's pinnable is the contract: exactly one
    // label per held-out doc, labels drawn from the training label
    // set, and integer-count determinism under partitioning
    val d = graft.Tables.documents(spark, sf)
    val out = TextQueries.textLangidNb(spark, sf).collect()
    val expected = d
      .filter(s"doc_id % 10 >= 7 AND length(substring(text, 1, " +
        s"${TextQueries.LID_PREFIX})) >= 2").count()
    assert(out.length == expected)
    assert(out.map(_.getLong(0)).distinct.length == expected)
    val trainLangs = d.filter("doc_id % 10 < 7")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(1)).toSet.subsetOf(trainLangs))
    val again = TextQueries.textLangidNbFrom(
      graft.Tables.documents(spark, sf).repartition(13)).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1).toSeq)
  }
}
