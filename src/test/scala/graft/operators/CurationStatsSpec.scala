package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-scenario pins for curation_domain_stats (the per-source
  * keep verdict must flip on dup floods and short floods) and
  * text_ppl_filter (the held-out smoothing floor must score
  * out-of-vocabulary text finitely, and worse than in-vocab text). */
class CurationStatsSpec extends SparkSpec {

  private def plantedDocs(
      rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cur").toString
    rows.map { case (id, text, lang, src) => (id, text, lang, src,
        text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private val longA = ("alpha beta gamma delta " * 12).trim // > 200 chars

  test("domain stats flag dup-flooded and short-flooded sources") {
    val rows =
      // clean: 10 long distinct docs
      (0L until 10L).map(i => (i, s"$longA uniq$i", "en", "clean")) ++
      // dupfest: 10 docs, 5 identical copies -> dup_rate 0.4 > 0.1
      (10L until 20L).map(i => (i,
        if (i < 15L) s"$longA copy" else s"$longA uniq$i", "en", "dupfest")) ++
      // shorty: 10 distinct short docs -> short_share 1.0 > 0.3
      (20L until 30L).map(i => (i, s"tiny doc $i", "en", "shorty"))
    val got = CurationStatsFixture.run(spark, plantedDocs(rows))
    assert(got("clean") == (10L, 10L, true))
    assert(got("dupfest") == (10L, 6L, false))
    assert(got("shorty") == (10L, 10L, false))
  }

  test("ppl filter scores OOV text finitely and worse than in-vocab text") {
    // train split = doc_id%10 < 7; doc 8 repeats train vocab, doc 9 is
    // pure OOV — both are scored, OOV strictly worse, neither NaN/null
    val train = (0L until 7L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog", "en", "s"))
    val inVocab = Seq((8L, "the quick brown fox", "en", "s"))
    val oov = Seq((9L, "zzz qqq www vvv", "en", "s"))
    val dir = plantedDocs(train ++ inVocab ++ oov)
    val got = TextQueries.textPplFilter(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.contains(8L) && got.contains(9L))
    assert(!got(8L).isNaN && !got(9L).isNaN)
    assert(got(9L) > got(8L),
      s"OOV doc must score worse: oov=${got(9L)} invocab=${got(8L)}")
  }

  test("curation_datasheet: per-source card is internally consistent " +
      "and cross-checks the gopher card and the corpus totals") {
    import org.apache.spark.sql.functions._
    val rows = PipelineQueries.curationDatasheet(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
    assert(rows.map(_.getLong(1)).sum == docs.count(),
      "datasheet rows must cover every document exactly once")
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0001,
        s"mean quality out of range on $r")
      assert(r.getLong(3) > 0L && r.getLong(2) >= 1L)
    }
    // keep rate against the rule card directly, for one source
    val src = rows.head.getString(0)
    val ids = docs.filter(col("source") === src)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = TextQueries.textGopherRules(spark, sf)
      .filter(col("keep")).select("doc_id").collect()
      .map(_.getLong(0)).count(ids.contains)
    val want = BigDecimal(kept.toDouble / ids.size + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head.getDouble(4) == want,
      s"keep rate ${rows.head.getDouble(4)} != recomputed $want")
  }
}

/** Collects (source -> (n_docs, n_unique, keep)) for the spec. */
private object CurationStatsFixture {
  def run(s: org.apache.spark.sql.SparkSession, dir: String)
      : Map[String, (Long, Long, Boolean)] =
    PipelineQueries.curationDomainStats(s, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(6)))).toMap
}
