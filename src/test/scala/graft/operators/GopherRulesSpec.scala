package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** text_gopher_rules: the published Gopher A1.1 quality-rule card.
  * One planted document per rule proves each verdict fires on exactly
  * the page shape the rule was published against; the fixture test
  * pins that the card actually splits the corpus (a rule set that
  * keeps or drops everything is a broken filter). */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val goodBody = {
    // 60 words, mean length in [3,10], stopwords present, no symbols
    val ws = Seq("the", "quick", "brown", "foxes", "jump", "over",
      "and", "rest", "with", "some", "lazy", "hounds")
    (ws ++ ws ++ ws ++ ws ++ ws).mkString(" ")
  }

  private def card(rows: Seq[(Long, String)]) =
    TextQueries.gopherRulesFrom(
      rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
        .withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text"))))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("each planted page shape trips exactly its own rule") {
    val shortDoc = "the cat sat with a hat"                 // < 50 words
    val noStops = goodBody.split(" ")
      .map(w => if (Set("the", "and", "with").contains(w)) "xx" else w)
      .mkString(" ")                                        // stop_hits < 2
    val symbols = goodBody.split(" ")
      .map(w => w + "###").mkString(" ")                    // symbol ratio > 0.1
    val bullets = (1 to 10).map(i => s"- item $i " + goodBody)
      .mkString("\n")                                       // all lines bulleted
    val ellipses = (1 to 10).map(_ => goodBody + " trails off...")
      .mkString("\n")                                       // all lines end ...
    val numeric = (1 to 60).map(_.toString).mkString(" ")   // alpha frac 0
    val longWords = Seq.fill(60)("supercalifragilistic").mkString(" ")

    val m = card(Seq(
      1L -> goodBody, 2L -> shortDoc, 3L -> noStops, 4L -> symbols,
      5L -> bullets, 6L -> ellipses, 7L -> numeric, 8L -> longWords))

    def b(id: Long, name: String): Boolean =
      m(id).getBoolean(m(id).fieldIndex(name))
    assert(b(1, "keep"), "the good page must pass every rule")
    assert(!b(2, "r_words") && !b(2, "keep"))
    assert(!b(3, "r_stop") && !b(3, "keep"))
    assert(!b(4, "r_hash") && !b(4, "keep"))
    assert(b(4, "r_words"), "symbols must trip ONLY the symbol rule gate")
    assert(b(4, "r_ellipsis_sym"),
      "the hash and ellipsis ratios are SEPARATE published rules")
    assert(!b(5, "r_bullet") && !b(5, "keep"))
    assert(!b(6, "r_ellipsis_line") && !b(6, "keep"))
    assert(!b(7, "r_alpha") && !b(7, "keep"))
    assert(!b(8, "r_mean_len") && !b(8, "keep"))
  }

  test("stop gate counts OCCURRENCES (deliberate, documented): a page " +
      "repeating one stop word passes r_stop") {
    // Gopher A1.1's "at least two of the following" is read as two
    // occurrences, not two distinct words — the fixture vocabulary
    // has only one listed stop word, so the distinct reading would
    // make keep constant-false at the gate (vacuous verdict column).
    val repeated = (Seq.fill(30)("the") ++ Seq.fill(30)("quick"))
      .mkString(" ")
    val m = card(Seq(20L -> repeated))
    val r = m(20L)
    assert(r.getLong(r.fieldIndex("stop_hits")) == 30)
    assert(r.getBoolean(r.fieldIndex("r_stop")))
  }

  test("signal arithmetic: counts and fractions are exact") {
    val m = card(Seq(10L -> "aaa bb c\n- x\nok..."))
    val r = m(10L)
    assert(r.getLong(r.fieldIndex("n_words")) == 4,
      "words split on space only — newlines stay inside words")
    assert(r.getDouble(r.fieldIndex("bullet_frac")) == 0.3333,
      "1 of 3 lines bulleted")
    assert(r.getDouble(r.fieldIndex("ellipsis_line_frac")) == 0.3333,
      "1 of 3 lines ends with ellipsis")
  }

  test("the fixture corpus splits on the card (neither all-keep nor " +
      "all-drop)") {
    val df = TextQueries.textGopherRules(spark, sf)
    val n = df.count()
    val kept = df.filter(col("keep")).count()
    assert(n > 0 && kept > 0 && kept < n,
      s"degenerate split: $kept / $n")
    // fixture docs are single-line lowercase words: line rules and the
    // symbol rule must hold everywhere (a regression here means the
    // splitter changed)
    assert(df.filter(!col("r_bullet") || !col("r_ellipsis_line") ||
      !col("r_hash") || !col("r_ellipsis_sym")).count() == 0)
  }
}
