package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** text_extract_main: the jusText-style block classifier at its
  * PUBLISHED thresholds (0.30/0.32) on planted English pages — each
  * block shaped to trip exactly one axis — plus the non-degenerate
  * gate-fixture split. */
class TextExtractSpec extends SparkSpec {
  import spark.implicits._

  // real English prose: 40 words, stop density well above 0.32
  private val english =
    ("it is the kind of day that makes a walk to the shore feel right " +
      "and the tide is low so we go out to the rocks with a basket and " +
      "sit in the sun to eat and talk of it all").trim

  private def blocksOf(page: String) =
    TextExtractQueries.classifyBlocks(
      Seq((1L, page)).toDF("doc_id", "page"),
      TextExtractQueries.PUBLISHED_SW_LOW,
      TextExtractQueries.PUBLISHED_SW_HIGH)
      .collect()
      .map(r => r.getString(r.fieldIndex("text")) ->
        r.getString(r.fieldIndex("cls"))).toMap

  test("published thresholds: main English prose keeps, nav / link " +
      "sidebar / short footer drop, each for its own reason") {
    val page =
      "<html><body>" +
        "<div><a href=\"/\">home page</a> <a href=\"/a\">about us</a> " +
        "<a href=\"/c\">contact form</a></div>" +
        s"<p>$english</p>" +
        "<ul><li><a href=\"/r/1\">a related article about tides</a></li>" +
        "<li><a href=\"/r/2\">another piece on the shore</a></li></ul>" +
        "<div>copyright 2022 example org</div>" +
        "</body></html>"
    val m = blocksOf(page)
    assert(m(english) == "good", s"main block must be good: $m")
    val nav = m.keys.find(_.startsWith("home page")).get
    assert(m(nav) == "bad", "nav is all links: link density kills it " +
      "BEFORE any stop-word credit")
    val sidebar = m.keys.find(_.contains("related article")).get
    assert(m(sidebar) == "bad", "link sidebar: high link density")
    val footer = m.keys.find(_.startsWith("copyright")).get
    assert(m(footer) == "short", "footer: under LENGTH_LOW chars")
  }

  test("published thresholds: long link-free word soup is bad (no " +
      "stop-word evidence), near-threshold prose is neargood") {
    val soup = Seq.fill(40)("quantum flux manifold").mkString(" ")
    // 13 stops / 42 words = 0.3095: between low (0.30) and high
    // (0.32) → neargood
    val near = (Seq.fill(13)("the tide rose") :+ "salt wind blows")
      .mkString(" ")
    val m = blocksOf(s"<html><body><p>$soup</p><p>$near</p></body></html>")
    assert(m(soup) == "bad")
    assert(m(near) == "neargood",
      s"expected neargood for density 13/42=0.3095, got $m")
  }

  test("context-sensitive pass: neargood NEXT TO good promotes " +
      "(mixed neighbours), neargood between bads demotes, and the " +
      "gate fixture shows real promotions") {
    import org.apache.spark.sql.functions.col
    val df = TextExtractQueries.textExtractSmooth(spark, sf)
    // promotions exist: smoothing must keep MORE blocks than the
    // context-free good count somewhere, and fewer nowhere... the
    // only demotion path on the two-para page is neargood-between-
    // bads, which the cf count never included — so cs >= cf per doc
    assert(df.filter(col("n_kept_cs") < col("n_good_cf")).count() == 0)
    assert(df.filter(col("n_kept_cs") > col("n_good_cf")).count() > 0,
      "the two-paragraph page must produce real promotions")
    assert(df.filter(col("n_blocks") =!= 6).count() == 0)
  }

  test("gate fixture splits non-degenerately and yield < 1 everywhere " +
      "(boilerplate always dropped)") {
    val df = TextExtractQueries.textExtractMain(spark, sf)
    val n = df.count()
    val kept = df.filter(col("n_kept") > 0).count()
    assert(n > 0 && kept > 0 && kept < n, s"degenerate: $kept/$n")
    assert(df.filter(col("yield_ratio") >= 1.0).count() == 0,
      "nav/sidebar/footer must never survive the fixture card")
    assert(df.filter(col("n_blocks") =!= 5).count() == 0,
      "every synthetic page has exactly 5 non-empty blocks")
  }
}
