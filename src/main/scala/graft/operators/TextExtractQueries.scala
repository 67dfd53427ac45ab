package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** text_extract_main — block-level main-content extraction (VERDICT
  * r15 task 2): the jusText/RefinedWeb yield lever that text_html_strip
  * lacks. A flat tag strip keeps nav, link sidebars, and footers, and
  * that boilerplate then pollutes every downstream quality gate; the
  * published fix (jusText, Pomikálek 2011; trafilatura/RefinedWeb use
  * the same shape) blocks the page at block-level tags and classifies
  * each block CONTEXT-FREE by link density, length, and stop-word
  * density, keeping only content-like blocks.
  *
  * Implemented classification (jusText's context-free pass; the
  * context-sensitive neighbour-smoothing pass is omitted — the card
  * here classifies 5-block synthetic pages where smoothing is a no-op
  * by construction):
  *   bad       if link_density > 0.2          (MAX_LINK_DENSITY)
  *   short     if n_chars < 70                (LENGTH_LOW)
  *   good      if stop_density >= swHigh
  *   neargood  if stop_density >= swLow
  *   bad       otherwise
  * keep = good | neargood. The PUBLISHED stop-density thresholds are
  * 0.30/0.32 (English prose; exercised on planted English pages in
  * TextExtractSpec); the GATE instance runs 0.04/0.06 because the
  * synthetic fixture is uniform word soup whose stop-word density has
  * median 0.061 (measured at sf0.01) — the published values would
  * classify every fixture block bad, a degenerate all-drop card (the
  * exact vacuous-verdict hazard the Gopher stop gate documented).
  *
  * Scale shape: one narrow generate (posexplode of per-page blocks) +
  * one hash re-aggregate back to doc_id — no window, no join; block
  * texts are page-bounded so the explode fans each row by a small
  * constant. Every density is an integer-count ratio both engines
  * compute from the same ints, so thresholds can't land between
  * engines. */
object TextExtractQueries {

  private[operators] val MAX_LINK_DENSITY = 0.2
  private[operators] val LENGTH_LOW = 70
  /** jusText's published English stop-density thresholds. */
  private[operators] val PUBLISHED_SW_LOW = 0.30
  private[operators] val PUBLISHED_SW_HIGH = 0.32
  /** Fixture-calibrated analogs (see scaladoc). */
  private[operators] val FIXTURE_SW_LOW = 0.04
  private[operators] val FIXTURE_SW_HIGH = 0.06

  /** Function-word list for the stop-density signal (the head of the
    * published English stoplist; the same 10 both engines replay). */
  private[operators] val EXTRACT_STOPS = Seq(
    "the", "a", "of", "and", "to", "in", "is", "that", "it", "with")

  /** The `<p>` block of the WARC body as the extract splitter sees
    * it, full-strip replayed (tags, entities, collapse) — the oracle
    * form of the main block in pipeline_warc_extract. */
  private[operators] def htmlStripOfParagraphTail: String =
    TextQueries.htmlStripSqlExpr(
      "('<p>' || text || ' &amp; more &lt;escaped&gt; " +
        "&quot;text&quot;&nbsp;here</p></body></html>')")

  /** The context-free classifier as a SQL CASE over a block-text
    * column (link density handled by the caller when anchors exist —
    * over anchor-free text it reduces to the length + stop-density
    * arms). Shared by pipeline_warc_extract's oracle so the rule
    * arithmetic is spelled once. */
  private[operators] def classifySqlExpr(
      bt: String, swLow: Double, swHigh: Double): String = {
    val stops = EXTRACT_STOPS.map(w => s"'$w'").mkString(",")
    s"""CASE
       |      WHEN len($bt) < $LENGTH_LOW THEN 'short'
       |      WHEN CAST(len(list_filter(string_split(lower($bt), ' '),
       |        w -> w IN ($stops))) AS DOUBLE)
       |        / len(string_split(lower($bt), ' ')) >= $swHigh
       |        THEN 'good'
       |      WHEN CAST(len(list_filter(string_split(lower($bt), ' '),
       |        w -> w IN ($stops))) AS DOUBLE)
       |        / len(string_split(lower($bt), ' ')) >= $swLow
       |        THEN 'neargood'
       |      ELSE 'bad'
       |    END""".stripMargin
  }

  /** The synthetic 5-block page: nav links, heading, the document
    * text as the main paragraph, a link sidebar, a short footer —
    * each block shaped to trip exactly one classification axis.
    * MUST stay byte-identical to the SQL replay below. */
  private def pageCol: Column = concat(
    lit("<html><body><div><a href=\"/\">home</a> " +
      "<a href=\"/about\">about</a> <a href=\"/contact\">contact</a>" +
      "</div><h1>Doc "),
    col("doc_id"),
    lit("</h1><p>"), col("text"),
    lit("</p><ul><li><a href=\"/r/1\">related article one</a></li>" +
      "<li><a href=\"/r/2\">related article two</a></li></ul>" +
      "<div>copyright 2022 example org all rights reserved</div>" +
      "</body></html>"))

  private val BLOCK_SPLIT_RE = "(<(?:p|div|ul|h1)[^>]*>)"
  private val ANCHOR_RE = "<a [^>]*>([^<]*)</a>"

  /** Per-block classification over any (doc_id, page) frame —
    * parameterized thresholds so the spec exercises the PUBLISHED
    * values on planted English pages. Returns one row per non-empty
    * block: (doc_id, idx, text, n_chars, n_words, link_density,
    * stop_density, cls, keep). */
  private[operators] def classifyBlocks(
      pages: DataFrame, swLow: Double, swHigh: Double): DataFrame = {
    val stopsLit = typedLit(EXTRACT_STOPS)
    pages
      .select(col("doc_id"),
        posexplode(split(
          regexp_replace(col("page"), BLOCK_SPLIT_RE, "\u0001$1"),
          "\u0001")).as(Seq("idx", "raw")))
      .withColumn("text", TextQueries.htmlStripCol(col("raw")))
      .filter(length(col("text")) > 0)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lws", split(lower(col("text")), " "))
      .withColumn("n_words", size(col("lws")).cast("long"))
      .withColumn("linked",
        aggregate(
          transform(
            regexp_extract_all(col("raw"), lit(ANCHOR_RE), lit(1)),
            a => length(a).cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double"))
      // greatest(.., 1): the empty blocks are filtered out above, but
      // Catalyst pushes the downstream `keep` predicate THROUGH this
      // projection and may evaluate the division before the length
      // guard in the combined conjunction — under ANSI that's a
      // DIVIDE_BY_ZERO on the very rows the filter exists to drop.
      // Values are unchanged for every surviving row (n_chars ≥ 1).
      .withColumn("link_density",
        col("linked") / greatest(col("n_chars"), lit(1L)))
      .withColumn("stop_density",
        size(filter(col("lws"), w => array_contains(stopsLit, w)))
          .cast("double") / greatest(col("n_words"), lit(1L)))
      .withColumn("cls",
        when(col("link_density") > MAX_LINK_DENSITY, "bad")
          .when(col("n_chars") < LENGTH_LOW, "short")
          .when(col("stop_density") >= swHigh, "good")
          .when(col("stop_density") >= swLow, "neargood")
          .otherwise("bad"))
      .withColumn("keep", col("cls") === "good" || col("cls") === "neargood")
      .drop("raw", "lws", "linked")
  }

  /** text_extract_main — per document: blocks seen, blocks kept, the
    * extracted main text, and the yield vs the flat strip (the column
    * that shows WHY this stage exists: boilerplate chars the flat
    * strip would have kept). n_strip_chars equals
    * len(text_html_strip of the whole page) because the strip
    * collapses inter-block tags to single spaces — proven by the
    * all-blocks join below. */
  def textExtractMain(s: SparkSession, dir: String): DataFrame = {
    val pages = documents(s, dir).select(col("doc_id"), pageCol.as("page"))
    classifyBlocks(pages, FIXTURE_SW_LOW, FIXTURE_SW_HIGH)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("idx"), col("text"))))),
            x => x.getField("text")), " ").as("main_text"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("idx"), col("text")))),
            x => x.getField("text")), " ").as("all_text"))
      .select(col("doc_id"), col("n_blocks"), col("n_kept"),
        col("main_text"),
        length(col("main_text")).cast("long").as("n_main_chars"),
        length(col("all_text")).cast("long").as("n_strip_chars"),
        round(length(col("main_text")).cast("double") /
          length(col("all_text")) + lit(1e-9), 4).as("yield_ratio"))
  }

  /** text_extract_smooth — jusText's CONTEXT-SENSITIVE second pass
    * (the part text_extract_main's scaladoc declared omitted):
    * context-free `good`/`bad` verdicts stay; every `short`/
    * `neargood` block is re-classified from its nearest SURE
    * neighbours (the closest good-or-bad block above and below,
    * page edges counting as bad):
    *   both neighbours good → good; both bad → bad;
    *   mixed → neargood promotes to good, short demotes to bad.
    * The FINAL keep is `good` only — the published pipeline's output
    * class. On the synthetic page this demotes headings trapped
    * between boilerplate and promotes/demotes the main paragraph by
    * its neighbours, so the per-doc yield differs measurably from
    * the context-free card (both counts reported side by side).
    *
    * Scale shape: the context-free stage plus two per-doc windows
    * over ≤5-block partitions (running last-sure up and down) — the
    * window state is one string per direction, partitions are
    * page-bounded. */
  /** The smooth qid's page splits the document into TWO adjacent
    * paragraphs (first half of the words, then the rest) — the shape
    * where the context pass actually changes verdicts: a neargood
    * second paragraph NEXT TO a good first one promotes (mixed
    * neighbours), while on the single-paragraph page every
    * short/neargood block sits between two bads and smoothing is a
    * no-op (measured: 0 of 500 docs differed — the vacuous-verdict
    * hazard again). */
  private def pageTwoParaCol: Column = {
    val ws = split(col("text"), " ")
    // cast to INT: Spark's `/` on ints yields DOUBLE (32.5), and
    // slice ROUNDS a fractional start index — the oracle's `//` is
    // floor division, so one word silently switched paragraphs on
    // odd-length docs until the explicit truncation
    val half = ((size(ws) + 1) / 2).cast("int")
    val p1 = array_join(slice(ws, lit(1), half), " ")
    val p2 = array_join(
      slice(ws, half + 1, greatest(size(ws) - half, lit(0))), " ")
    concat(
      lit("<html><body><div><a href=\"/\">home</a> " +
        "<a href=\"/about\">about</a> <a href=\"/contact\">contact</a>" +
        "</div><h1>Doc "),
      col("doc_id"),
      lit("</h1><p>"), p1, lit("</p><p>"), p2,
      lit("</p><ul><li><a href=\"/r/1\">related article one</a></li>" +
        "<li><a href=\"/r/2\">related article two</a></li></ul>" +
        "<div>copyright 2022 example org all rights reserved</div>" +
        "</body></html>"))
  }

  def textExtractSmooth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pages = documents(s, dir)
      .select(col("doc_id"), pageTwoParaCol.as("page"))
    val cf = classifyBlocks(pages, FIXTURE_SW_LOW, FIXTURE_SW_HIGH)
      .withColumn("sure",
        when(col("cls") === "good" || col("cls") === "bad", col("cls")))
    val up = Window.partitionBy(col("doc_id")).orderBy(col("idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dn = Window.partitionBy(col("doc_id")).orderBy(col("idx").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    cf
      .withColumn("prev_sure",
        coalesce(last(col("sure"), ignoreNulls = true).over(up),
          lit("bad")))
      .withColumn("next_sure",
        coalesce(last(col("sure"), ignoreNulls = true).over(dn),
          lit("bad")))
      .withColumn("cs",
        when(col("cls") === "good" || col("cls") === "bad", col("cls"))
          .when(col("prev_sure") === col("next_sure"), col("prev_sure"))
          .when(col("cls") === "neargood", "good")
          .otherwise("bad"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum((col("cls") === "good").cast("long")).as("n_good_cf"),
        sum((col("cs") === "good").cast("long")).as("n_kept_cs"),
        sum(when(col("cs") === "good", col("n_chars")).otherwise(0L))
          .as("cs_chars"))
  }

  val textExtractSmoothSql: String = {
    val stops = EXTRACT_STOPS.map(w => s"'$w'").mkString(",")
    s"""WITH halves AS (
       |  SELECT doc_id,
       |    array_to_string(list_slice(ws, 1, (len(ws) + 1) // 2), ' ')
       |      AS p1,
       |    array_to_string(list_slice(ws, (len(ws) + 1) // 2 + 1,
       |      len(ws)), ' ') AS p2
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
       |        FROM documents)),
       |page AS (
       |  SELECT doc_id,
       |    '<html><body><div><a href="/">home</a> '
       |    || '<a href="/about">about</a> <a href="/contact">contact</a>'
       |    || '</div><h1>Doc ' || doc_id || '</h1><p>' || p1
       |    || '</p><p>' || p2
       |    || '</p><ul><li><a href="/r/1">related article one</a></li>'
       |    || '<li><a href="/r/2">related article two</a></li></ul>'
       |    || '<div>copyright 2022 example org all rights reserved</div>'
       |    || '</body></html>' AS h
       |  FROM halves),
       |parts AS (
       |  SELECT doc_id, string_split(regexp_replace(h,
       |    '(<(?:p|div|ul|h1)[^>]*>)', chr(1) || '\\1', 'g'), chr(1))
       |    AS ps
       |  FROM page),
       |blk AS (
       |  SELECT doc_id, g.i AS idx, ps[g.i] AS raw
       |  FROM parts, unnest(generate_series(1, len(ps))) AS g(i)),
       |txt AS (
       |  SELECT doc_id, idx,
       |    ${TextQueries.htmlStripSqlExpr("raw")} AS text,
       |    regexp_extract_all(raw, '$ANCHOR_RE', 1) AS anchors
       |  FROM blk),
       |sc AS (
       |  SELECT doc_id, idx, text,
       |    len(text) AS n_chars,
       |    len(string_split(lower(text), ' ')) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(anchors,
       |      a -> len(a))), 0) AS DOUBLE) AS linked,
       |    string_split(lower(text), ' ') AS lws
       |  FROM txt WHERE len(text) > 0),
       |cls AS (
       |  SELECT doc_id, idx, n_chars,
       |    CASE
       |      WHEN linked / n_chars > $MAX_LINK_DENSITY THEN 'bad'
       |      WHEN n_chars < $LENGTH_LOW THEN 'short'
       |      WHEN CAST(len(list_filter(lws, w -> w IN ($stops)))
       |        AS DOUBLE) / n_words >= $FIXTURE_SW_HIGH THEN 'good'
       |      WHEN CAST(len(list_filter(lws, w -> w IN ($stops)))
       |        AS DOUBLE) / n_words >= $FIXTURE_SW_LOW THEN 'neargood'
       |      ELSE 'bad'
       |    END AS cls
       |  FROM sc),
       |sure AS (
       |  SELECT doc_id, idx, n_chars, cls,
       |    CASE WHEN cls IN ('good', 'bad') THEN cls END AS s
       |  FROM cls),
       |ctx AS (
       |  SELECT doc_id, idx, n_chars, cls,
       |    coalesce(last_value(s IGNORE NULLS) OVER (
       |      PARTITION BY doc_id ORDER BY idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'bad')
       |      AS prev_sure,
       |    coalesce(last_value(s IGNORE NULLS) OVER (
       |      PARTITION BY doc_id ORDER BY idx DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 'bad')
       |      AS next_sure
       |  FROM sure),
       |fin AS (
       |  SELECT doc_id, n_chars, cls,
       |    CASE
       |      WHEN cls IN ('good', 'bad') THEN cls
       |      WHEN prev_sure = next_sure THEN prev_sure
       |      WHEN cls = 'neargood' THEN 'good'
       |      ELSE 'bad'
       |    END AS cs
       |  FROM ctx)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_blocks,
       |  CAST(sum(CASE WHEN cls = 'good' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_good_cf,
       |  CAST(sum(CASE WHEN cs = 'good' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept_cs,
       |  CAST(sum(CASE WHEN cs = 'good' THEN n_chars ELSE 0 END)
       |    AS BIGINT) AS cs_chars
       |FROM fin GROUP BY doc_id""".stripMargin
  }

  val textExtractMainSql: String = {
    val stops = EXTRACT_STOPS.map(w => s"'$w'").mkString(",")
    s"""WITH page AS (
       |  SELECT doc_id,
       |    '<html><body><div><a href="/">home</a> '
       |    || '<a href="/about">about</a> <a href="/contact">contact</a>'
       |    || '</div><h1>Doc ' || doc_id || '</h1><p>' || text
       |    || '</p><ul><li><a href="/r/1">related article one</a></li>'
       |    || '<li><a href="/r/2">related article two</a></li></ul>'
       |    || '<div>copyright 2022 example org all rights reserved</div>'
       |    || '</body></html>' AS h
       |  FROM documents),
       |parts AS (
       |  SELECT doc_id, string_split(regexp_replace(h,
       |    '(<(?:p|div|ul|h1)[^>]*>)', chr(1) || '\\1', 'g'), chr(1))
       |    AS ps
       |  FROM page),
       |blk AS (
       |  SELECT doc_id, g.i AS idx, ps[g.i] AS raw
       |  FROM parts, unnest(generate_series(1, len(ps))) AS g(i)),
       |txt AS (
       |  SELECT doc_id, idx,
       |    ${TextQueries.htmlStripSqlExpr("raw")} AS text,
       |    regexp_extract_all(raw, '$ANCHOR_RE', 1) AS anchors
       |  FROM blk),
       |sc AS (
       |  SELECT doc_id, idx, text,
       |    len(text) AS n_chars,
       |    len(string_split(lower(text), ' ')) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(anchors,
       |      a -> len(a))), 0) AS DOUBLE) AS linked,
       |    string_split(lower(text), ' ') AS lws
       |  FROM txt WHERE len(text) > 0),
       |cls AS (
       |  SELECT doc_id, idx, text, n_chars,
       |    CASE
       |      WHEN linked / n_chars > $MAX_LINK_DENSITY THEN 'bad'
       |      WHEN n_chars < $LENGTH_LOW THEN 'short'
       |      WHEN CAST(len(list_filter(lws, w -> w IN ($stops)))
       |        AS DOUBLE) / n_words >= $FIXTURE_SW_HIGH THEN 'good'
       |      WHEN CAST(len(list_filter(lws, w -> w IN ($stops)))
       |        AS DOUBLE) / n_words >= $FIXTURE_SW_LOW THEN 'neargood'
       |      ELSE 'bad'
       |    END AS cls
       |  FROM sc),
       |agg AS (
       |  SELECT doc_id,
       |    CAST(count(*) AS BIGINT) AS n_blocks,
       |    CAST(count(*) FILTER (WHERE cls IN ('good', 'neargood'))
       |      AS BIGINT) AS n_kept,
       |    coalesce(string_agg(text, ' ' ORDER BY idx)
       |      FILTER (WHERE cls IN ('good', 'neargood')), '') AS main_text,
       |    string_agg(text, ' ' ORDER BY idx) AS all_text
       |  FROM cls GROUP BY doc_id)
       |SELECT doc_id, n_blocks, n_kept, main_text,
       |  CAST(len(main_text) AS BIGINT) AS n_main_chars,
       |  CAST(len(all_text) AS BIGINT) AS n_strip_chars,
       |  round(CAST(len(main_text) AS DOUBLE) / len(all_text) + 1e-9, 4)
       |    AS yield_ratio
       |FROM agg""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_extract_main" -> (textExtractMain _),
    "text_extract_smooth" -> (textExtractSmooth _)
  )

  def oracle: Map[String, String] = Map(
    "text_extract_main" -> textExtractMainSql,
    "text_extract_smooth" -> textExtractSmoothSql
  )
}
