package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** text_substring_dedup_global pins — hand-computed excisions on
  * planted corpora: cross-doc repeated passages excised everywhere
  * but the global (doc_id, pos) keeper, WITHIN-doc repeats kept (the
  * rule is cross-document), run coalescing at the exact
  * adjacent-vs-gapped boundary, sub-window docs untouched, and the
  * whole-doc-excised empty edge. */
class SubstringDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, "en", t, "src", t.length.toLong) }
      .toDF("doc_id", "lang", "text", "source", "n_chars")
  }

  private def run(d: DataFrame): Map[Long, (String, Long, Long, Long)] =
    DedupQueries.textSubstringDedupGlobalFrom(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a 12-token passage shared by two docs is excised from the " +
      "later doc only; within-doc repeats and short docs untouched") {
    val p = toks("p", 12)
    val r10 = toks("r", 10)
    val d = docs(
      1L -> s"$p ${toks("a", 5)}", // global keeper: P at (1, 0)
      5L -> s"${toks("b", 3)} $p ${toks("c", 2)}", // P at pos 3..14
      7L -> s"$r10 x $r10", // repeated 10-gram, ONE doc — kept
      9L -> toks("s", 5)) // 5 tokens < K: no grams at all
    val got = run(d)
    assert(got.keySet == Set(1L, 5L, 7L, 9L))
    // doc 1 is the winner for every shared window: untouched
    assert(got(1L) == ((s"$p ${toks("a", 5)}", 17L, 0L, 0L)), got(1L))
    // doc 5: the passage's 3 window starts (3, 4, 5) coalesce into
    // ONE run [3, 14] — 12 tokens out, neighbors reassembled
    assert(got(5L) == (("b1 b2 b3 c1 c2", 5L, 12L, 1L)), got(5L))
    assert(got(7L) == ((s"$r10 x $r10", 21L, 0L, 0L)), got(7L))
    assert(got(9L) == ((toks("s", 5), 5L, 0L, 0L)), got(9L))
  }

  test("run coalescing boundary: a one-token gap keeps two runs, " +
      "direct adjacency merges to one (and can empty a doc)") {
    val q1 = toks("q", 10)
    val z2 = toks("z", 10)
    val d = docs(
      1L -> q1, // winner for Q1
      2L -> z2, // winner for Q2
      50L -> s"$q1 g $z2", // starts {0, 11}: 11 > 9 + 1 → TWO runs
      60L -> s"$q1 $z2") // starts {0, 10}: 10 ≤ 9 + 1 → ONE run
    val got = run(d)
    assert(got(1L) == ((q1, 10L, 0L, 0L)))
    assert(got(2L) == ((z2, 10L, 0L, 0L)))
    assert(got(50L) == (("g", 1L, 20L, 2L)), got(50L))
    // every token excised: the reassembly is the EMPTY string
    assert(got(60L) == (("", 0L, 20L, 1L)), got(60L))
  }

  test("three-way repeat: one keeper globally, both later copies " +
      "excised — not one keeper per pair") {
    val p = toks("w", 10)
    val d = docs(
      3L -> s"${toks("x", 2)} $p", // P at (3, 2) — global keeper
      8L -> s"$p ${toks("y", 2)}", // P at (8, 0) — excised
      12L -> s"${toks("v", 1)} $p ${toks("u", 1)}") // (12, 1) — excised
    val got = run(d)
    assert(got(3L) == ((s"${toks("x", 2)} $p", 12L, 0L, 0L)), got(3L))
    assert(got(8L) == ((toks("y", 2), 2L, 10L, 1L)), got(8L))
    assert(got(12L) == (("v1 u1", 2L, 10L, 1L)), got(12L))
  }

  test("fixture smoke: one row per document, token accounting adds " +
      "up, and reassembly only ever removes tokens") {
    val d = graft.Tables.documents(spark, sf)
    val out = DedupQueries.textSubstringDedupGlobal(spark, sf).collect()
    assert(out.length == d.count())
    out.foreach { r =>
      val (kept, removed, runs) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(kept >= 0 && removed >= 0 && runs >= 0)
      assert(removed == 0 == (runs == 0))
      val rebuilt = r.getString(1)
      val nOut =
        if (rebuilt.isEmpty) 0 else rebuilt.split(" ", -1).length
      assert(nOut == kept, s"doc ${r.getLong(0)}: $nOut != $kept")
    }
  }
}
