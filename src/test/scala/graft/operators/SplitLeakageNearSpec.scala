package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** pipeline_split_leakage_near pins: a planted PARAPHRASE leak (one
  * word changed — invisible to the exact content-hash audit) is
  * counted as a cross-split AND train↔eval near-dup pair; verbatim
  * copies inside one split contribute a pair but no leak; split
  * placement uses the engine's own published hashBucket rule. */
class SplitLeakageNearSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, lang, t) =>
      (id, lang, t, "src", t.length.toLong)
    }.toDF("doc_id", "lang", "text", "source", "n_chars")
  }

  private lazy val buckets: Map[Long, Long] =
    spark.range(0, 400)
      .select(col("id"), SampleQueries.hashBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  private def ids(p: Long => Boolean): Seq[Long] =
    buckets.collect { case (i, b) if p(b) => i }.toSeq.sorted

  test("a one-word paraphrase across train/test is a counted leak; " +
      "a verbatim copy within train is a pair but not a leak") {
    val trainIds = ids(_ < 980)
    val testIds = ids(_ >= 990)
    assert(trainIds.size >= 3 && testIds.nonEmpty,
      s"fixture id pool too small: ${trainIds.size}/${testIds.size}")
    val words = (1 to 60).map(i => s"w$i")
    val t = words.mkString(" ")
    val tNear = words.updated(29, "zzz").mkString(" ") // 1 word differs
    val c = (1 to 40).map(i => s"c$i").mkString(" ")
    val d = docs(
      (trainIds(0), "aa", t), // train original
      (testIds(0), "aa", tNear), // TEST near-copy — the leak
      (trainIds(1), "aa", c), // verbatim pair, both train
      (trainIds(2), "aa", c))
    val got = PipelineQueries.pipelineSplitLeakageNearFrom(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // jac(t, tNear) = 55/63 ≈ 0.873 ≥ 0.8 → verified near pair;
    // the c-copy collapses to a star edge (jac 1.0) within train
    assert(got == Map("aa" -> ((2L, 1L, 1L))),
      s"want {aa -> (2 pairs, 1 cross-split, 1 train↔eval)}, got $got")
  }

  test("the exact audit CANNOT see the paraphrase leak the near " +
      "audit counts — the two ledgers are complementary") {
    val trainIds = ids(_ < 980)
    val testIds = ids(_ >= 990)
    val words = (1 to 60).map(i => s"v$i")
    val d = docs(
      (trainIds(0), "bb", words.mkString(" ")),
      (testIds(0), "bb", words.updated(10, "qqq").mkString(" ")))
    val exact = PipelineQueries.pipelineSplitLeakageFrom(d).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(exact("bb") == 0L,
      "exact content hash must NOT flag a paraphrase")
    val near = PipelineQueries.pipelineSplitLeakageNearFrom(d).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(near("bb") == 1L, s"near audit must flag it: $near")
  }

  test("fixture smoke: integer ledger, cross-split ⊇ train↔eval, " +
      "pairs bound both") {
    val out = PipelineQueries
      .pipelineSplitLeakageNear(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (np, nc, nt) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(np >= nc && nc >= nt && nt >= 0,
        s"${r.getString(0)}: $np/$nc/$nt")
    }
  }
}
