package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** pipeline_dsir_select: the planted target-domain recovery the
  * oracle gate can't state (the gate pins determinism; THIS pins
  * that the importance weights actually point at the target), plus
  * budget and determinism invariants. */
class DsirSelectSpec extends SparkSpec {
  import spark.implicits._

  /** Target domain speaks vocabulary A; the raw pool is half A-like,
    * half B-like. DSIR's log-likelihood-ratio weights must
    * concentrate the budget draw on the A-like half. */
  private def plantedDocs = {
    val vocabA = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val vocabB = Seq("omega", "psi", "chi", "sigma", "tau")
    def doc(vocab: Seq[String], seed: Int): String =
      (0 until 30).map(j => vocab((seed * 7 + j * 3) % vocab.size))
        .mkString(" ")
    val rows =
      // 20 target docs (vocab A)
      (0 until 20).map(k =>
        (1000L + k, doc(vocabA, k), "tg", "tsrc")) ++
        // 15 A-like raw docs, 15 B-like raw docs
        (0 until 15).map(k => (2000L + k, doc(vocabA, k + 3), "ra", "rsrc")) ++
        (0 until 15).map(k => (3000L + k, doc(vocabB, k), "rb", "rsrc"))
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("planted recovery: the budget draw is exclusively the " +
      "target-like half of the raw pool") {
    // budget ≈ half the raw tokens: 30 raw docs × 30 tokens = 900;
    // 400 selects ~13 docs — all must come from the A-like half
    val sel = PipelineQueries
      .pipelineDsirSelectFrom(plantedDocs, col("lang") === "tg",
        budget = 400L)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect()
    assert(sel.nonEmpty, "budget draw must select something")
    assert(sel.forall(_._2 == "ra"),
      s"every selected doc must be target-like, got ${sel.toSeq}")
    // and the target split itself is never selected (weights are
    // over the RAW pool only)
    assert(sel.forall(_._1 >= 2000L))
  }

  test("anti-recovery symmetry: flipping the target flips the draw") {
    val sel = PipelineQueries
      .pipelineDsirSelectFrom(plantedDocs,
        col("lang") === "tg" || col("lang") === "ra", budget = 400L)
      .select(col("lang")).as[String].collect()
    // raw pool is now ONLY the B-like docs — selection must be rb
    assert(sel.nonEmpty && sel.forall(_ == "rb"))
  }

  test("budget invariant: cumulative tokens of the draw overshoot " +
      "the budget by at most one document") {
    val rows = PipelineQueries.pipelineDsirSelect(spark, sf)
      .select(col("n_tok")).as[Long].collect()
    val total = rows.sum
    assert(total >= math.min(PipelineQueries.DSIR_BUDGET, 1L),
      "draw must reach the budget when tokens are available")
    assert(total - rows.max < PipelineQueries.DSIR_BUDGET,
      s"removing the last doc must land under budget: total=$total")
  }

  test("determinism: the draw is identical under repartitioning") {
    val docs = graft.Tables.documents(spark, sf)
    val a = PipelineQueries
      .pipelineDsirSelectFrom(docs, col("lang") === "en")
      .orderBy("doc_id").collect()
    val b = PipelineQueries
      .pipelineDsirSelectFrom(docs.repartition(13), col("lang") === "en")
      .orderBy("doc_id").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }
}
