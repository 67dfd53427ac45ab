package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** snk_tokenizer_model: the persisted tokenizer artifact. Pins the
  * deployment contract — durable build + manifest-verified reopen,
  * artifact round-trip equal to the training memos, staleness
  * REFUSAL after in-place corpus regeneration (with the deliberate
  * archive-replay escape), constant-mismatch refusal, and the
  * manifest-lands-last completion marker. */
class TokenizerModelSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, text) =>
      (id, text, "en", "src", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("durable build + reopen: artifacts round-trip the training " +
      "memos bit-for-bit") {
    val corpus = java.nio.file.Files
      .createTempDirectory("tokcorpus").toString
    writeDocs(corpus, Seq((1L, "abab abab cd"), (2L, "abab cd cd")))
    val root = java.nio.file.Files
      .createTempDirectory("tokroot").toString
    TextQueries.buildTokenizerModelAt(spark, corpus, root)
    // reopen with the freshness expectation — same corpus, must pass
    TextQueries.openTokenizerModel(spark, root, Some(corpus))
    val merges = spark.read.parquet(s"$root/merges")
      .orderBy(col("round")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val viaQid = TextQueries.textBpeTrain(spark, corpus)
      .orderBy(col("round")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == viaQid.toSeq, "persisted merges must equal " +
      "the trainer's list")
    val uni = spark.read.parquet(s"$root/unigram").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    val viaMemo = TextQueries.unigramTrainFrom(
      graft.Tables.documents(spark, corpus)).sortBy(_._1).toSeq
    assert(uni == viaMemo, "persisted vocabulary must equal the EM result")
  }

  test("staleness: in-place corpus regeneration is REFUSED under the " +
      "freshness expectation; archive replay (None) still opens") {
    val corpus = java.nio.file.Files
      .createTempDirectory("tokcorpus2").toString
    writeDocs(corpus, Seq((1L, "abab abab cd")))
    val root = java.nio.file.Files
      .createTempDirectory("tokroot2").toString
    TextQueries.buildTokenizerModelAt(spark, corpus, root)
    writeDocs(corpus, Seq((1L, "xyxy xyxy zz"), (2L, "xy zz")))
    val e = intercept[IllegalArgumentException] {
      TextQueries.openTokenizerModel(spark, root, Some(corpus))
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // deliberate archive replay stays possible
    TextQueries.openTokenizerModel(spark, root, None)
  }

  test("constant mismatch and missing manifest are refused") {
    val corpus = java.nio.file.Files
      .createTempDirectory("tokcorpus3").toString
    writeDocs(corpus, Seq((1L, "ab ab")))
    val root = java.nio.file.Files
      .createTempDirectory("tokroot3").toString
    TextQueries.buildTokenizerModelAt(spark, corpus, root)
    // tamper: a model trained under other constants must not serve
    IndexManifest.write(root, "tokenizer", Map(
      "bpe_rounds" -> "16", "unigram_rounds" -> "4",
      "unigram_pmax" -> "8", "unigram_wmax" -> "32",
      "corpus_fingerprint" -> "x"))
    val e = intercept[IllegalArgumentException] {
      TextQueries.openTokenizerModel(spark, root, None)
    }
    assert(e.getMessage.contains("unigram_pmax"), e.getMessage)
    val empty = java.nio.file.Files
      .createTempDirectory("tokempty").toString
    intercept[IllegalArgumentException] {
      TextQueries.openTokenizerModel(spark, empty, None)
    }
  }

  test("qid shape: the four audit counters are positive and " +
      "mutually consistent on the fixture") {
    val r = TextQueries.snkTokenizerModel(spark, sf).collect()(0)
    val (nm, mct, np, pct) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nm == 16L, s"16 merge rounds on the fixture, got $nm")
    assert(mct > 0L && np > 0L && pct > 0L)
    assert(np >= 32L, "seed vocabulary is at least the output cut")
  }
}
