package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** pipeline_tokenize_pack: the properties the oracle gate can't state
  * — LOSSLESS reconstruction (the id stream decodes back to the exact
  * document text), kernel-twin parity (bpeTokensOf vs bpeTokenCount),
  * fixed-length layout invariants, and the staleness refusal
  * inherited from the tokenizer artifact. */
class TokenizePackSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = TextQueries.buildTokenizerModel(spark, sf)

  private def mergeList: Array[(String, String)] =
    spark.read.parquet(s"$root/merges")
      .select(col("round"), col("pair_a"), col("pair_b"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).map(t => (t._2, t._3))

  test("lossless: every document's id stream decodes back to its " +
      "exact text (EOS terminal, space ids as separators)") {
    val prodOf = mergeList.zipWithIndex
      .map { case ((pa, pb), i) =>
        (TextQueries.PACK_ID_BASE + i) -> (pa + pb) }.toMap
    val enc = TextQueries.packEncodeUdf(spark, root)
    val rows = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), enc(col("text")).as("ids"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getString(1)
      val ids = r.getSeq[Long](2)
      assert(ids.last == TextQueries.PACK_EOS_ID,
        s"doc ${r.getLong(0)}: stream must end with EOS")
      assert(ids.init.forall(_ != TextQueries.PACK_EOS_ID),
        "EOS only terminal")
      val sb = new java.lang.StringBuilder
      ids.foreach {
        case TextQueries.PACK_EOS_ID => ()
        case i if i < TextQueries.PACK_ID_BASE =>
          sb.appendCodePoint(i.toInt) // includes 32 -> ' '
        case i => sb.append(prodOf(i))
      }
      assert(sb.toString == text,
        s"doc ${r.getLong(0)} failed to reconstruct")
    }
  }

  test("kernel twins: bpeTokensOf length equals bpeTokenCount on " +
      "every fixture word, and tokens concatenate to the word") {
    val rank = mergeList.zipWithIndex
      .map { case ((pa, pb), i) => (pa + "" + pb) -> i }.toMap
    val words = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect()
    assert(words.length > 10)
    words.foreach { w =>
      val toks = TextQueries.bpeTokensOf(w, rank, "")
      assert(toks.length ==
        TextQueries.bpeTokenCount(w, rank, ""),
        s"twin drift on '$w'")
      assert(toks.mkString == w, s"tokens must concatenate to '$w'")
    }
  }

  test("layout: every non-final sequence in a stream is exactly " +
      "PACK_BUDGET ids; finals are non-empty") {
    val df = TextQueries.pipelineTokenizePack(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard"))
    val bad = df
      .withColumn("last_seq", max(col("seq_id")).over(w))
      .filter(
        (col("seq_id") < col("last_seq") &&
          col("n_tokens") =!= TextQueries.PACK_BUDGET) ||
          col("n_tokens") <= 0 ||
          col("n_tokens") > TextQueries.PACK_BUDGET)
      .count()
    assert(bad == 0)
    assert(df.count() > 0)
  }

  test("staleness: packing a regenerated corpus under the OLD " +
      "persisted tokenizer is refused") {
    val corpus = java.nio.file.Files
      .createTempDirectory("packcorpus").toString
    def write(texts: Seq[(Long, String)]): Unit =
      texts.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    write(Seq((1L, "abab abab cd"), (2L, "abab cd cd")))
    val modelRoot = java.nio.file.Files
      .createTempDirectory("packmodel").toString
    TextQueries.buildTokenizerModelAt(spark, corpus, modelRoot)
    // fresh: must pack fine
    assert(TextQueries
      .pipelineTokenizePackWith(spark, corpus, modelRoot).count() > 0)
    // regenerate the corpus in place -> the old artifact must refuse
    write(Seq((1L, "xyxy xyxy qq"), (2L, "xyxy qq qq"), (3L, "qq")))
    val e = intercept[IllegalArgumentException] {
      TextQueries.pipelineTokenizePackWith(spark, corpus, modelRoot)
        .count()
    }
    assert(e.getMessage.contains("STALE"))
  }

  test("packed-shard root is memoized per (corpus, model): a second " +
      "invocation replays the audit without rewriting the shards " +
      "(r16 advisory: no unregistered temp-dir leak per call)") {
    val first = TextQueries.pipelineTokenizePack(spark, sf)
      .orderBy("lang", "shard", "seq_id").collect()
    val before = MemoBuilds.count
    val second = TextQueries.pipelineTokenizePack(spark, sf)
      .orderBy("lang", "shard", "seq_id").collect()
    assert(!MemoBuilds.labelsSince(before).contains("tokpack_shards"),
      "second call must hit the memo, not rebuild the shards")
    assert(first.sameElements(second),
      "memo hit must serve the identical audit")
  }
}
