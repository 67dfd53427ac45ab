package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** text_unigram_train / text_unigram_encode: the SentencePiece-style
  * unigram-LM tokenizer (Viterbi hard-EM, product-space scoring).
  * Pins (1) a hand-checkable planted corpus (the same one the oracle
  * was dry-run against), (2) bit-parity between the driver-local and
  * distributed EM paths, (3) the Viterbi kernel's argmax and
  * first-i tie rule, (4) the WMAX training-exclusion / encode
  * code-point fallback contract, (5) astral-safe code-point
  * addressing, and (6) fixture-facing qid shapes. */
class UnigramTrainSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("planted corpus learns whole-word pieces (matches the oracle " +
      "dry-run): ab=3, abc=1, bc=1, singles 0") {
    val m = TextQueries.unigramTrainFrom(
      docs(Seq("ab ab abc", "bc ab"))).toMap
    assert(m("ab") == 3L && m("abc") == 1L && m("bc") == 1L)
    assert(m("a") == 0L && m("b") == 0L && m("c") == 0L)
    // full seed vocabulary kept alive through smoothing, at count 0
    assert(m.size == 6, s"seed vocab: ${m.keySet}") // a b c ab bc abc
  }

  test("driver-local EM == distributed EM, bit-for-bit, on a corpus " +
      "with multi-round movement") {
    val d = docs(Seq(
      "tokenize tokenize token ization", "token token izer tokenizer",
      "spark sparkly spark park", "lark spar parking"))
    val viaDriver = TextQueries.unigramTrainFrom(d).sortBy(_._1)
    val viaDist = TextQueries.unigramTrainFrom(d, driverMax = 0L)
      .sortBy(_._1)
    assert(viaDriver.toSeq == viaDist.toSeq,
      "the two EM paths must produce identical final counts")
  }

  test("Viterbi kernel: frequent long piece beats its character " +
      "split; strict-> keeps the FIRST (longest-piece) candidate on " +
      "an exact tie") {
    val counts = Map("ab" -> 100L, "a" -> 3L, "b" -> 3L)
    val path = TextQueries.unigramViterbiPath(
      Array("a", "b"), p => counts.getOrElse(p, 0L), 1000.0)
    assert(path == List("ab"), s"got $path")
    // exact tie: prob(aa) == prob(a)^2 when (c_aa+1)/d == ((c_a+1)/d)^2
    // -> c_aa+1 = (c_a+1)^2/d; pick d = 4, c_a = 1, c_aa = 0:
    // (0+1)/4 = 0.25; (1+1)/4 = 0.5, 0.5*0.5 = 0.25 — bit-equal.
    val tie = TextQueries.unigramViterbiPath(
      Array("a", "a"), Map("a" -> 1L, "aa" -> 0L).withDefaultValue(0L),
      4.0)
    assert(tie == List("aa"),
      s"tie must keep the first candidate (i=0, the longest piece): $tie")
  }

  test("words over UNIGRAM_WMAX code points are excluded from " +
      "training and encode as code points") {
    val long = "x" * (TextQueries.UNIGRAM_WMAX + 8)
    val base = Seq("ab ab abc", "bc ab")
    val mBase = TextQueries.unigramTrainFrom(docs(base)).sortBy(_._1)
    val mLong = TextQueries.unigramTrainFrom(
      docs(base :+ s"ab $long")).sortBy(_._1)
    // the long word contributes nothing; the extra 'ab' does
    assert(mLong.toMap.apply("ab") == mBase.toMap.apply("ab") + 1)
    assert(!mLong.exists(_._1.contains("x")),
      "no substring of the excluded word may enter the seed vocabulary")
  }

  test("astral input: pieces stay whole code points (no lone " +
      "surrogates)") {
    val g = new String(Character.toChars(0x1D11E)) // 𝄞
    val m = TextQueries.unigramTrainFrom(docs(Seq(s"${g}ab ${g}ab ab")))
    m.foreach { case (p, _) =>
      val cps = p.codePoints().toArray
      assert(cps.map(cp => new String(Character.toChars(cp))).mkString == p,
        s"piece $p is not a whole-code-point string")
    }
    assert(m.toMap.apply(s"${g}ab") == 2L,
      "the 3-code-point word must be learnable as one piece")
  }

  test("tokenizer fertility card: one row per lang, fertilities >= 1, " +
      "winner matches the integer comparison") {
    val rows = TextQueries.textTokenizerFertility(spark, sf).collect()
    assert(rows.length == 5, s"5 fixture langs, got ${rows.length}")
    rows.foreach { r =>
      val (nw, nb, nu) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nb >= nw && nu >= nw,
        "every word is at least one token under both tokenizers")
      val want =
        if (nu < nb) "unigram" else if (nb < nu) "bpe" else "tie"
      assert(r.getString(6) == want, s"winner mismatch on $r")
      assert(r.getDouble(4) >= 1.0 && r.getDouble(5) >= 1.0)
    }
  }

  test("qid shapes on the fixture: 32 ranked vocab rows in " +
      "(cnt DESC, piece ASC) order; encode covers every lang with " +
      "n_tokens >= n_words") {
    val vocab = TextQueries.textUnigramTrain(spark, sf).collect()
    assert(vocab.length == 32)
    val ranked = vocab.sortBy(_.getInt(0))
    ranked.sliding(2).foreach { case Array(a, b) =>
      val (ca, cb) = (a.getLong(2), b.getLong(2))
      assert(ca > cb || (ca == cb && a.getString(1) < b.getString(1)),
        s"rank order broken at ${a.getString(1)} -> ${b.getString(1)}")
    }
    val enc = TextQueries.textUnigramEncode(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = graft.Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long")
        .as("nw"))
      .groupBy(col("lang")).agg(sum(col("nw")).as("nw")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enc.keySet == words.keySet)
    enc.foreach { case (lang, t) =>
      assert(t >= words(lang),
        s"$lang: $t tokens < ${words(lang)} words — every word is >= 1 piece")
    }
  }
}
