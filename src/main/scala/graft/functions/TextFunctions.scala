package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Text-pipeline primitives (SURVEY.md §2.11): tokenization, shingling,
  * MinHash signatures, SimHash, winnowing fingerprints, language ID.
  *
  * Everything on the hot path (tokens, shingles, MinHash) is pure
  * Column expressions — codegen-friendly, no serialization. The
  * bit-twiddling ops (SimHash, winnowing, langid) are Scala UDFs over
  * already-tokenized arrays: they do O(tokens) work per row and have
  * no expression-level equivalent; at 100 TB they remain per-row local
  * (no shuffle contribution).
  */
object TextFunctions {

  /** Whitespace tokenization (documents.text is space-separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token counting: alpha runs, digit runs, single symbols.
    * Mirrors a byte-pair pre-tokenizer's coarse segmentation. */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Scala-stdlib murmur3 stringHash re-derived over CODE POINTS
    * instead of UTF-16 units (same seed, pair mix, mixLast, length
    * finalize): the DuckDB oracle recomputes the kernel with
    * `unicode(substr(...))`, which is code-point addressed, so the
    * UTF-16 original would diverge on any astral character. Identical
    * to MurmurHash3.stringHash on BMP-only text. */
  private[graft] def murmur3TokenHash(t: String): Int = {
    import java.lang.Integer.{rotateLeft => rotl}
    // single zero-allocation pass: pair code points as they stream by
    // (this sits under simhash64, which calls it once per token of the
    // whole corpus — an int[] per token would dominate the profile)
    var h = 0xf7ca7fd2 // MurmurHash3.stringSeed
    var prev = -1 // buffered first half of a pair; -1 = none pending
    var n = 0 // code-point count for the length finalize
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if (prev < 0) prev = cp
      else {
        var k = (prev << 16) + cp // wraps mod 2^32, as the oracle's % does
        k *= 0xcc9e2d51; k = rotl(k, 15); k *= 0x1b873593
        h ^= k; h = rotl(h, 13); h = h * 5 + 0xe6546b64
        prev = -1
      }
    }
    if (prev >= 0) { // mixLast of the unpaired trailing code point
      var k = prev
      k *= 0xcc9e2d51; k = rotl(k, 15); k *= 0x1b873593
      h ^= k
    }
    h ^= n
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13
    h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }

  /** SimHash-64 over a token array: per bit, sum ±1 contributions of
    * each token's hash; bit set iff the sum is positive. */
  val simhash64: UserDefinedFunction = udf { toks0: Seq[String] =>
    // null in → null out: empty-token fallback gave every null-text
    // doc signature 0 — all of them Hamming-0 "near-dups" of each
    // other through the band join
    if (toks0 == null) null.asInstanceOf[java.lang.Long]
    else {
    val toks = toks0
    val counts = new Array[Int](64)
    toks.foreach { t =>
      var h = murmur3TokenHash(t).toLong & 0xffffffffL
      // spread 32-bit murmur to 64 bits (xorshift finalizer)
      h ^= h << 21; h ^= h >>> 35; h ^= h << 4
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig: java.lang.Long
    }
  }

  /** Hamming distance between two 64-bit signatures. */
  val hamming64: UserDefinedFunction = udf { (a: Long, b: Long) =>
    java.lang.Long.bitCount(a ^ b)
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    * rolling hashes of char k-grams, min per window of w, distinct +
    * sorted → a compact, position-robust fingerprint set. */
  def winnow(k: Int = 8, w: Int = 4): UserDefinedFunction = udf { text: String =>
    // k-grams over CODE POINTS, not UTF-16 units — the DuckDB oracle
    // (winnowFpCte) recomputes the rolling hash with unicode(substr),
    // which is code-point addressed. For BMP-only text the code-point
    // fold IS the charAt fold, so the overwhelmingly-common case takes
    // a zero-allocation charAt path (one surrogate pre-scan; an int[]
    // per document is measurable GC churn at corpus scale) and only
    // genuinely astral documents materialize the code-point array.
    if (text == null) Array.empty[Long]
    else {
      var astral = false
      var ci = 0
      while (ci < text.length) {
        if (Character.isSurrogate(text.charAt(ci))) {
          astral = true; ci = text.length
        } else ci += 1
      }
      val hashes: Array[Long] =
        if (!astral) {
          if (text.length < k) null
          else {
            val n = text.length - k + 1
            val hs = new Array[Long](n)
            var i = 0
            while (i < n) {
              var h = 1125899906842597L
              var j = 0
              while (j < k) { h = 31 * h + text.charAt(i + j); j += 1 }
              hs(i) = h
              i += 1
            }
            hs
          }
        } else {
          val cps = text.codePoints().toArray
          if (cps.length < k) null
          else {
            val n = cps.length - k + 1
            val hs = new Array[Long](n)
            var i = 0
            while (i < n) {
              var h = 1125899906842597L
              var j = 0
              while (j < k) { h = 31 * h + cps(i + j); j += 1 }
              hs(i) = h
              i += 1
            }
            hs
          }
        }
      if (hashes == null) Array.empty[Long]
      else {
        val n = hashes.length
        val sel = scala.collection.mutable.SortedSet.empty[Long]
        var i = 0
        while (i + w <= n) {
          var m = hashes(i)
          var j = 1
          while (j < w) { if (hashes(i + j) < m) m = hashes(i + j); j += 1 }
          sel += m
          i += 1
        }
        sel.toArray
      }
    }
  }

  /** n-gram/function-word language ID heuristic. Scores each candidate
    * language by hit-rate of its most frequent function words (public
    * linguistic knowledge), plus a CJK-codepoint check; `und` when no
    * evidence. */
  val langId: UserDefinedFunction = udf { text: String =>
    if (text == null || text.isEmpty) "und"
    else if (text.exists(c => c >= 0x4e00 && c <= 0x9fff)) "zh"
    else {
      val profiles: Seq[(String, Set[String])] = Seq(
        "en" -> Set("the", "of", "and", "to", "in", "is", "that", "it"),
        "es" -> Set("el", "la", "de", "que", "y", "en", "los", "del"),
        "fr" -> Set("le", "la", "de", "et", "les", "des", "un", "du"),
        "de" -> Set("der", "die", "das", "und", "in", "den", "von", "zu"))
      val toks = text.toLowerCase.split("\\s+")
      if (toks.isEmpty) "und"
      else {
        val scored = profiles.map { case (lang, ws) =>
          lang -> toks.count(ws.contains).toDouble / toks.length
        }
        val (best, score) = scored.maxBy(_._2)
        if (score > 0.02) best else "und"
      }
    }
  }

  /** Gopher-style repetition signals in ONE per-row pass:
    * (top2_frac, top3_frac, dup5_frac) — the char fraction of the
    * most frequent word 2-/3-gram and of duplicated (count>1)
    * 5-grams. Replaces a 3×(explode → corpus-wide hash agg on
    * (doc_id, gram) → window/agg → join) plan shape: every signal is
    * per-document, so nothing needs to leave the row — zero shuffle,
    * embarrassingly parallel at 100 TB. Semantics mirror the DuckDB
    * oracle exactly: split on single spaces keeping empties, a doc
    * shorter than n words contributes [text] itself as its one gram,
    * argmax ties break on (count DESC, gram DESC), and fractions are
    * round(c*len(g)/n_chars + 1e-9, 4). */
  val repetitionSignals: UserDefinedFunction =
    udf(repetitionSignalsImpl _)

  /** Pure kernel behind repetitionSignals — exposed so PropertySpec
    * can cross-check it against a brute-force reference on generated
    * texts without a Spark session. */
  private[graft] def repetitionSignalsImpl(
      text: String, nChars: Long): (Double, Double, Double) = {
      // denominator floored at 1 — MIRRORED in the DuckDB oracle as
      // greatest(n_chars, 1): an empty doc (n_chars = 0) scores 0.0
      // on both engines instead of NaN (BigDecimal(NaN) throws), and
      // inconsistent metadata (n_chars = 0 with non-empty text)
      // still produces identical values on both sides
      val denom = math.max(nChars, 1L)
      def round4(x: Double): Double =
        BigDecimal(x + 1e-9)
          .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      val words: Array[String] =
        if (text == null) Array("") else text.split(" ", -1)
      def counts(n: Int): scala.collection.mutable.HashMap[String, Int] = {
        val m = new scala.collection.mutable.HashMap[String, Int]()
        if (words.length < n) {
          m.update(if (text == null) "" else text, 1)
        } else {
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i + n <= words.length) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(words(i + j))
              j += 1
            }
            val g = sb.toString
            m.update(g, m.getOrElse(g, 0) + 1)
            i += 1
          }
        }
        m
      }
      def topFrac(n: Int): Double = {
        var bestG: String = null
        var bestC = -1
        counts(n).foreach { case (g, c) =>
          if (c > bestC || (c == bestC && g.compareTo(bestG) > 0)) {
            bestG = g; bestC = c
          }
        }
        round4(bestC.toDouble * bestG.length / denom)
      }
      def dupFrac(n: Int): Double = {
        var covered = 0L
        counts(n).foreach { case (g, c) =>
          if (c > 1) covered += c.toLong * g.length
        }
        if (covered == 0L) 0.0 else round4(covered.toDouble / denom)
      }
      (topFrac(2), topFrac(3), dupFrac(5))
    }
}
