package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** One-pass signature kernels for the dedup/similarity hot paths.
  *
  * The expression-level forms (TextFunctions.minhashSignature,
  * VectorFunctions.hyperplaneSig) re-scan the shingle/embedding array
  * once per permutation/bit through interpreted higher-order
  * functions. These UDF kernels do the same math in a single local
  * pass with primitive arrays — measured ~6× faster at sf0.1 — and
  * stay per-row local (zero effect on shuffle volume or plan shape).
  */
object FastSig {

  /** splitmix64 finalizer — deterministic, well-mixed 64-bit hash.
    * Exposed to graft so deterministic sampling keys (e.g. the
    * emb_kmeans init) can reuse the one hash the DuckDB oracles
    * already recompute via DedupQueries.mix64Sql. */
  @inline private[graft] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Char fold over CODE POINTS, not UTF-16 units: the DuckDB oracle
    * recomputes this fold with `unicode(substr(...))`, which is
    * code-point addressed — folding surrogate pairs as two units here
    * would diverge engine from oracle on any astral character (emoji,
    * rare CJK). Identical to a charAt fold on BMP-only text. */
  private def hashString(s: String, seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = mix(h ^ cp)
      i += Character.charCount(cp)
    }
    h
  }

  /** text → sorted distinct hashed word-k-gram shingle set.
    * 64-bit hashes: collision probability across a corpus is
    * ~n²/2⁶⁴ — negligible against the 4-decimal jaccard rounding.
    * A word-boundary marker is mixed in between words so a k-gram's
    * hash differs from the hash of its character concatenation
    * (without it, 2-grams "ab c" and "a bc" would collide
    * DETERMINISTICALLY — a systematic collision class, not the
    * random ~n²/2⁻⁶⁴ one). */
  def hashedShingles(k: Int): UserDefinedFunction = udf { text: String =>
    // null in → null OUT: an empty set would give every null-text doc
    // the identical minhash signature ([Long.MaxValue × perms]) and
    // band hashes — C(n,2) bogus jaccard-1.0 "near-dup" pairs through
    // one LSH bucket for n dirty rows
    if (text == null) null
    else {
      // limit -1 keeps trailing empty tokens — matching Spark's
      // split() and DuckDB's string_split, so shingle sets agree
      val words = text.split(" ", -1)
      if (words.length < k) Array(hashString(text, 7L))
      else {
        val set = new java.util.TreeSet[java.lang.Long]()
        var i = 0
        while (i + k <= words.length) {
          var h = 7L
          var j = 0
          while (j < k) {
            h = mix(hashString(words(i + j), h) ^ 0x1fL)
            j += 1
          }
          set.add(h)
          i += 1
        }
        val out = new Array[Long](set.size)
        val it = set.iterator()
        var x = 0
        while (it.hasNext) { out(x) = it.next(); x += 1 }
        out
      }
    }
  }

  /** Jaccard of two SORTED distinct long arrays via linear merge. */
  val jaccardSorted: UserDefinedFunction = udf { (a: Seq[Long], b: Seq[Long]) =>
    // null in → null out (Spark's convention for its own functions):
    // mapping null to the EMPTY set would score two dirty rows as
    // jaccard 1.0 and silently dedupe unrelated documents; a null
    // verdict drops out of every >= threshold filter instead
    if (a == null || b == null) null.asInstanceOf[java.lang.Double]
    else {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    (if (union == 0) 1.0 else inter.toDouble / union): java.lang.Double
    }
  }

  /** MinHash signature from a hashed shingle set: sig(p) =
    * min over shingles of mix(h ^ perm_p) — one pass per doc. */
  def minhashSig(numPerm: Int): UserDefinedFunction = udf { shin: Seq[Long] =>
    if (shin == null) null
    else {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    shin.foreach { h =>
      var p = 0
      while (p < numPerm) {
        val v = mix(h ^ (p * 0xc2b2ae3d27d4eb4fL))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
    }
    sig
    }
  }

  /** Band hashes over a minhash signature (rows = numPerm/nBands). */
  def bandHashes(nBands: Int): UserDefinedFunction = udf { sig: Seq[Long] =>
    // null in → null out: an empty-set fallback would give every
    // dirty row the SAME band hashes (h = band index), flooding each
    // LSH bucket with all-pairs candidates of unrelated rows
    if (sig == null) null
    else {
    require(sig.length % nBands == 0,
      s"signature length ${sig.length} must divide into $nBands bands —" +
        " a remainder would silently discard the trailing permutations")
    val rows = sig.length / nBands
    Array.tabulate(nBands) { b =>
      var h = b.toLong
      var r = 0
      while (r < rows) { h = mix(h ^ sig(b * rows + r)); r += 1 }
      h
    }
    }
  }

  /** Johnson-Lindenstrauss random projection d→k: the SAME
    * deterministic ±1 hyperplane family as hyperplaneSigFast, but
    * keeping the projection VALUES (scaled 1/√k) instead of their
    * signs. Achlioptas (JPSS'03): ±1 entries give the JL distance-
    * preservation guarantee with no stored matrix — component (j,d)
    * is recomputed from mix(seed,j,d), so the "matrix" ships as one
    * long seed. Per-row local, zero shuffle; distortion bound
    * property-tested. */
  /** The ±1 entry of the seed-only JL projection "matrix" — exposed so
    * the DuckDB oracle builder can precompute the same matrix as a SQL
    * literal (the matrix is a pure function of (seed, j, d), so the
    * oracle re-derives the full projection without mirroring splitmix
    * in SQL). */
  private[graft] def projectionSign(seed: Long, j: Int, d: Int): Double =
    if ((mix(seed ^ (j.toLong << 32) ^ d) & 1L) == 0L) 1.0 else -1.0

  def randomProjection(k: Int, seed: Long = 42L): UserDefinedFunction =
    udf { emb: Seq[Double] =>
      if (emb == null) Array.empty[Double]
      else {
      val invSqrtK = 1.0 / math.sqrt(k.toDouble)
      val out = new Array[Double](k)
      var j = 0
      while (j < k) {
        var acc = 0.0
        var d = 0
        while (d < emb.length) {
          acc += emb(d) * projectionSign(seed, j, d)
          d += 1
        }
        out(j) = acc * invSqrtK
        j += 1
      }
      out
      }
    }

  /** Random-hyperplane LSH signature in one pass: `bits` sign bits of
    * projections onto deterministic ±1 hyperplanes (component (b,d)
    * from mix(seed,b,d)) packed into a long. */
  def hyperplaneSigFast(bits: Int, seed: Long = 42L): UserDefinedFunction =
    udf { emb: Seq[Double] =>
      // null in → null out, matching HyperplaneSigExpr (the empty-Seq
      // fallback produced the all-ones signature: every dirty row in
      // the same LSH bucket). The expression is documented as a
      // drop-in for this UDF, so their null semantics must agree.
      if (emb == null) null.asInstanceOf[java.lang.Long]
      else {
      var sig = 0L
      var b = 0
      while (b < bits) {
        var proj = 0.0
        var d = 0
        while (d < emb.length) {
          val sign =
            if ((mix(seed ^ (b.toLong << 32) ^ d) & 1L) == 0L) 1.0 else -1.0
          proj += emb(d) * sign
          d += 1
        }
        if (proj >= 0) sig |= (1L << b)
        b += 1
      }
      sig: java.lang.Long
      }
    }
}
