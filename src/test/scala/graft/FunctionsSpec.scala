package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.ArrayDot

class FunctionsSpec extends SparkSpec {

  test("array_dot codegen expression matches manual dot product") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -0.5), Seq(2.0, 2.0))
    ).toDF("a", "b")
      .select(ArrayDot.arrayDot(col("a"), col("b")).as("d"))
    val got = df.collect().map(_.getDouble(0))
    assert(got(0) == 32.0)
    assert(got(1) == 0.0)
  }

  test("array_dot rejects non-double arrays at analysis time") {
    import spark.implicits._
    val df = Seq((Seq("x"), Seq("y"))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(ArrayDot.arrayDot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("array_dot") ||
      ex.getMessage.toLowerCase.contains("type"))
  }

  test("GraftExtensions registers array_dot for SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }

  test("GraftExtensions registers hyperplane_sig for SQL") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT hyperplane_sig(array(0.5D, -1.5D, 2.0D), 64) AS s")
      .collect()(0).getLong(0)
    val viaCol = Seq(Seq(0.5, -1.5, 2.0)).toDF("emb")
      .select(graft.functions.HyperplaneSig.hyperplaneSig(col("emb"), 64))
      .first().getLong(0)
    assert(viaSql == viaCol)
  }

  test("hyperplane_sig codegen expression is bit-identical to the UDF") {
    import spark.implicits._
    import graft.functions.{FastSig, HyperplaneSig}
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("id", "emb")
    val got = df.select(col("id"),
        HyperplaneSig.hyperplaneSig(col("emb"), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = df.select(col("id"),
        FastSig.hyperplaneSigFast(64)(col("emb")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref, "codegen signature must equal the UDF bit-for-bit")
    // interpreted eval path agrees too (codegen-off execution)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(col("id"),
          HyperplaneSig.hyperplaneSig(col("emb"), 64).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(interp == ref)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // a dim past the precomputed table still matches the UDF rule
    val wide = Seq((0L, Seq.fill(4100)(rnd.nextGaussian()))).toDF("id", "emb")
    val w1 = wide.select(HyperplaneSig.hyperplaneSig(col("emb"), 64))
      .first().getLong(0)
    val w2 = wide.select(FastSig.hyperplaneSigFast(64)(col("emb")))
      .first().getLong(0)
    assert(w1 == w2, "fallback path past MAX_DIM must match the UDF")
  }

  test("random projection preserves pairwise distances (JL bound)") {
    import spark.implicits._
    import graft.functions.FastSig
    val rnd = new scala.util.Random(13)
    val d = 128
    val n = 40
    val vecs = Seq.tabulate(n)(i =>
      (i.toLong, Seq.fill(d)(rnd.nextGaussian())))
    val proj = vecs.toDF("id", "emb")
      .select(col("id"), FastSig.randomProjection(64)(col("emb")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def dist(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val orig = vecs.toMap
    val ratios = for {
      i <- 0 until n; j <- (i + 1) until n
    } yield dist(proj(i), proj(j)) / dist(orig(i), orig(j))
    // k=64 → distance-ratio std ≈ 1/sqrt(2k) ≈ 0.09; these are ±4σ+
    assert(ratios.forall(r => r > 0.6 && r < 1.5),
      s"distortion out of band: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.9 && mean < 1.1, s"mean distortion $mean")
  }

  test("hashedShingles encodes word boundaries (no concat collisions)") {
    import spark.implicits._
    import graft.functions.FastSig
    // without a boundary marker, the 2-grams ("ab","c") and ("a","bc")
    // hash the same character stream and collide DETERMINISTICALLY —
    // a systematic collision class, not the random 2^-64 one
    val shin = Seq("ab c", "a bc").toDF("text")
      .select(FastSig.hashedShingles(2)(col("text")).as("s"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(shin(0).intersect(shin(1)).isEmpty,
      "word-boundary marker must separate 'ab c' from 'a bc'")
    // identical texts still produce identical shingle sets
    val same = Seq("x y z", "x y z").toDF("text")
      .select(FastSig.hashedShingles(2)(col("text")).as("s"))
      .collect().map(_.getSeq[Long](0).toSet)
    assert(same(0) == same(1))
  }

  test("token/winnow hashes fold CODE POINTS (oracle addressing), " +
    "BMP-identical to the stdlib") {
    import scala.util.hashing.MurmurHash3
    import graft.functions.TextFunctions
    // BMP: the code-point fold IS the stdlib stringHash (one unit per
    // code point) — no behavior change on any existing corpus
    val bmp = Seq("", "a", "ab", "abc", "hello", "héllo wörld", "日本語",
      "x" * 100, "mixed 日本 and ascii")
    bmp.foreach { s =>
      assert(TextFunctions.murmur3TokenHash(s) == MurmurHash3.stringHash(s),
        s"BMP '$s' must hash exactly as MurmurHash3.stringHash")
    }
    // Astral: U+1F600 is TWO UTF-16 units but ONE code point — the
    // kernel must hash it as one. Reference = the stdlib's own public
    // mix/mixLast/finalizeHash folded over code points (independent
    // of the kernel's inlined rotl/multiply arithmetic).
    def ref(s: String): Int = {
      val cps = s.codePoints().toArray
      var h = 0xf7ca7fd2 // MurmurHash3.stringSeed
      var i = 0
      while (i + 1 < cps.length) {
        h = MurmurHash3.mix(h, (cps(i) << 16) + cps(i + 1)); i += 2
      }
      if (i < cps.length) h = MurmurHash3.mixLast(h, cps(i))
      MurmurHash3.finalizeHash(h, cps.length)
    }
    val astral = Seq("😀", "a😀", "😀b",
      "a😀b", "😀😁😂")
    astral.foreach { s =>
      assert(TextFunctions.murmur3TokenHash(s) == ref(s),
        s"astral '$s' must hash over code points")
      assert(TextFunctions.murmur3TokenHash(s) != MurmurHash3.stringHash(s),
        "sanity: astral input must actually exercise the divergence")
    }
    // winnow: k-gram positions advance by code point — a string of 5
    // astral chars has 4 2-grams (not 9 UTF-16 2-grams), recomputed
    // here with the same 31-polynomial over code points
    val w = "😀😁😂😃😄"
    import spark.implicits._
    val got = Seq(w).toDF("text")
      .select(TextFunctions.winnow(k = 2, w = 2)(col("text")).as("f"))
      .collect().head.getSeq[Long](0).toSet
    val cps = w.codePoints().toArray
    val grams = (0 to cps.length - 2).map(i =>
      31L * (31L * 1125899906842597L + cps(i)) + cps(i + 1))
    val expect = (0 to grams.length - 2).map(i =>
      math.min(grams(i), grams(i + 1))).toSet
    assert(got == expect, s"winnow astral fingerprint: $got vs $expect")
  }

  test("bbox union aggregator merges partial buffers correctly") {
    import spark.implicits._
    import graft.functions.BboxUnionAgg
    val boxes = Seq(
      (1L, BboxUnionAgg.Bbox(-10, -5, 0, 5)),
      (1L, BboxUnionAgg.Bbox(-2, -20, 8, 1)),
      (2L, BboxUnionAgg.Bbox(0, 0, 1, 1))
    ).toDS().repartition(3) // force partial+final merge
    val got = boxes.groupByKey(_._1).mapValues(_._2)
      .agg(BboxUnionAgg.agg.toColumn.name("u"))
      .collect().toMap
    assert(got(1L) == BboxUnionAgg.Bbox(-10, -20, 8, 5))
    assert(got(2L) == BboxUnionAgg.Bbox(0, 0, 1, 1))
  }

  test("array_dot and hyperplane_sig null a result on a null ELEMENT") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b")
      .selectExpr("id", "CAST(a AS ARRAY<DOUBLE>) AS a",
        "CAST(b AS ARRAY<DOUBLE>) AS b")
    val dots = df.select(col("id"),
      graft.functions.ArrayDot.arrayDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!dots(1L), "clean row must score")
    assert(dots(2L), "null element must null the dot, not read 0.0")
    val sigs = df.select(col("id"),
      graft.functions.HyperplaneSig.hyperplaneSig(col("a"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!sigs(1L) && sigs(2L),
      "null element must null the signature on both eval paths")
  }

  test("band splitting rejects non-divisible configs; 64-bit band mask is full") {
    intercept[IllegalArgumentException] {
      graft.functions.VectorFunctions.sigBands(
        org.apache.spark.sql.functions.lit(1L), 64, 3)
    }
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // bandBits = 64: the single band hash must be the signature
    // itself, not a zero-masked constant
    val sig = 0x0123456789abcdefL
    val got = Seq(sig).toDF("sig")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.VectorFunctions.sigBands(col("sig"), 64, 1)).as("b"))
      .select(col("b.bh")).collect().map(_.getLong(0))
    assert(got.sameElements(Array(sig)))
  }

  test("decode-repair preserves overlong/surrogate byte forms as latin-1") {
    import graft.functions.SurrogateRepair
    // overlong '/' (C0 AF) and a CESU-8 surrogate lead (ED A0 80):
    // structurally plausible, but strict UTF-8 must REJECT them so the
    // bytes survive as latin-1 instead of dissolving into U+FFFD
    val overlong = SurrogateRepair.decodeRepair(
      Array(0xc0.toByte, 0xaf.toByte))
    assert(overlong == "\u00c0\u00af", s"got ${overlong.map(_.toInt)}")
    val surrogate = SurrogateRepair.decodeRepair(
      Array(0xed.toByte, 0xa0.toByte, 0x80.toByte))
    assert(!surrogate.contains('\ufffd'))
    assert(surrogate == "\u00ed\u00a0\u0080")
    // a REAL 3-byte char still decodes (ED 9F BF = U+D7FF, legal)
    assert(SurrogateRepair.decodeRepair(
      Array(0xed.toByte, 0x9f.toByte, 0xbf.toByte)) == "\ud7ff")
  }
}
