package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** text_bpe_train pins: hand-computed merge sequences on planted
  * corpora, including the two rules that distinguish a real trainer
  * from the single-scan approximation — RE-COUNTING after each merge
  * (later rounds see merged tokens) and the left-to-right
  * non-overlapping merge of equal-token runs. */
class BpeTrainSpec extends SparkSpec {

  private def docs(texts: String*): DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, "en", t) }
      .toDF("doc_id", "lang", "text")
  }

  private def train(d: DataFrame): Seq[(Int, String, String, Long)] =
    TextQueries.textBpeTrainFrom(d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("re-count after merge: round 2 counts MERGED tokens") {
    // corpus: "abab" x3, "ab" x2
    // round 1: (a,b)=3*2+2*1=8 beats (b,a)=3 -> merge (a,b)
    // after:  abab=[ab,ab], ab=[ab]
    // round 2: (ab,ab)=3 — a pair that EXISTS only post-merge
    // round 3: abab=[abab], ab=[ab] -> no pairs -> early stop
    val got = train(docs("abab abab ab", "abab ab"))
    assert(got == Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)), got)
  }

  test("equal-token run merges left-to-right non-overlapping") {
    // "aaa": pairs (a,a)=2 but only ONE merge applies -> [aa, a]
    // round 2: (aa,a)=1 -> [aaa]; then no pairs
    val got = train(docs("aaa"))
    assert(got == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)), got)
  }

  test("tie-break is (cnt desc, pair_a, pair_b)") {
    // "xy" x2 and "xz" x2: (x,y)=2, (x,z)=2 -> (x,y) wins on pair_b;
    // round 2: (x,z)=2 still there -> merged next
    val got = train(docs("xy xy xz xz"))
    assert(got.take(2) == Seq((1, "x", "y", 2L), (2, "x", "z", 2L)), got)
  }

  test("round cap: a rich corpus stops at BPE_TRAIN_ROUNDS") {
    val words = ('a' to 'z').map(c => s"$c${c}q${c}w").mkString(" ")
    val got = train(docs(words, words))
    assert(got.size == TextQueries.BPE_TRAIN_ROUNDS)
    assert(got.map(_._1) == (1 to TextQueries.BPE_TRAIN_ROUNDS))
  }

  test("trained encoder: planted cascade compresses to one token/word") {
    val sep = "\u001f"
    val d = docs("abab abab ab", "abab ab")
    // merges learned from THIS corpus: (a,b) then (ab,ab) — the
    // greedy kernel must cascade both: "abab" -> [ab,ab] -> [abab]
    val merges = TextQueries.bpeTrainMergesFrom(d)
    assert(merges.map(m => (m._2, m._3)) == Seq(("a", "b"), ("ab", "ab")))
    val rank = merges.sortBy(_._1).zipWithIndex
      .map { case ((_, pa, pb, _), i) => (pa + sep + pb) -> i }.toMap
    assert(TextQueries.bpeTokenCount("abab", rank, sep) == 1)
    assert(TextQueries.bpeTokenCount("ab", rank, sep) == 1)
    // pair-keyed lookup: tokens [ab, c] must NOT match a learned
    // (a, bc) merge — a concat-keyed form would
    val r2 = Map("a" + sep + "bc" -> 0, "a" + sep + "b" -> 1)
    assert(TextQueries.bpeTokenCount("abc", r2, sep) == 2) // [ab, c]
    // and the whole operator compresses the fixture corpus: fewer
    // tokens than characters (merges applied), at least one per word
    val out = TextQueries.textBpeEncodeTrained(spark, sf).collect()
    val chars = graft.Tables.documents(spark, sf)
      .selectExpr("lang", "length(replace(text, ' ', '')) AS c")
      .groupBy("lang").sum("c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty && out.forall { r =>
      val (lang, words, bpe) = (r.getString(0), r.getLong(2), r.getLong(3))
      bpe >= words && bpe < chars(lang)
    })
  }

  test("fixture corpus: monotone rounds, no empty merges") {
    val got = train(graft.Tables.documents(spark, sf))
    assert(got.nonEmpty && got.size <= TextQueries.BPE_TRAIN_ROUNDS)
    assert(got.map(_._1) == (1 to got.size))
    got.foreach { case (_, a, b, n) =>
      assert(a.nonEmpty && b.nonEmpty && n >= 1)
    }
  }

  // ── driver-local merge loop (VERDICT r14 task 2): the gated
  //    collect must be BIT-IDENTICAL to the distributed rounds ──

  private def trainDist(d: DataFrame): Seq[(Int, String, String, Long)] =
    // driverMax = 0 forces the distributed loop — the clustersFrom /
    // pagerank override discipline
    TextQueries.bpeTrainMergesFrom(d, driverMax = 0L)

  private def trainDrv(d: DataFrame): Seq[(Int, String, String, Long)] =
    TextQueries.bpeTrainMergesFrom(d, driverMax = Long.MaxValue >> 1)

  test("driver == distributed merge lists, bit-identical, on the " +
      "fixture corpus AND the planted corpora — both call orders") {
    val fixture = graft.Tables.documents(spark, sf)
    // order 1: distributed first
    val dist1 = trainDist(fixture)
    val drv1 = trainDrv(fixture)
    assert(drv1 == dist1,
      s"driver diverges from distributed on the fixture:\n" +
        s" drv=$drv1\ndist=$dist1")
    assert(dist1.nonEmpty)
    // order 2: driver first, on the planted corpora whose merge
    // sequences are hand-computed above
    Seq(
      docs("abab abab ab", "abab ab"),
      docs("aaa"),
      docs("xy xy xz xz")
    ).foreach { d =>
      val drv = trainDrv(d)
      val dist = trainDist(d)
      assert(drv == dist, s"paths diverge:\n drv=$drv\ndist=$dist")
    }
  }

  test("driver tie-break uses UTF-8 BINARY order like Spark's sort " +
      "(astral vs U+E000.. would flip under UTF-16 comparison)") {
    // tokens: U+E000 (3 UTF-8 bytes ee 80 80) vs U+10000 (4 bytes
    // f0 90 80 80). UTF-8/code-point order puts U+E000 FIRST; Java
    // String.compareTo (UTF-16 units: e000 vs d800) puts the astral
    // pair first. Both pairs tie on count, so the learned round-1
    // pair is decided purely by the tie-break.
    val pua = "\uE000"
    val astral = new String(Character.toChars(0x10000))
    val d = docs(s"q$pua q$astral")
    val drv = trainDrv(d)
    val dist = trainDist(d)
    assert(drv == dist, s"tie-break diverges:\n drv=$drv\ndist=$dist")
    assert(drv.head._2 == "q" && drv.head._3 == pua,
      s"UTF-8 order must pick U+E000 first: ${drv.head}")
  }

  test("seeded random corpora: driver == distributed, every sample " +
      "(tie-heavy alphabets, equal-token runs, multi-byte chars)") {
    // deterministic adversarial sweep: tiny alphabets force constant
    // argmax ties (exercising the UTF-8 tie-break), repeated chars
    // force the non-overlapping merge rule, and the third alphabet
    // mixes 1-, 3-, and 4-byte encodings so a UTF-16 comparison or a
    // Java-char (non-code-point) tokenizer would diverge
    val rnd = new scala.util.Random(20260815L)
    val astral = new String(Character.toChars(0x1F600))
    val alphabets = Seq("ab", "abc", "a" + astral)
    val corpora = (0 until 6).map { i =>
      val alpha = alphabets(i % alphabets.size)
      val cps = alpha.codePoints().toArray
      def word(): String = (0 until (1 + rnd.nextInt(6)))
        .map(_ => new String(Character.toChars(cps(rnd.nextInt(cps.length)))))
        .mkString
      val texts = (0 until (3 + rnd.nextInt(5))).map { _ =>
        (0 until (3 + rnd.nextInt(27))).map(_ => word()).mkString(" ")
      }
      docs(texts: _*)
    }
    corpora.zipWithIndex.foreach { case (d, i) =>
      val drv = TextQueries.bpeTrainMergesFrom(d, rounds = 8,
        driverMax = Long.MaxValue >> 1)
      val dist = TextQueries.bpeTrainMergesFrom(d, rounds = 8,
        driverMax = 0L)
      assert(drv == dist,
        s"sample $i diverges:\n drv=$drv\ndist=$dist")
    }
  }

  test("driver loop: K=256 rounds stay flat-cost (env-gated probe)") {
    // GRAFT_BPE_PERF=1: demonstrate the task-2 claim — per-round cost
    // of the driver loop is O(Σ tokens) pure CPU with NO Spark jobs,
    // so 16× more rounds cost ~16× one round, not 16× (job latency +
    // count + checkpoint). Numbers land in BENCH_LOCAL.md.
    assume(sys.env.contains("GRAFT_BPE_PERF"), "set GRAFT_BPE_PERF=1")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", sf)
    val wc = graft.Tables.documents(spark, dir)
      .selectExpr("explode(split(text, ' ')) AS w")
      .where("length(w) > 0").groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def time(k: Int): (Double, Int) = {
      val t0 = System.nanoTime()
      val m = TextQueries.bpeTrainMergesDriver(wc, k)
      ((System.nanoTime() - t0) / 1e9, m.size)
    }
    val (t16, n16) = time(16)
    val (t256, n256) = time(256)
    info(f"driver BPE: K=16 → $t16%.2fs ($n16 merges); " +
      f"K=256 → $t256%.2fs ($n256 merges); " +
      f"per-round ${t256 / math.max(1, n256)}%.4fs")
    assert(n256 > n16)
    // flatness: 16× the rounds must cost well under 32× the K=16 wall
    assert(t256 < math.max(1.0, t16 * 32),
      f"per-round cost is not flat: $t16%.2fs → $t256%.2fs")
  }
}
