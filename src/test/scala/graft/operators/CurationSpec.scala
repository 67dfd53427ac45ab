package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Quality-threshold curation: the exact-percentile filter (oracle
  * path) and the approx_percentile filter (100 TB path) must agree on
  * the kept set up to sketch error. */
class CurationSpec extends SparkSpec {

  test("chunks reconstruct every document losslessly") {
    // stride-S chunking invariant: the first S words of every chunk
    // except the last, plus the whole last chunk, concatenate back to
    // the original token stream — no token lost or duplicated at
    // chunk boundaries
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    val chunks = TextQueries.textChunk(spark, sf)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).toSeq)
      .toMap
    val original = docs.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == original.keySet)
    original.foreach { case (id, text) =>
      val cs = chunks(id)
      val rebuilt = (cs.dropRight(1).map(_.split(" ", -1).take(48))
        :+ cs.last.split(" ", -1)).flatten
      assert(rebuilt.toSeq == text.split(" ", -1).toSeq,
        s"doc $id does not reconstruct from its chunks")
      // overlap: consecutive chunks share width-stride = 16 words
      cs.sliding(2).foreach {
        case Seq(a, b) =>
          val aw = a.split(" ", -1); val bw = b.split(" ", -1)
          assert(aw.drop(48).sameElements(bw.take(aw.length - 48)),
            s"doc $id chunk overlap broken")
        case _ =>
      }
    }
  }

  test("sequence packing is gapless and budget-aligned per stream") {
    // concat-and-cut invariants: within every (lang, shard) stream the
    // docs' token spans tile the stream exactly (offset_i+1 follows
    // from cum_i), every start offset is inside its sequence
    // (0 <= seq_offset < budget), and seq_id is exactly the number of
    // complete budgets before the doc's first token
    val rows = TextQueries.textPackSequences(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = 512L
    rows.foreach { r =>
      val (tok, seqId, off) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(tok > 0)
      assert(off >= 0 && off < budget, s"offset $off outside [0, $budget)")
      assert(seqId >= 0)
    }
    // per-stream tiling: sorted by global start = seq_id*budget + off,
    // consecutive docs must start exactly n_tokens apart
    rows.groupBy(r => (r.getString(1), r.getLong(2))).foreach {
      case (_, docs) =>
        val spans = docs
          .map(r => (r.getLong(4) * budget + r.getLong(5), r.getLong(3)))
          .sortBy(_._1)
        spans.sliding(2).foreach {
          case Array((s0, t0), (s1, _)) =>
            assert(s1 == s0 + t0, s"gap in stream: $s0+$t0 != $s1")
          case _ =>
        }
        assert(spans.head._1 == 0L, "stream does not start at offset 0")
    }
  }

  test("html strip output is html-free and idempotent on clean text") {
    val out = TextQueries.textHtmlStrip(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getString(1)
      // markup gone; entity-decoded "<escaped>" is CONTENT and must
      // survive (decode runs after the strip, by design)
      Seq("<html", "<h1", "<p>", "</", "<script", "<style", "<!--")
        .foreach(tag => assert(!t.contains(tag), s"markup $tag survived"))
      assert(t.contains("& more <escaped> \"text\" here"),
        "decoded entities missing")
      assert(!t.contains("&amp;") && !t.contains("&nbsp;"),
        "entity survived the strip")
      assert(!t.contains("var x = 1"), "script body survived the strip")
      assert(!t.contains("  "), "whitespace not collapsed")
      assert(t == t.trim)
      assert(r.getLong(2) == t.length.toLong)
    }
  }

  test("mixture card token shares sum to 1") {
    val card = TextQueries.textMixtureCard(spark, sf).collect()
    assert(card.nonEmpty)
    val share = card.map(_.getDouble(5)).sum
    assert(math.abs(share - 1.0) < 0.01, s"shares sum to $share")
    card.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(3) > 0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.2)
    }
  }

  test("KS drift separates a shifted source from identical ones") {
    import spark.implicits._
    // two sources drawn from the same grid, one source shifted +0.5:
    // the shifted source must dominate the drift ranking with a D near
    // 1, the identical pair stays near the tie floor
    val same = for (s <- Seq("a", "b"); i <- 0 until 200)
      yield ("en", s, (i % 50) / 100.0)
    val shifted = for (i <- 0 until 200)
      yield ("en", "c", (i % 50) / 100.0 + 0.5)
    val d = TextQueries.aggKsDriftFrom((same ++ shifted)
      .toDF("lang", "source", "q"))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    // the shifted source maxes out; the identical pair each see HALF
    // their rest-pool shifted, so one-vs-rest puts them at exactly 0.5
    // — still clearly below the true drifter
    assert(d("c") > 0.9, s"shifted source D=${d("c")}")
    assert(math.abs(d("a") - d("b")) < 1e-9, "identical sources must tie")
    assert(d("a") < d("c") - 0.3, s"drifter not separated: ${d}")
    d.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // control: with no drifted source every one-vs-rest D collapses
    val flat = TextQueries.aggKsDriftFrom(same.toDF("lang", "source", "q"))
      .collect().map(_.getDouble(2))
    assert(flat.forall(_ < 0.05), s"flat pool drifted: ${flat.toSeq}")
  }

  test("quality CDF is a proper per-language CDF") {
    val rows = TextQueries.winQualityCdf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0001))
    // max per language is exactly 1 (cume_dist of the last row)
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).max - 1.0) < 1e-3,
        s"$lang CDF does not reach 1")
    }
  }

  test("approx-percentile filter agrees with the exact filter") {
    val exact = TextQueries.textQualityFilter(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = TextQueries.textQualityFilterApprox(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // accuracy 10000 on a small corpus: the sketch is exact up to
    // interpolation at the cut, so the sets differ by at most the
    // handful of docs tied at the threshold
    val sym = (exact diff approx) union (approx diff exact)
    assert(exact.nonEmpty && approx.nonEmpty)
    assert(sym.size <= math.max(2, exact.size / 20),
      s"kept sets diverge by ${sym.size} of ${exact.size}")
  }

  test("filter keeps roughly the top 80% and every kept doc clears the bar") {
    val rows = TextQueries.textQualityFilter(spark, sf)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val n = graft.Tables.documents(spark, sf).count()
    assert(rows.forall { case (q, t) => q >= t })
    assert(rows.length >= (n * 0.75).toInt && rows.length <= n,
      s"kept ${rows.length} of $n")
  }

  test("bpe pair counts equal a plain-Scala recount of the corpus") {
    val docs = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for {
      t <- docs
      w <- t.split(" ", -1) if w.length >= 2
      i <- 0 until w.length - 1
    } {
      val p = w.substring(i, i + 2)
      counts(p) = counts.getOrElse(p, 0L) + 1L
    }
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = TextQueries.textBpePairs(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == expected)
  }

  test("sentence dedup drops exactly the repeats and preserves order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Accept cookies. Real content here. Accept cookies. More text!"),
      (2L, "No repeats at all. Second sentence?"),
      (3L, "Same. Same. Same.")
    ).toDF("doc_id", "text")
    val out = TextQueries.textSentenceDedupFrom(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) ==
      (("Accept cookies. Real content here. More text!", 3L, 1L)))
    assert(out(2L) == (("No repeats at all. Second sentence?", 2L, 0L)))
    assert(out(3L) == (("Same.", 1L, 2L)))
  }

  test("global line dedup keeps only the corpus-first occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "All rights reserved. Unique to one."),
      (2L, "Fresh opener here. All rights reserved. Tail text!"),
      // intra-doc repeat AND cross-doc repeat in the same doc
      (3L, "All rights reserved. All rights reserved. Own line."),
      // every line first-occurred elsewhere: doc empties cleanly
      (4L, "All rights reserved. Unique to one.")
    ).toDF("doc_id", "text")
    val out = TextQueries.textLineDedupGlobalFrom(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("All rights reserved. Unique to one.", 2L, 0L)))
    assert(out(2L) == (("Fresh opener here. Tail text!", 2L, 1L)))
    assert(out(3L) == (("Own line.", 1L, 2L)))
    assert(out(4L) == (("", 0L, 2L)))
  }

  test("int8 quantization error is small, zero for zero vectors, exact for grid vectors") {
    import spark.implicits._
    val e = Seq(
      // exactly representable on the int8 grid: x = scale * k
      (1L, Array(127.0f, -127.0f, 0.0f), 0),
      (2L, Array(0.0f, 0.0f, 0.0f), 0), // degenerate: defined error 0
      (3L, Array(0.3f, -0.7f, 0.11f), 1)
    ).toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("label").cast("int").as("label"),
        col("embedding"))
    val out = SimilarityQueries.embQuantizeInt8From(e)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out(1L)._1 == 1.0 && out(1L)._2 == 0.0 && !out(1L)._3)
    assert(out(2L) == ((0.0, 0.0, true)))
    // int8 rounding error bound: per-element ≤ scale/2 ⇒ relative
    // error ≤ (scale/2)·√d / ‖x‖ — loose check: under 1%
    assert(out(3L)._2 > 0.0 && out(3L)._2 < 0.01 && !out(3L)._3)
  }

  test("bpe encode matches a plain-Scala greedy reference and compresses") {
    val out = TextQueries.textBpeEncode(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // reference: recompute the merge ranks and re-encode in plain Scala
    val docs = graft.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for {
      (_, t) <- docs; w <- t.split(" ", -1) if w.length >= 2
      i <- 0 until w.length - 1
    } {
      val p = w.substring(i, i + 2)
      counts(p) = counts.getOrElse(p, 0L) + 1L
    }
    val rank = counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(50).map(_._1).zipWithIndex.toMap
    val want = docs.groupBy(_._1).map { case (lang, ds) =>
      val words = ds.map(_._2.split(" ", -1).length.toLong).sum
      val bpe = ds.map(_._2.split(" ", -1)
        .map(w => TextQueries.bpeTokenCount(w, rank).toLong).sum).sum
      lang -> ((words, bpe))
    }
    want.foreach { case (lang, (words, bpe)) =>
      val (gotWords, gotBpe, ratio) = out(lang)
      assert(gotWords == words && gotBpe == bpe,
        s"$lang: got ($gotWords, $gotBpe) want ($words, $bpe)")
      // merges learned from the corpus must compress it: more tokens
      // than words (subword), far fewer than characters
      assert(ratio > 1.0, s"$lang ratio $ratio")
    }
  }

  test("bigram logprob covers exactly the multi-word docs, nonpositive") {
    import org.apache.spark.sql.functions._
    val out = TextQueries.textBigramLogprob(spark, sf).collect()
    assert(out.nonEmpty)
    // log of a probability: ≤ 0 (rounding epsilon aside)
    assert(out.forall(_.getDouble(1) <= 1e-6))
    val perDoc = graft.Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).as("n"))
      .collect().map(_.getInt(0)).filter(_ >= 2)
    assert(out.length == perDoc.length)
    // one bigram per adjacent word pair on clean single-spaced text
    assert(out.map(_.getLong(2)).sum == perDoc.map(_ - 1L).sum)
  }

  test("entropy kernel matches a plain-Scala reference on a 50k-word doc") {
    // A book-length heavy-tailed doc: ~25k distinct words, 50k tokens.
    // The old distinct×filter kernel was O(u·n) — ~1.25e9 interpreted
    // lambda evals on this ONE row; the sort+run-length kernel must
    // finish promptly AND agree with an exact reference.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Array.tabulate(50000) { _ =>
      // Zipf-ish: small ids frequent, long tail mostly unique
      val z = math.min((math.exp(rnd.nextDouble() * 10.2) - 1).toLong, 25000L)
      s"w$z"
    }
    val text = words.mkString(" ")
    val started = System.nanoTime()
    val row = TextQueries.textEntropyFrom(
      Seq((1L, text)).toDF("doc_id", "text")).collect().head
    val elapsedSec = (System.nanoTime() - started) / 1e9
    val counts = words.groupBy(identity).view.mapValues(_.length).values
    val n = words.length.toDouble
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val want = log2(n) - counts.map(c => c * log2(c.toDouble)).sum / n
    assert(row.getLong(1) == counts.size.toLong,
      s"n_vocab ${row.getLong(1)} want ${counts.size}")
    assert(math.abs(row.getDouble(2) - want) < 1e-3,
      s"entropy ${row.getDouble(2)} want $want")
    // generous bound: the whole job (plan + one row) is seconds, not
    // the minutes the quadratic kernel would take
    assert(elapsedSec < 60, s"entropy kernel took $elapsedSec s")
  }

  test("length histogram buckets exact powers of two correctly") {
    // floor(log(2.0, n)) = ln(n)/ln 2 can land BELOW the integer at
    // exact powers of two; the bit-length bucket must not. 1024 tokens
    // must land in bucket 10 (lo=1024), 1023 in bucket 9 (lo=512).
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(1024)("a").mkString(" ")),
      (2L, Seq.fill(1023)("b").mkString(" ")),
      (3L, Seq.fill(1)("c").mkString(" ")),
      (4L, Seq.fill(65536)("d").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextQueries.textLengthHistogramFrom(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 1L, 1L, 1L),          // 1 token → bucket 0
      (9L, 512L, 1L, 1023L),     // 1023 → bucket 9
      (10L, 1024L, 1L, 1024L),   // exactly 2^10 → bucket 10
      (16L, 65536L, 1L, 65536L)  // exactly 2^16 → bucket 16
    ), got.mkString(", "))
  }

  test("split-leakage ledger: planted cross-split twin is counted, " +
      "clean corpora alarm zero") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // find two ids the PUBLISHED split rule separates, then plant
    // identical text under both — the ledger must count exactly one
    // leaked content; distinct-text docs must not alarm
    val buckets = spark.range(0, 2000)
      .select(col("id"), SampleQueries.hashBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = buckets.collectFirst { case (i, b) if b < 980 => i }.get
    val valId = buckets.collectFirst
      { case (i, b) if b >= 980 && b < 990 => i }.get
    val trainId2 = buckets.collectFirst
      { case (i, b) if b < 980 && i != trainId => i }.get
    val d = Seq(
      (trainId, "aa", "leaked twin text"),
      (valId, "aa", "leaked twin text"),
      (trainId2, "aa", "unique text one"),
      (buckets.collectFirst { case (i, b) if b >= 990 => i }.get,
        "bb", "unique text two"))
      .toDF("doc_id", "lang", "text")
    val out = PipelineQueries.pipelineSplitLeakageFrom(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("aa") == ((3L, 2L, 1L, 1L)),
      s"aa ledger wrong: ${out("aa")}")
    assert(out("bb") == ((1L, 1L, 0L, 0L)))
    // a within-split duplicate counts as dup but NOT as leakage
    val d2 = Seq(
      (trainId, "cc", "dup in train"),
      (trainId2, "cc", "dup in train"))
      .toDF("doc_id", "lang", "text")
    val o2 = PipelineQueries.pipelineSplitLeakageFrom(d2).collect()
    assert(o2.length == 1 && o2.head.getLong(3) == 1L &&
      o2.head.getLong(4) == 0L)
  }

  test("curation_ensemble: covers the held-out split 1:1, the four " +
      "gates genuinely disagree somewhere, and majority-keep sits " +
      "strictly between the strictest and laxest single gate") {
    val rows = PipelineQueries.curationEnsemble(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getLong(4), r.getBoolean(5)))
    val total = rows.map(_._5).sum
    val heldOut = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 >= 7).count()
    assert(total == heldOut,
      s"card must cover the scored split 1:1: $total != $heldOut")
    // real disagreement: at least one pattern with mixed verdicts
    assert(rows.exists { case (g, p, q, l, _, _) =>
      Set(g, p, q, l).size == 2 },
      s"no mixed-verdict pattern — the ensemble card is vacuous: " +
        s"${rows.toSeq}")
    // majority keep == the >=3-of-4 rule, recomputed
    rows.foreach { case (g, p, q, l, _, keep) =>
      val votes = Seq(g, p, q, l).count(identity)
      assert(keep == (votes >= 3), s"pattern ($g,$p,$q,$l): " +
        s"ensemble_keep $keep != majority of $votes votes")
    }
    // the majority-kept count is bounded by single-gate counts:
    // stricter than the laxest gate, laxer than the intersection
    val kept = rows.filter(_._6).map(_._5).sum
    val laxest = Seq(
      rows.filter(_._1).map(_._5).sum, rows.filter(_._2).map(_._5).sum,
      rows.filter(_._3).map(_._5).sum, rows.filter(_._4).map(_._5).sum)
    val allFour = rows.filter(r => r._1 && r._2 && r._3 && r._4)
      .map(_._5).sum
    assert(kept <= laxest.max && kept >= allFour,
      s"majority-kept $kept outside [$allFour, ${laxest.max}]")
  }

  test("pipeline_curriculum: stages are DISJOINT, decile gates hold " +
      "(anneal<=2, bulk<=8, bottom 20% never trains), and each " +
      "lang's draw overshoots its budget by at most one document") {
    val (anneal, bulk) = PipelineQueries.curriculumDraws(spark, sf)
    val a = anneal.select(col("doc_id"), col("lang"), col("decile"),
      col("n_tok")).collect()
    val b = bulk.select(col("doc_id"), col("lang"), col("decile"),
      col("n_tok")).collect()
    assert(a.nonEmpty && b.nonEmpty)
    val aIds = a.map(_.getLong(0)).toSet
    assert(!b.exists(r => aIds(r.getLong(0))),
      "a document must never appear in both stages")
    assert(a.forall(_.getLong(2) <= 2), "anneal draws top-2 deciles only")
    assert(b.forall(_.getLong(2) <= 8), "bulk must exclude deciles 9-10")
    def checkBudget(rows: Array[org.apache.spark.sql.Row],
        budget: Long, name: String): Unit =
      rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
        val tot = rs.map(_.getLong(3)).sum
        val maxDoc = rs.map(_.getLong(3)).max
        assert(tot < budget + maxDoc,
          s"$name/$lang: $tot tokens overshoots budget $budget by " +
            s"more than the last admitted doc")
      }
    checkBudget(a, PipelineQueries.CURR_ANNEAL_BUDGET, "anneal")
    checkBudget(b, PipelineQueries.CURR_BULK_BUDGET, "bulk")
    // partition invariance: the card is identical after a reshuffle
    val card1 = PipelineQueries.pipelineCurriculum(spark, sf)
      .orderBy("stage", "lang").collect().map(_.toString).toSeq
    val card2 = PipelineQueries.pipelineCurriculum(spark, sf)
      .repartition(7).orderBy("stage", "lang").collect()
      .map(_.toString).toSeq
    assert(card1 == card2, "schedule must be partition-invariant")
    // cache hygiene: repeated invocations must not leak persisted
    // RDDs (ADVICE r17 — the anneal cache outlived the draw)
    val before = spark.sparkContext.getPersistentRDDs.size
    PipelineQueries.pipelineCurriculum(spark, sf).collect()
    PipelineQueries.pipelineCurriculum(spark, sf).collect()
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "each curriculum invocation must release its anneal cache")
  }

  test("pipeline_mix_epochs: the epoch cap binds, repetition " +
      "accounting is exact, and the plan covers every language") {
    val rows = PipelineQueries.pipelineMixEpochs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val langs = graft.Tables.documents(spark, sf)
      .select(col("lang")).distinct().count()
    assert(rows.length == langs, "one plan row per language")
    rows.foreach { case (lang, unique, target, epochs, served, rep) =>
      assert(epochs >= 1 && epochs <= PipelineQueries.MIX_MAX_EPOCHS,
        s"$lang: epochs $epochs outside [1, 4]")
      assert(served <= unique * PipelineQueries.MIX_MAX_EPOCHS,
        s"$lang: served $served exceeds the 4-epoch ceiling")
      assert(served <= target, s"$lang: served beyond the target")
      assert(rep == math.max(served - unique, 0L),
        s"$lang: repeated $rep != served - unique")
      // the cap only bites when the target genuinely needs >4 epochs
      if (served < target)
        assert(target > unique * PipelineQueries.MIX_MAX_EPOCHS,
          s"$lang: shortfall without a binding cap")
    }
  }
}
