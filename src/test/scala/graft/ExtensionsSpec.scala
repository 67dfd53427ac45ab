package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Property tests for the non-oracle extension operators (SURVEY.md §5):
  * LSH recall against exact ground truth, SimHash behavior, winnowing
  * determinism, langid sanity, multimodal plumbing.
  */
class ExtensionsSpec extends SparkSpec {

  test("perceptual near-dup recalls planted feature jitters") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 64-dim sign features well away from the quantize boundary, plus
    // 10 jittered twins that flip at most a couple of signs
    val base = Seq.tabulate(120) { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() * 2 - 1) match {
        case f if math.abs(f) < 0.1f => 0.2f * math.signum(f + 0.01f)
        case f => f
      }))
    }
    val twins = Seq.tabulate(10) { i =>
      (500L + i, base(i)._2.map(f => f + 0.02f * rnd.nextFloat()))
    }
    val feats = (base ++ twins).toDF("doc_id", "features")
    val pairs = graft.operators.MultimodalQueries
      .multimodalNearDupFrom(feats)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0 until 10).count(i => pairs.contains((i.toLong, 500L + i)))
    assert(found >= 9, s"only $found/10 planted media twins recalled")
    // distant vectors must not flood in: pair count stays near the
    // planted set (the 16-bit bands make random collisions ~n²/2¹⁶)
    assert(pairs.size <= 30, s"too many pairs: ${pairs.size}")
  }

  test("minhash LSH recalls planted near-dups found by exact jaccard") {
    val exact = DedupQueries.dedupNgramJaccard(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupQueries.dedupNearMinhash(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data must contain planted near-dups")
    // recall is judged on CO-MEMBERSHIP, not raw pairs: the LSH path
    // emits star edges (member→representative) for verbatim copies
    // instead of the old redundant intra-class cliques, so an exact
    // pair counts as recalled when both ends land in one LSH
    // component — the information a dedup consumer actually uses
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    lsh.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.update(math.max(ra, rb), math.min(ra, rb))
    }
    val recalled = exact.count { case (a, b) =>
      (lsh.contains((a, b))) || find(a) == find(b)
    }
    val recall = recalled.toDouble / exact.size
    assert(recall >= 0.9,
      s"LSH recall $recall < 0.9 (exact=${exact.size}, lsh=${lsh.size})")
    // verification step means no false positives below threshold
    assert(lsh.forall { case (a, b) => a < b })
  }

  test("simhash: near-identical docs collide, distinct docs don't") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different content about spark query engines here")
    ).toDF("doc_id", "text")
    val sigs = docs.select(col("doc_id"),
      graft.functions.TextFunctions.simhash64(split(col("text"), " ")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) <= 12, "one-word edit must stay close")
    assert(ham(sigs(1L), sigs(3L)) > 12, "unrelated docs must be far")
  }

  test("winnowing fingerprint is deterministic and shift-tolerant") {
    import spark.implicits._
    val w = graft.functions.TextFunctions.winnow()
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "PREFIX alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("id", "text").select(col("id"), w(col("text")).as("fp"))
    val fps = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1L) == fps(2L), "identical text ⇒ identical fingerprint")
    val overlap = fps(1L).toSet.intersect(fps(3L).toSet).size.toDouble /
      fps(1L).toSet.size
    assert(overlap > 0.7, s"shifted text keeps most grams ($overlap)")
  }

  test("langid identifies real-language samples") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy that day"),
      ("es", "el perro corre en la casa y los gatos del barrio"),
      ("fr", "le chien et les chats de la maison du quartier"),
      ("de", "der hund und die katze in den garten von zu hause"),
      ("zh", "火 花 查 询 引 擎")
    ).toDF("expected", "text")
    val got = samples.select(col("expected"),
      graft.functions.TextFunctions.langId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("ANN LSH top-10 overlaps exact brute-force top-10") {
    val exact = SimilarityQueries.simTopkCosine(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val ann = SimilarityQueries.simAnnLsh(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // query vector itself always present; require meaningful overlap
    val recall = exact.intersect(ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"ANN recall@10 = $recall too low")
    assert(ann.contains(0L), "query vector must match itself")
  }

  test("multimodal pipeline: stub decode preserves schema and batch shape") {
    import graft.multimodal.MediaPipeline
    val recs = MediaPipeline.mediaRecords(spark, sf)
    val feats = MediaPipeline.extractFeatures(recs, new MediaPipeline.StubDecoder(8))
    val rows = feats.collect()
    assert(rows.length == recs.count())
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(r => r.n_bytes > 0))
    // deterministic: same payload → same features
    val again = MediaPipeline.extractFeatures(recs, new MediaPipeline.StubDecoder(8))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    rows.foreach(r => assert(again(r.doc_id) == r.features.toSeq))
  }

  test("multimodal frame-sample and resize stages") {
    import graft.multimodal.MediaPipeline
    val recs = MediaPipeline.mediaRecords(spark, sf)
    val frames = MediaPipeline.frameSample(recs, frameBytes = 32, stride = 4)
      .collect()
    assert(frames.nonEmpty)
    frames.foreach { f =>
      assert(f.n_frames == f.frames.length)
      // every kept frame except possibly the last is frame-sized
      f.frames.dropRight(1).foreach(fr => assert(fr.length == 32))
    }
    // stride 4 keeps ceil(total/4) frames
    val rec0 = recs.filter(_.doc_id == 0L).head()
    val total0 = (rec0.payload.length + 31) / 32
    val kept0 = frames.find(_.doc_id == 0L).get.n_frames
    assert(kept0 == (total0 + 3) / 4, s"$kept0 vs total $total0")

    val feats = MediaPipeline.extractFeatures(recs, new MediaPipeline.StubDecoder(8))
    val up = MediaPipeline.resizeFeatures(feats, 16).collect()
    assert(up.forall(_.features.length == 16))
    assert(up.forall(_.features.drop(8).forall(_ == 0.0f)), "zero-padded")
    val down = MediaPipeline.resizeFeatures(feats, 4).collect()
    assert(down.forall(_.features.length == 4))
  }

  test("dedup_exact keeps exactly one row per distinct text") {
    val df = DedupQueries.dedupExact(spark, sf)
    val total = Tables.documents(spark, sf).count()
    val sumCopies = df.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(sumCopies == total)
    assert(df.count() == Tables.documents(spark, sf).select("text").distinct().count())
  }
}
