package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{SimilarityQueries, SkewUtils}
import graft.streaming.StreamingOps

class ScaleUtilsSpec extends SparkSpec {

  test("IVF ANN recalls a meaningful share of exact top-10") {
    val exact = SimilarityQueries.simTopkCosine(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val ivf = SimilarityQueries.simAnnIvf(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.contains(0L), "query vector matches itself")
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    // Deterministic pipeline (hash sample + one Lloyd step, fixed
    // probe set): measured 0.6 at sf0.001 / 0.8 at sf0.01 with
    // IVF_ASSIGN=2, nprobe=k/4. Floor 0.5 leaves headroom for data
    // regen, not for algorithm regressions.
    assert(recall >= 0.5, s"IVF recall@10 = $recall too low")
    assert(ivf.size == 10)
  }

  test("ANN recall@10 holds at the bench scale (sf0.1)", SlowTest) {
    // The fast tests pin recall at sf0.001/sf0.01; probe constants
    // (nprobe, bucket caps, band widths) must also hold at the scale
    // the driver benches — a 100× corpus with the same constants is
    // exactly where ANN recall silently collapses.
    val big = "/root/testdata/sf0.1"
    val exact = SimilarityQueries.simTopkCosine(spark, big)
      .collect().map(_.getLong(0)).toSet
    val lsh = SimilarityQueries.simAnnLsh(spark, big)
      .collect().map(_.getLong(0)).toSet
    val ivf = SimilarityQueries.simAnnIvf(spark, big)
      .collect().map(_.getLong(0)).toSet
    val lshRecall = exact.intersect(lsh).size.toDouble / exact.size
    val ivfRecall = exact.intersect(ivf).size.toDouble / exact.size
    assert(lshRecall >= 0.6, s"LSH recall@10 = $lshRecall at sf0.1")
    assert(ivfRecall >= 0.6, s"IVF recall@10 = $ivfRecall at sf0.1")
  }

  test("k-means recovers planted orthogonal blobs with pure clusters") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // three tight blobs around orthogonal axes in R^16 — any cluster
    // that merged two blobs would have avg cosine ≈ 0.7 to its mean,
    // a pure tight blob stays ≥ 0.9
    val vecs = for {
      blob <- 0 until 3
      i <- 0 until 60
    } yield {
      val v = Array.fill(16)(rnd.nextGaussian() * 0.05)
      v(blob * 5) += 1.0
      ((blob * 60 + i).toLong, s"b$blob", v.toSeq.map(x => x.toFloat))
    }
    val e = vecs.toDF("vec_id", "label", "embedding")
    val out = SimilarityQueries
      .embKmeansFrom(
        e.select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("emb"))
          .withColumn("nrm",
            graft.functions.ArrayDot.l2Norm(col("emb"))), 3)
      .collect()
    assert(out.map(_.getLong(1)).sum == 180, "every vector clustered")
    assert(out.length <= 3)
    out.foreach { r =>
      assert(r.getDouble(2) >= 0.9,
        s"cluster ${r.getLong(0)} avg_cos ${r.getDouble(2)} — merged blobs?")
    }
  }

  test("emb_kmeans and the IVF audit are repartition-invariant " +
      "(the determinism the recompute oracles rest on)") {
    // The float mean was the one order-dependent step in distributed
    // Lloyd; the 2^24-grid integer sums make every partitioning of
    // the corpus produce bit-identical centroids, assignments, and
    // aggregates. Exercised through the two public surfaces that
    // fold over refineCentroids output.
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val base = graft.Tables.embeddings(spark, sf)
    def kmeansOf(parts: Int) = SimilarityQueries.embKmeansFrom(
      base.repartition(parts)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("emb"))
        .withColumn("nrm",
          graft.functions.ArrayDot.l2Norm(col("emb"))), 8)
    assert(canon(kmeansOf(1)) == canon(kmeansOf(13)),
      "kmeans output drifted across partitionings")
    assert(canon(kmeansOf(13)).nonEmpty)
    // the per-vector assign table must reconcile with the summary:
    // same clusters, same member counts
    val summary = SimilarityQueries.embKmeans(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val assign = SimilarityQueries.embKmeansAssign(spark, sf)
      .groupBy(col("cid")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign == summary,
      s"assign counts $assign != summary counts $summary")
  }

  test("salted join equals plain join") {
    val li = Tables.lineitem(spark, sf).select(col("l_partkey"), col("l_quantity"))
    val p = Tables.part(spark, sf).select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = li.join(p, Seq("l_partkey")).count()
    val salted = SkewUtils.saltedInnerJoin(li, p, "l_partkey", salts = 4).count()
    assert(salted == plain, s"salted=$salted plain=$plain")
  }

  test("streaming heavy hitters equals the batch sketch across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val events = mem.toDF().toDF("event_type", "user_id")
    val q = StreamingOps.heavyHittersStream(events, capacity = 64, k = 3)
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("update").start()
    val batch1 = Seq(("click", 1L), ("click", 1L), ("click", 2L),
      ("view", 9L))
    val batch2 = Seq(("click", 1L), ("click", 3L), ("click", 3L),
      ("click", 3L), ("view", 9L), ("view", 8L))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    // per-item counts are MONOTONE across updates, so max(n) is the
    // final sketch value — exact regime (distinct << capacity) means
    // stream state must equal true counts
    val byItem = spark.table("hh_stream")
      .groupBy(col("key"), col("item"))
      .agg(org.apache.spark.sql.functions.max(col("n")).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byItem(("click", 1L)) == 3L && byItem(("click", 3L)) == 3L &&
      byItem(("click", 2L)) == 1L, s"got $byItem")
    assert(byItem(("view", 9L)) == 2L && byItem(("view", 8L)) == 1L)
    // the final batch's emission carries the converged ranking:
    // (n desc, item asc) → click: item1, item3, item2
    val finalRows = spark.table("hh_stream")
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(finalRows.contains(("click", 1, 1L, 3L)), s"got $finalRows")
    assert(finalRows.contains(("click", 2, 3L, 3L)), s"got $finalRows")
    assert(finalRows.contains(("click", 3, 2L, 1L)), s"got $finalRows")
    assert(finalRows.contains(("view", 1, 9L, 2L)), s"got $finalRows")
  }

  test("streaming quantiles equal the batch sketch after replay") {
    import spark.implicits._
    import graft.functions.QuantileSketchAgg
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val rows = (0 until 600).map { i =>
      (if (i % 3 == 0) "O" else "F", 10.0 + rnd.nextDouble() * 1000)
    }
    val mem = MemoryStream[(String, Double)]
    val events = mem.toDF().toDF("o_orderstatus", "o_totalprice")
    val q = StreamingOps.quantilesStream(events)
      .writeStream.format("memory").queryName("q_stream")
      .outputMode("update").start()
    // replay in three uneven micro-batches
    mem.addData(rows.take(100): _*)
    q.processAllAvailable()
    mem.addData(rows.slice(100, 350): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(350): _*)
    q.processAllAvailable()
    q.stop()
    // last emission per key (max n — counts are monotone) must equal
    // the one-pass batch sketch EXACTLY: same kernel, bucket-additive,
    // merge-order independent under budget
    val streamed = spark.table("q_stream")
      .orderBy(org.apache.spark.sql.functions.col("n").desc)
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.head }
    for ((key, group) <- rows.groupBy(_._1)) {
      val sk = new QuantileSketchAgg.Sketch
      group.foreach { case (_, x) =>
        QuantileSketchAgg.update(sk, x, QuantileSketchAgg.ALPHA,
          QuantileSketchAgg.MAX_BUCKETS)
      }
      val r = streamed(key)
      assert(r.getLong(1) == group.length.toLong)
      for ((qq, idx) <- Seq(0.50 -> 2, 0.90 -> 3, 0.99 -> 4)) {
        val batch = QuantileSketchAgg.quantile(sk, qq, QuantileSketchAgg.ALPHA)
        assert(r.getDouble(idx) == batch,
          s"$key q=$qq stream=${r.getDouble(idx)} batch=$batch")
      }
    }
  }

  test("streaming weighted reservoir converges to the batch draw") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 400L).map(i =>
      (s"l${i % 3}", i, 40 + (i * 7 % 300).toInt)) // (lang, doc_id, n_chars)
    val mem = MemoryStream[(String, Long, Int)]
    val docs = mem.toDF().toDF("lang", "doc_id", "n_chars")
    val q = StreamingOps.weightedReservoirStream(docs, k = 5)
      .writeStream.format("memory").queryName("res_stream")
      .outputMode("update").start()
    mem.addData(rows.take(150): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(150): _*)
    q.processAllAvailable()
    // at-least-once re-delivery: the same rows again must be a no-op
    // (last-write-wins per doc_id), not occupy extra reservoir slots
    mem.addData(rows.take(60): _*)
    q.processAllAvailable()
    q.stop()
    // batch reference: same key arithmetic over the full set
    val batch = spark.createDataset(rows).toDF("lang", "doc_id", "n_chars")
      .selectExpr("lang", "doc_id",
        s"${graft.operators.SampleQueries.AES_KEY_SQL} AS key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (lang, rs) =>
        lang -> rs.sortBy(r => (r._3, r._2)).take(5)
          .map(r => (r._2, r._3)).toSeq
      }
    // the stream's LAST emission per (lang, rk) is the converged state
    val streamed = spark.table("res_stream")
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), r.getDouble(3)))
      .groupBy(t => (t._1, t._2)).map { case (_, ts) => ts.last }
      .toSeq.groupBy(_._1)
      .map { case (lang, ts) =>
        lang -> ts.sortBy(_._2).map(t => (t._3, t._4)).toSeq
      }
    assert(streamed == batch,
      s"stream $streamed\nvs batch $batch")
  }

  test("flatMapGroupsWithState accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val events = mem.toDF().toDF("user_id", "value")
    val q = StreamingOps.statefulUserTotals(events)
      .writeStream.format("memory").queryName("stateful")
      .outputMode("update").start()
    mem.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
    q.processAllAvailable()
    mem.addData((1L, 5.0)) // second batch: state must carry over
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("stateful")
      .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(1L) == ((3L, 10.0)), s"user 1 state: ${rows(1L)}")
    assert(rows(2L) == ((1L, 10.0)))
  }
}
