package graft.operators

import graft.SparkSpec

/** The property rand()-sampling lacks: hash sampling returns the SAME
  * rows regardless of partitioning or rerun. */
class SampleSpec extends SparkSpec {

  test("hash sample is stable across reruns and partitionings") {
    val a = SampleQueries.sampleHashFraction(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val b = SampleQueries.sampleHashFraction(spark, sf)
      .repartition(17)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    // splits partition the corpus: disjoint and complete
    val splits = SampleQueries.sampleSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits.values.sum ==
      graft.Tables.documents(spark, sf).count())
    // stratified quota: exactly 12 per language
    val perLang = SampleQueries.sampleStratified(spark, sf)
      .groupBy("lang").count().collect().map(_.getLong(1))
    assert(perLang.nonEmpty && perLang.forall(_ == 12L))
  }

  test("epoch shuffle: full schedule complete per epoch at any shard count") {
    val docs = graft.Tables.documents(spark, sf).select("doc_id")
    val n = docs.count()
    // full schedule (headPerShard = None) with a non-default shard
    // count: every doc exactly once per epoch, ranks contiguous per
    // (epoch, shard)
    val full = SampleQueries.epochShuffleFrom(docs, nEpochs = 2,
      nShards = 16, headPerShard = None).cache()
    try {
      assert(full.count() == 2 * n)
      assert(full.groupBy("epoch").count().collect()
        .forall(_.getLong(1) == n))
      assert(full.select("epoch", "doc_id").distinct().count() == 2 * n)
      val maxRankSum = full.groupBy("epoch", "shard")
        .agg(org.apache.spark.sql.functions.max("rank").as("m"))
        .groupBy("epoch")
        .agg(org.apache.spark.sql.functions.sum("m").as("t"))
        .collect()
      assert(maxRankSum.forall(_.getLong(1) == n),
        "ranks are contiguous 1..shardSize within every shard")
      // epochs genuinely reshuffle: the two epoch orders differ
      val headsByEpoch = full.filter(org.apache.spark.sql.functions
          .col("rank") === 1)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getInt(1), r.getLong(3))).toSet).toMap
      assert(headsByEpoch(0L) != headsByEpoch(1L))
    } finally full.unpersist()
    // shard sizing scales with the corpus and stays bounded
    assert(SampleQueries.epochShuffleShards(1000L) == 1)
    assert(SampleQueries.epochShuffleShards(5L << 20) == 5)
    assert(SampleQueries.epochShuffleShards(Long.MaxValue) == (1 << 20))
  }

  test("temperature weights flatten the mixture toward low-resource languages") {
    val rows = SampleQueries.sampleTemperature(spark, sf).collect()
    val p = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    val q = rows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    // both weight columns are distributions (to rounding)
    assert(math.abs(p.values.sum - 1.0) < 1e-2)
    assert(math.abs(q.values.sum - 1.0) < 1e-2)
    // α<1 moves mass from the richest language to the poorest
    val hi = p.maxBy(_._2)._1
    val lo = p.minBy(_._2)._1
    assert(q(lo) > p(lo) && q(hi) < p(hi))
  }

  test("token-budget draw spends the budget with at most one doc of overshoot") {
    import org.apache.spark.sql.functions._
    val res = SampleQueries.sampleTokenBudget(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val stats = graft.Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("lang"))
      .agg(sum(col("n")).as("tot"), max(col("n")).as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(res.keySet == stats.keySet)
    res.foreach { case (lang, (nDocs, nTok, budget)) =>
      val (tot, mx) = stats(lang)
      if (tot >= budget) assert(nTok >= budget) // budget fully spent
      assert(nTok < budget + mx) // kept docs START under budget
      assert(nDocs > 0)
    }
    // deterministic: the same draw on a rerun
    val again = SampleQueries.sampleTokenBudget(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(again == res.map { case (k, v) => k -> v._2 })
  }
  test("sample_cluster_balanced: exact admission set, small clusters whole") {
    val out = SampleQueries.sampleClusterBalanced(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, _, bucket, n) => assert(bucket * n < 32000L) }
    // independent recompute from the assignment table + a JVM sha256
    val assign = SimilarityQueries.embKmeansAssign(spark, sf)
      .select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sizes = assign.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def bucket(v: Long): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(v.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) % 1000L
    }
    val expected = assign
      .filter { case (v, c) => bucket(v) * sizes(c) < 32000L }
      .map { case (v, c) => (c, v) }.toSet
    assert(out.map(t => (t._1, t._2)).toSet == expected)
    // every cluster at or under the 32-target is admitted whole
    sizes.filter(_._2 <= 32L).keys.foreach { c =>
      assert(out.count(_._1 == c).toLong == sizes(c), s"cluster $c not whole")
    }
    // and the draw is balanced: no admitted cluster exceeds ~target
    // by more than binomial noise (4 sigma at p=32/n)
    out.groupBy(_._1).foreach { case (c, rows) =>
      val n = sizes(c).toDouble
      if (n > 32) {
        val sd = math.sqrt(n * (32000.0 / n / 1000.0) * (1 - 32.0 / n))
        assert(rows.length <= 32 + 4 * sd + 1, s"cluster $c over-drawn")
      }
    }
  }

  test("emb_cluster_card: one card per cluster with consistent " +
      "integer invariants") {
    import org.apache.spark.sql.functions._
    val card = SimilarityQueries.embClusterCard(spark, sf).collect()
    val assign = SimilarityQueries.embKmeansAssign(spark, sf)
      .select("vec_id", "cid").collect()
    val byCid = assign.groupBy(_.getLong(1)).view.mapValues(_.length)
    // one row per non-empty cluster; sizes fold back to the corpus
    assert(card.map(_.getLong(0)).toSet == byCid.keys.toSet)
    assert(card.map(_.getLong(1)).sum == assign.length)
    card.foreach { r =>
      assert(r.getLong(1) == byCid(r.getLong(0)).toLong)
      val pct = r.getLong(3)
      assert(pct >= 0 && pct <= 100, s"label_pct out of range: $r")
      val terms = r.getString(4)
      assert(terms.isEmpty || terms.split(" ").length <= 3)
    }
    // distinctive-term rule: no reported term appears in more than
    // half of all member documents
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id").as("vec_id"), col("text"))
      .join(SimilarityQueries.embKmeansAssign(spark, sf)
        .select("vec_id"), Seq("vec_id"))
      .collect().map(r => r.getString(1))
    val n = docs.length
    card.flatMap(_.getString(4).split(" ")).filter(_.nonEmpty)
      .distinct.foreach { t =>
        val df = docs.count(_.split(" ").contains(t))
        assert(df * 2 <= n, s"term '$t' is boilerplate (df=$df of $n)")
      }
  }
}
