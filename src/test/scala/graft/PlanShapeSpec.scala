package graft

import graft.operators._

/** Physical-plan regression tests (SCALE.md's claims, executable):
  * pushdown reaches the scans, dim joins broadcast, bucketized
  * overlap joins never become nested-loop joins, top-k never becomes
  * a global sort. A refactor that silently degrades a plan fails here
  * long before a benchmark notices.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scans receive pushed filters and pruned schemas") {
    val p = plan(RelationalQueries.srcParquet(spark, sf))
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(p_size,25)"), p)
    assert(!p.contains("p_retailprice"), "unused columns must be pruned")
    val q1 = plan(RelationalQueries.q1Pricing(spark, sf))
    assert(q1.contains("LessThanOrEqual(l_shipdate"), "date bound pushed")
  }

  test("intersects search pushes its envelope prefilter into the scan") {
    import java.nio.file.Files
    import graft.catalog.{CatalogQuery, CatalogStore, ItemAssembly}
    val path = Files.createTempDirectory("graft-ixplan").toString + "/items"
    val (items, _) = ItemAssembly.assemble(
      new graft.ingest.FixtureGranuleSource(end = "2022-05-01 00:59:59")
        .granules(spark))
    CatalogStore.write(items, path)
    val box = """{"type":"Polygon","coordinates":
      [[[0,0],[10,0],[10,10],[0,10],[0,0]]]}""".replaceAll("\\s", "")
    val p = plan(CatalogQuery.compile(CatalogStore.read(spark, path),
      CatalogQuery.Search(intersects = Some(box), limit = 10)))
    // the pgstac index-then-recheck shape: the envelope lands in the
    // parquet scan as pushed row-group predicates (the toString
    // truncates the PushedFilters list, so match its prefix), the
    // exact-geometry UDF runs only on the surviving candidates, and
    // no exchange separates scan from filter
    assert(p.contains("PushedFilters: [IsNotNull(bbox_w)"), p)
    assert(p.contains("LessThanOrEqual(bbox") || p.contains("bbox_w#"), p)
    assert(p.contains("UDF(geometry"), "exact recheck present")
    assert(!p.contains("Exchange"), "search is scan→filter→topk, no shuffle")
  }

  test("catalog_search_core plans as scan→filter→topk with pushdown") {
    val p = plan(SourceSinkQueries.catalogSearchCore(spark, sf))
    // sort+limit must fold into one TakeOrderedAndProject — a global
    // Sort here would materialize the whole filtered catalog at scale
    assert(p.contains("TakeOrderedAndProject"), p)
    // the collection and price predicates reach the parquet scan as
    // pushed row-group filters (prefix-match: toString truncates)
    assert(p.contains("PushedFilters: [IsNotNull("), p)
    // no shuffle: predicates + keyset token evaluate in the scan stage
    assert(!p.contains("Exchange"), "search core must not shuffle")
  }

  test("dimension joins broadcast, never shuffle the small side") {
    val p = plan(JoinQueries.joinBroadcastDim(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    val fk = plan(JoinQueries.joinFkItemsCollections(spark, sf))
    assert(fk.contains("BroadcastHashJoin"), "nation/region broadcast")
  }

  test("bucketized overlap joins are equi-joins, not nested loops") {
    Seq(
      plan(JoinQueries.joinIntervalOverlap(spark, sf)),
      plan(JoinQueries.joinBboxIntersect(spark, sf))
    ).foreach { p =>
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("global top-k uses TakeOrderedAndProject, not a full sort") {
    val p = plan(RelationalQueries.topkGlobal(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("similarity pair joins stay hash/sort-merge on their block keys") {
    val p = plan(SimilarityQueries.simPairwiseThreshold(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") ||
      // 1-row query-vector broadcasts are legitimate BNLJ
      p.contains("label"), p)
    assert(p.contains("Join"), p)
    val mh = plan(DedupQueries.dedupNearMinhash(spark, sf))
    assert(!mh.contains("CartesianProduct"), mh)
  }

  test("bloom-incremental exact stage joins broadcast-only") {
    // the whole point of dedup_incremental_bloom: the exact stage
    // must confirm candidates via BROADCAST semi-joins (map-side over
    // one corpus scan), never a corpus-wide shuffle join on the hash
    val df = DedupQueries.dedupIncrementalBloom(spark, sf)
    df.collect() // AQE finalizes on execution
    val p = df.queryExecution.executedPlan.toString
    val broadcastJoins =
      "BroadcastHashJoin.*LeftSemi".r.findAllIn(p).size
    assert(broadcastJoins >= 2,
      s"want both semi-joins broadcast, found $broadcastJoins:\n$p")
    assert(!"SortMergeJoin.*\\[h".r.findFirstIn(p).isDefined,
      "corpus hash must never ride a shuffle join")
  }

  test("flagship aggregation runs inside whole-stage codegen") {
    val df = RelationalQueries.q1Pricing(spark, sf)
    df.collect() // AQE finalizes the plan only on execution
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the final plan
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
    assert(p.contains("HashAggregate"), "partial+final hash agg")
  }

  test("decontamination broadcasts the benchmark grams, never shuffles the corpus explode") {
    val p = plan(DedupQueries.dedupDecontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    // the corpus gram explosion must reach the join map-side: in the
    // printed tree the corpus branch precedes the BroadcastExchange,
    // and it must contain no gram-keyed shuffle (the benchmark side's
    // distinct under the broadcast legitimately has one)
    val corpusSide = p.split("BroadcastExchange")(0)
    assert(!corpusSide.contains("Exchange hashpartitioning(gh"), p)
  }

  test("z-order key is pure codegen integer arithmetic") {
    val df = RelationalQueries.sortZorder(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("Generate"), p)
  }

  test("co-bucketed fact tables join and aggregate with zero exchanges") {
    import org.apache.spark.sql.functions._
    val o = graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
    val l = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(l, "b_lineitem", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem",
          "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      j.collect() // AQE finalizes on execution
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join+agg must not shuffle:\n$p")
      // and it computes exactly what the shuffling join computes
      val plain = o.join(l, "o_orderkey")
        .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
      assert(j.except(plain).isEmpty && plain.except(j).isEmpty)
      // the pre-write repartition makes the layout one file per
      // bucket, not tasks × buckets slivers
      val loc = spark.sql("DESCRIBE EXTENDED b_orders")
        .filter(col("col_name") === "Location")
        .first().getString(1).stripPrefix("file:")
      val parts = new java.io.File(loc)
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts == 8, s"want 8 bucket files, found $parts")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("per-document kernels are shuffle-free; packer shuffles exactly once") {
    // entropy and html-strip never leave the row: a single scan →
    // project, NO Exchange anywhere in the plan
    Seq(
      plan(TextQueries.textEntropy(spark, sf)),
      plan(TextQueries.textHtmlStrip(spark, sf))
    ).foreach { p =>
      assert(!p.contains("Exchange"), s"per-doc kernel must not shuffle:\n$p")
    }
    // histogram: map-side partial agg then one exchange to ~30 buckets
    val h = plan(TextQueries.textLengthHistogram(spark, sf))
    assert(h.sliding("Exchange".length).count(_ == "Exchange") <= 2, h)
    // packer: exactly ONE shuffle — the (lang, shard) window sort
    val pk = plan(TextQueries.textPackSequences(spark, sf))
    assert(pk.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"packer must shuffle once on (lang, shard):\n$pk")
    assert(pk.contains("Window"), pk)
    // outliers: stats and centroids come back BROADCAST; the corpus
    // itself is never exchanged by the scoring joins
    val o = plan(SimilarityQueries.embOutliers(spark, sf))
    assert(o.contains("BroadcastHashJoin"), o)
    assert(!o.contains("SortMergeJoin"), s"corpus must not shuffle-join:\n$o")
  }

  test("quantize audit is shuffle-free; BPE top-k heaps instead of sorting") {
    // int8 audit: pure per-row expressions — a scan-speed pass with
    // NO Exchange (SCALE.md's 'audits 100 TB at scan speed')
    val q = plan(SimilarityQueries.embQuantizeInt8(spark, sf))
    assert(!q.contains("Exchange"), s"quantize audit must not shuffle:\n$q")
    // BPE pair count: one map-side-combined agg exchange, then the
    // global top-20 via per-partition heaps — never a global Sort
    val b = plan(TextQueries.textBpePairs(spark, sf))
    assert(b.contains("TakeOrderedAndProject"), b)
    assert(b.sliding("Exchange".length).count(_ == "Exchange") <= 1, b)
    // temperature weights: corpus collapses in the FIRST agg; the Σ
    // join must be a broadcast of the 1-row aggregate
    val t = plan(SampleQueries.sampleTemperature(spark, sf))
    assert(t.contains("BroadcastNestedLoopJoin") ||
      t.contains("BroadcastHashJoin"), t)
    assert(!t.contains("SortMergeJoin"), t)
  }

  test("bm25 prunes terms pre-shuffle, broadcasts stats, heaps the top-k") {
    val p = plan(TextQueries.textBm25(spark, sf))
    // the df (≤|query| rows) and corpus-stats (1 row) joins broadcast;
    // the doc-length join may go either way at this SF, but nothing
    // may sort-merge the exploded term stream
    assert(p.contains("BroadcastHashJoin"), p)
    // global top-20 is a per-partition heap + driver merge
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Sort ["), "no global sort for a top-k")
    // the query-term filter runs before the tf aggregation's exchange:
    // the isin predicate must sit under the first HashAggregate
    // structural, not string positions (the printed tree interleaves
    // several branches): the term-prune Filter's SUBTREE must hold no
    // aggregate or exchange — i.e. the prune sits directly on the
    // exploded scan, BEFORE the tf aggregation's shuffle
    // collect() does not descend into the AQE wrapper — unwrap it
    val exec = TextQueries.textBm25(spark, sf).queryExecution
      .executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case o => o
    }
    val prunes = exec.collect {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.toString.contains("spark") => f
    }
    assert(prunes.nonEmpty, s"no term-prune Filter in:\n$p")
    prunes.foreach { f =>
      val above = f.collect {
        case n if n.nodeName.contains("HashAggregate") ||
          n.nodeName.contains("Exchange") => n.nodeName
      }
      assert(above.isEmpty,
        s"term prune must run pre-shuffle, found $above beneath it")
    }
  }

  private def exchanges(p: String): Int =
    p.sliding("Exchange".length).count(_ == "Exchange")

  test("as-of joins compile to one user-keyed window, never a join") {
    // the 100 TB scale path: union both sides, ONE shuffle on user_id,
    // running max inside a window — a range/theta join here would carry
    // every (error, signup) pair through the exchange
    Seq(
      JoinQueries.joinAsofNearest(spark, sf),
      JoinQueries.joinAsofTolerance(spark, sf)
    ).foreach { df =>
      val p = plan(df)
      assert(!p.contains("Join"), s"asof must be a window, not a join:\n$p")
      assert(p.contains("Window"), p)
      assert(exchanges(p) == 1, s"exactly one user_id shuffle:\n$p")
      // the event-type prefilter reaches the parquet scan as a pushed
      // row-group predicate — the window never sees other event types
      assert(p.contains("In(event_type"), s"event_type not pushed:\n$p")
    }
  }

  test("event windows shuffle once on their partition keys") {
    // every §2.6 window over the events log is user-keyed: one
    // Exchange, then sort+window within partitions — no second shuffle
    Seq(
      WindowQueries.winRunning(spark, sf),
      WindowQueries.winDedupRank(spark, sf),
      WindowQueries.winGapDetect(spark, sf)
    ).foreach { df =>
      val p = plan(df)
      assert(p.contains("Window"), p)
      assert(exchanges(p) == 1, s"exactly one keyed shuffle:\n$p")
    }
  }

  test("containment is one linear pipeline: single corpus scan, no joins") {
    // the winnow explode is the expensive stage — the plan must scan
    // and fingerprint the corpus exactly once (the old self-join form
    // re-ran it four times) and never join corpus-sized frames
    val p = plan(TextQueries.textContainment(spark, sf))
    assert(!p.contains("Join"), s"containment must not self-join:\n$p")
    val winnowScans = "scan parquet".r.findAllIn(p.toLowerCase).size
    assert(winnowScans == 1, s"corpus must be scanned once, saw $winnowScans:\n$p")
    assert(exchanges(p) <= 4, s"pipeline grew a shuffle:\n$p")
  }

  test("NB scoring joins broadcast the model; the corpus side never " +
      "sort-merges") {
    // the trained classifiers' scale contract: every model table
    // (counts, totals, vocab size, priors) travels as a broadcast —
    // a SortMergeJoin here would shuffle the exploded gram/token
    // corpus once per model table
    Seq(
      TextQueries.textNbClassify(spark, sf),
      TextQueries.textLangidNb(spark, sf)
    ).foreach { df =>
      val p = plan(df)
      assert(!p.contains("SortMergeJoin"),
        s"model join degraded to a corpus shuffle:\n$p")
      assert(p.contains("BroadcastHashJoin"), p)
      assert(p.contains("HashAggregate"),
        s"partial aggregation expected:\n$p")
    }
  }

  test("BPE trainer rounds start from a truncated lineage, not a " +
      "corpus re-scan") {
    // each round's working frame must be a LogicalRDD scan (eager
    // localCheckpoint) — if the parquet source or the previous
    // rounds' replace chain leaks back into a round's plan, the
    // superlinear-planner regression (0.6→24 s/round at sf0.1) has
    // returned
    var rounds = 0
    val merges = TextQueries.bpeTrainMergesFrom(
      graft.Tables.documents(spark, sf),
      onRound = (r, words) => {
        rounds = r
        val p = plan(words)
        assert(p.contains("ExistingRDD"),
          s"round $r frame is not checkpointed:\n$p")
        assert(!p.contains("FileScan") && !p.contains("parquet"),
          s"round $r frame re-scans the corpus:\n$p")
        assert(!p.contains("StringReplace") || r == 0,
          s"round $r plan still nests the merge chain:\n$p")
      })
    assert(rounds > 2 && merges.size == rounds,
      "fixture corpus must learn several checkpointed rounds")
  }

  test("substring dedup: winner via groupBy.min — NEVER a window on " +
      "the hot gram key; per-doc work is windowless folds") {
    // a boilerplate gram with 10M occurrences must land in a hash
    // aggregate (partial + final), not a single window partition —
    // and the run coalescing/excision stages are pure expressions,
    // so the whole plan carries ZERO Window operators
    val p = plan(DedupQueries.textSubstringDedupGlobal(spark, sf))
    assert(!p.contains("Window"),
      s"substring dedup grew a window stage:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"gram stats must partial-aggregate:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("funnel and retention stay keyed equi-joins with partial aggs") {
    // funnel stages and the cohort join are all user_id equi-joins —
    // a nested-loop or cartesian here explodes at log scale. (AQE may
    // broadcast the shrinking stage frames at this SF; both hash forms
    // are fine, pair-producing forms are not.)
    Seq(
      EventQueries.winFunnel(spark, sf),
      EventQueries.aggRetention(spark, sf)
    ).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
        s"partial aggregation expected:\n$p")
    }
  }

  test("PCA projection is zero-shuffle: broadcast-literal fold, " +
      "no Exchange, schema pruned to the embedding") {
    val p = plan(SimilarityQueries.embPcaProject(spark, sf))
    assert(!p.contains("Exchange"),
      s"projection must be a map-only pass:\n$p")
    assert(!p.contains("label"),
      "unused embedding columns must be pruned from the scan")
  }

  test("Gopher rule card is one map-only pass over the documents scan") {
    val p = plan(TextQueries.textGopherRules(spark, sf))
    assert(!p.contains("Exchange"),
      s"row-local rule card must not shuffle:\n$p")
    // higher-order-function projections (aggregate/filter lambdas)
    // sit outside whole-stage codegen by Spark design — the pin here
    // is the SCAN shape: only (doc_id, text) read, nothing else
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan must be pruned to (doc_id, text):\n$p")
  }

  test("count-min build shuffles only the D*W-bounded register " +
      "aggregate with a map-side partial") {
    import org.apache.spark.sql.functions.col
    val regs = RelationalQueries.cmsRegisters(
      graft.Tables.events(spark, sf).select(col("user_id")))
    val p = plan(regs)
    assert(p.contains("HashAggregate"), s"hash agg expected:\n$p")
    // exactly one exchange: the partial->final register aggregation
    assert("Exchange".r.findAllIn(p).size == 1,
      s"register build must shuffle exactly once:\n$p")
  }
}
