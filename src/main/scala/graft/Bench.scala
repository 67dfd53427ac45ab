package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional arg: comma-separated query names — time only those
    // (builder-side targeted scale probes; the driver passes no args
    // and gets the full surface).
    val only = args.headOption.map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // 16 MB input splits: several sources are row-multiplying
      // (char-gram/token explodes fan one scanned row to hundreds),
      // so the DEFAULT 128 MB splits cap the whole narrow stage's
      // parallelism at file_size/128MB tasks — the 156 MB sf10
      // documents file ran every explode on TWO tasks of 32 cores
      // (profiled: 4-core and 32-core runs differed only 1.6x).
      // At cluster scale the lake's many files restore parallelism;
      // in a one-file local bench the split size is the only lever.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + codegen + parquet footer caches, so the
    // first measured query doesn't absorb session startup cost.
    // Each warmup/fixture stage logs its wall to stderr so the
    // bench-wall decomposition (sbt wall = startup + THESE untimed
    // builds + the timed query total) is pinned in every run's log,
    // not reconstructed after the fact.
    def staged[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[bench-setup] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    staged("warmup_q1")(
      SparkEntry.queries.get("q1_pricing").foreach(_(spark, sfDir).count()))
    // Force the one-per-JVM index builds during warmup so every indexed
    // qid — sink audits AND serve paths — measures its own cost, not
    // whichever qid happens to sort first. (Before this, alphabetical
    // order made sim_ann_ivf_indexed pay the vector-index build while
    // snk_vector_index measured a bare re-audit.)
    val indexQids = Set("snk_text_index", "text_bm25_indexed",
      "text_bm25_serve_batch", "stream_index_upsert", "sim_hybrid_serve",
      "sim_hybrid_serve_batch", "pipeline_decontaminate_retrieval")
    val vecIndexQids = Set("snk_vector_index", "sim_ann_ivf_indexed",
      "sim_ann_serve_batch", "sim_ann_ivf_audit", "stream_vector_upsert",
      "sim_hybrid_serve", "sim_hybrid_serve_batch",
      "pipeline_decontaminate_retrieval", "sim_mmr_serve")
    if (only.forall(_.exists(indexQids)))
      staged("text_index_build")(graft.operators.TextQueries.buildTextIndex(spark, sfDir))
    if (only.forall(_.exists(vecIndexQids)))
      staged("vector_index_build")(graft.operators.SimilarityQueries.buildVectorIndex(spark, sfDir))
    // the compacted-index fixtures follow the same rule: the qids time
    // the post-compaction audit, not the 3-batch ingest + compaction
    if (only.forall(_.contains("snk_text_index_compact")))
      staged("compacted_text_root")(graft.operators.TextQueries.ensureCompactedTextRoot(spark, sfDir))
    if (only.forall(_.contains("snk_vector_index_compact")))
      staged("compacted_vector_root")(graft.operators.SimilarityQueries.ensureCompactedVectorRoot(spark, sfDir))
    // the delete-qid fixtures too: the qids time the tombstone-aware
    // audit (the serve-visible view), not the ingest + delete cycle
    if (only.forall(_.contains("snk_text_index_delete")))
      staged("deleted_text_root")(graft.operators.TextQueries.ensureDeletedTextRoot(spark, sfDir))
    if (only.forall(_.contains("snk_vector_index_delete")))
      staged("deleted_vector_root")(graft.operators.SimilarityQueries.ensureDeletedVectorRoot(spark, sfDir))
    if (only.forall(_.contains("sim_ann_ivf_rebuild")))
      staged("rebuilt_vector_root")(graft.operators.SimilarityQueries.ensureRebuiltVectorRoot(spark, sfDir))
    if (only.forall(_.contains("sim_ann_ivf_repair")))
      staged("repaired_vector_root")(graft.operators.SimilarityQueries.ensureRepairedVectorRoot(spark, sfDir))
    // same split for the catalog e2e fixtures: the qids measure the
    // CDC diff / HTTP search walk, not fixture construction
    if (only.forall(_.contains("catalog_changelog")))
      staged("changelog_fixture")(graft.operators.SourceSinkQueries.ensureChangelogFixture(spark))
    if (only.forall(_.contains("catalog_api_http")))
      staged("api_catalog_fixture")(graft.operators.SourceSinkQueries.ensureApiCatalog(spark))
    // A throwing query records the sentinel -1 (never its time-to-throw:
    // round 8's bench listed analysis exceptions as the suite's fastest
    // entries) and is surfaced in an "errors" map; errors can only grow
    // the reported total, never shrink it.
    //
    // Contention-proof primary timings (r14 lesson: a machine-contention
    // window wrote 39.9 s against an untouched 0.55 s join, and three
    // rounds running, single-shot numbers cost a verdict cycle of
    // adjudication). Every qid is timed with PER-QID REPEATS in the
    // primary path:
    //  - rep 1 runs first with a MemoBuilds snapshot around it. If it
    //    absorbed a memoized build (index root, k-NN graph, Lloyd, BPE
    //    merges, quantizer/codebooks, sink fixture), the qid is
    //    memo-absorbing: rep 1's build+serve time stays the PRIMARY
    //    number (comparable with every earlier round's totals) and the
    //    median of two further reps becomes its DERIVED "warm" entry —
    //    the hand-kept familyCold list this replaces went stale twice.
    //  - otherwise 2 more reps if rep 1 < 5 s (lower-median of 3) or 1
    //    more if slower (min of 2): one contended rep can no longer
    //    write the committed number.
    // The JSON carries queries=primary, min, reps, warm, and the build
    // labels per absorbing qid. SPARK_GRAFT_REPEAT=N still forces N
    // reps (builder-side pins).
    val forced = sys.env.get("SPARK_GRAFT_REPEAT").map(_.toInt)
    case class Timed(name: String, primary: Double, minT: Double,
        reps: Int, warm: Option[Double], builds: Seq[String],
        err: Option[String])
    val results = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy(_._1).map { case (name, fn) =>
      try {
        def runOnce(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val b0 = graft.operators.MemoBuilds.count
        val t1 = runOnce()
        val builds = graft.operators.MemoBuilds.labelsSince(b0)
        val absorbed = builds.nonEmpty
        val extra = forced.map(n => math.max(0, n - 1)).getOrElse(
          if (absorbed || t1 < 5.0) 2 else 1)
        val more = (1 to extra).map(_ => runOnce()).sorted
        val all = (t1 +: more).sorted
        def lowerMedian(xs: Seq[Double]): Double = xs((xs.size - 1) / 2)
        val primary = if (absorbed) t1 else lowerMedian(all)
        val warm =
          if (absorbed && more.nonEmpty) Some(lowerMedian(more)) else None
        if (all.size > 1)
          System.err.println(f"[bench] $name reps: " +
            all.map(t => f"$t%.3f").mkString(", ") +
            (if (absorbed) s" (absorbed: ${builds.mkString("+")})" else ""))
        Timed(name, primary, all.head, all.size, warm, builds, None)
      } catch { case e: Throwable =>
        Timed(name, -1.0, -1.0, 1, None, Nil,
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
      }
    }
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    def jmap(kvs: Seq[(String, String)]): String =
      kvs.map { case (k, v) => jq(k) + ":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map(r => r.name -> r.primary.toString))
    val mins = jmap(results.map(r => r.name -> r.minT.toString))
    val reps = jmap(results.map(r => r.name -> r.reps.toString))
    val errs = jmap(results.collect {
      case r if r.err.isDefined => r.name -> jq(r.err.get) })
    val ok = results.filter(_.err.isEmpty)
    val total = ok.map(_.primary).sum
    val wm = jmap(results.collect {
      case r if r.warm.isDefined => r.name -> r.warm.get.toString })
    val bl = jmap(results.collect { case r if r.builds.nonEmpty =>
      r.name -> r.builds.map(jq).mkString("[", ",", "]") })
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"min":$mins,"reps":$reps,"warm":$wm,"builds":$bl,"errors":$errs,"n_queries":${results.size},"n_errors":${results.size - ok.size},"sf":"$sfDir"}"""
    println(line)
    // Driver artifacts truncate stdout tails; also persist the full line to
    // a stable file so every per-query timing survives cross-round diffing.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line + "\n")
    spark.stop()
  }
}
