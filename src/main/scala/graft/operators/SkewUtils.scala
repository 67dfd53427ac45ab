package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helper (SURVEY.md §7 M7): salted equi-join for the
  * case AQE's skew splitting can't fix — a build side small enough to
  * replicate but a probe side with pathological key skew (one key ≫
  * everything else, e.g. a viral document's LSH bucket or a hot
  * collection).
  *
  * probe gains a uniform salt in [0, n); build is exploded ×n with
  * every salt value; the join key becomes (key, salt), spreading the
  * hot key over n reducers. Semantically identical to the plain
  * equi-join (inner/left_semi).
  */
object SkewUtils {

  def saltedInnerJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int = 8): DataFrame = {
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** THE flood guard for blocked self-joins: keep each key group's
    * first `cap` members by `orderCol` (deterministic), dropping the
    * rest. Every blocked quadratic verify (LSH band buckets, n-gram
    * prefix blocks, record-linkage blocks) goes through here so the
    * Σ|block|² bound — and its recall-trade semantics — live in ONE
    * place. A duplicate-heavy corpus floods blocks; without the cap
    * the in-block verify is quadratic in the flood (measured 80× for
    * 10× data on the replicated sf1.0 fixture before join_fuzzy was
    * capped). */
  /** Scale-guarded fan-out for row-multiplying narrow stages (guide
    * §2.5 "input skew: one huge unsplittable file … repartition
    * immediately after the read"). The local fixtures are one parquet
    * file with ONE row group per table, so a scan — and every
    * explode/per-char kernel fused onto it — runs as a single task on
    * a 32-core session (a row group is the atomic split unit; no
    * split config can divide it). Round-robins the frame across the
    * cores ONLY when its planned parallelism is under half of them:
    * on a real lake the many files/row groups clear the bar and the
    * plan is untouched, so no corpus-wide shuffle is ever added at
    * scale. Call it on the NARROW projection feeding the explode
    * (keys + the bounded text column), never on a wide frame. */
  def fanOutSmallScan(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val parts =
      try df.rdd.getNumPartitions
      catch { case _: Throwable => Int.MaxValue }
    if (parts * 2 < cores) df.repartition(cores) else df
  }

  /** Pin the key-hash exchange the cap window requires at an explicit
    * partition count: AQE's BYTES-based coalescing folds a small
    * shuffle to one partition, serializing the whole downstream
    * in-block quadratic verify — the CPU cost AQE cannot see
    * (profiled: join_fuzzy's verify 1.1 s on 1 of 32 cores). A
    * user-pinned repartition is exempt from coalescing, satisfies the
    * window's required distribution (no extra exchange at any scale),
    * and the count follows the session's own scale knobs. */
  private[operators] def pinKeyPartitions(
      df: DataFrame, keys: Seq[String]): DataFrame = {
    val s = df.sparkSession
    val n = math.max(s.sparkContext.defaultParallelism,
      try s.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: Throwable => 200 })
    df.repartition(n, keys.map(col): _*)
  }

  def capPerKey(df: DataFrame, keys: Seq[String], orderCol: String,
      cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pinKeyPartitions(df, keys).withColumn("_rn", row_number().over(
      Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** The flood guard without the silent-drop trade, for paths whose
    * pair semantics allow extra candidates (the rows-only LSH
    * verifies): members past `cap` are not dropped — each emits ONE
    * candidate pair to the bucket member `cap` ranks EARLIER
    * (in-cap for ranks (cap, 2·cap], a fellow overflow member
    * beyond), and the downstream exact verify decides the pair like
    * any other candidate. The rank-minus-cap chaining keeps every
    * node's chain degree ≤ 2 per bucket — no anchor's downstream
    * work (per-vector windows, verify partitions) grows with flood
    * size — while connecting the whole bucket TRANSITIVELY through
    * the chain. The connectivity is candidate-level, not
    * guaranteed-recall: each link still has to pass the caller's
    * verify, so a component splits exactly where a link fails it —
    * for the motivating shapes (distinct items whose contents are
    * near-identical: templated/permuted texts, tightly-jittered
    * vectors) neighboring ranks verify and every member stays in
    * the component, which is what the flood specs pin. Candidate
    * work: Σ buckets × (cap² + |overflow|), never |bucket|².
    * Returns (capped rows, overflow (a, b) `orderCol` pairs with
    * a < b — the anchor ranks earlier, and ranks follow
    * `orderCol`). */
  def capPerKeyWithOverflow(df: DataFrame, keys: Seq[String],
      orderCol: String, cap: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val rn = pinKeyPartitions(df, keys).withColumn("_rn", row_number().over(
      Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))))
    val capped = rn.filter(col("_rn") <= cap)
    val pairs = rn.filter(col("_rn") > cap)
      .select(keys.map(col) :+ (col("_rn") - cap).as("_arn") :+
        col(orderCol).as("b"): _*)
      .join(rn.select(keys.map(col) :+ col("_rn").as("_arn") :+
        col(orderCol).as("a"): _*),
        keys :+ "_arn")
      .select(col("a"), col("b"))
    (capped.drop("_rn"), pairs)
  }
}
