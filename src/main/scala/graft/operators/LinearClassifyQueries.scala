package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** text_classify_linear / text_quality_linear — the fastText-shape
  * TRAINED linear filter (VERDICT r16 task 2): the published
  * quality/langid standard (fastText langid, the GPT-3 WebText
  * filter, CCNet) is a linear model over hashed character-n-gram
  * features trained by iterated updates — a capability class
  * text_nb_classify's closed-form counting cannot reach (NB commits
  * to count ratios; a discriminative trainer iterates until the
  * training split is actually separated — LinearClassifySpec plants a
  * frequency-asymmetric fixture where NB misclassifies and this
  * model is exact).
  *
  * Model: char trigrams of the first LIN_PREFIX chars of
  * lower(text), hashed into LIN_BUCKETS buckets
  * (h = (c₁·31² + c₂·31 + c₃) mod B — same arithmetic in both
  * engines); one integer weight row per (class, bucket); training =
  * LIN_EPOCHS rounds of the BATCH multiclass perceptron:
  *   score(d, c)  = Σ_f w[c][f]·n[d][f]          (BIGINT exact)
  *   pred(d)      = argmax_c (score, class asc)
  *   w[y_d][f]   += Σ_{misclassified d} n[d][f]
  *   w[pred_d][f] −= Σ_{misclassified d} n[d][f]
  * The update is a SUM over the train split — order-free integer
  * arithmetic (the refineCentroids discipline), so partitioning
  * cannot move a unit and the driver and distributed paths are
  * bit-identical (spec-pinned). Sequential SGD would NOT be
  * order-free; the batch form is the distributed-correct variant of
  * the same trainer.
  *
  * Split: doc_id%10 < 7 trains, the rest scores (text_nb_classify's
  * split). Heads share this one core and differ ONLY in labels:
  * `lang` for the langid head, the Gopher keep verdict ('hq'/'lq')
  * for the quality head — the CCNet shape (distill a rule filter
  * into a classifier that generalizes past the rules).
  *
  * Scale design: features are row-local (bounded by the prefix:
  * ≤ LIN_PREFIX−2 grams/doc, so feature volume is docs-linear no
  * matter how long documents get); the model is C×B integers —
  * broadcast-sized at any corpus scale. Under DRIVER_LIN_MAX train
  * feature rows the epoch loop runs on the driver (the
  * DRIVER_BPE_MAX idiom); above it each epoch is one distributed
  * join + two partial-aggregating groupBys with the model broadcast
  * both ways — bit-parity with the driver loop is spec-pinned
  * because the updates are associative integer sums.
  *
  * Oracle: the WHOLE train-then-score chain in one recursive CTE —
  * feature hashing, every epoch's scores/argmax/updates, and the
  * final test-split argmax replayed in DuckDB (the embKmeansSql
  * state-as-one-row idiom; the epoch state is the C·B weight list).
  */
object LinearClassifyQueries {

  private[operators] val LIN_PREFIX = 64
  private[operators] val LIN_BUCKETS = 1024
  private[operators] val LIN_EPOCHS = 5

  /** Driver-shortcut ceiling on TRAIN FEATURE ROWS (the
    * DRIVER_BPE_MAX idiom): 2²⁰ (doc, f, n) rows ≈ 24 MB collected.
    * Below it the epoch loop runs locally (10 distributed rounds of
    * shuffle latency would dominate the integer work); above it the
    * distributed loop runs. Identical output either way — the batch
    * updates are order-free integer sums (spec-pinned parity). */
  private[graft] val DRIVER_LIN_MAX = 1L << 20

  /** Hashed char-trigram features (doc_id, f, n) plus pass-through
    * label column `y` when present. Built from the prefix's char-code
    * ARRAY via nested zip_with over slices — NOT substr inside a
    * transform lambda, which inlines the whole prefix expression per
    * gram (the Catalyst higher-order-function CSE blowup; the same
    * fix as DSIR's dsirFeats — measured most of the qid's wall). */
  private[operators] def linFeaturesFrom(
      d: DataFrame, label: Column): DataFrame = {
    val p = lower(col("text")).substr(lit(1), lit(LIN_PREFIX))
    val a = transform(split(p, ""), c => ascii(c))
    val na = size(a)
    val fs = when(na >= 3,
      zip_with(
        zip_with(slice(a, lit(1), na - 2), slice(a, lit(2), na - 2),
          (x, y) => x * 961 + y * 31),
        slice(a, lit(3), na - 2),
        (xy, z) => (xy + z) % LIN_BUCKETS))
      .otherwise(typedLit(Seq.empty[Int]))
    // fan out the narrow pre-explode frame (the textLangidNbFrom
    // discipline): the per-char gram kernel over a single-row-group
    // local fixture otherwise runs on one core; the guard keeps the
    // plan untouched on a parallel lake scan.
    SkewUtils.fanOutSmallScan(
        d.select(col("doc_id"), label.as("y"),
          substring(col("text"), 1, LIN_PREFIX * 4).as("text")))
      .select(col("doc_id"), col("y"), explode(fs).as("f"))
      .groupBy(col("doc_id"), col("f"))
      .agg(first(col("y")).as("y"), count(lit(1)).cast("long").as("n"))
  }

  /** The shared trainer/scorer core: batch-perceptron over `train`
    * (doc_id, y, f, n), final-model argmax over `test` (doc_id, f,
    * n). `driverMax` overridden to 0 in specs to force the
    * distributed path. */
  private[graft] def linearScore(
      train: DataFrame, test: DataFrame,
      driverMax: Long = DRIVER_LIN_MAX): DataFrame = {
    val (labels, w) = trainLinearModel(train, driverMax)
    scoreLinear(test, labels, w)
  }

  /** Train the batch perceptron and return the FROZEN model —
    * (sorted labels, flat C×B weights). The model is the
    * bounded-driver artifact the qids memoize per corpus fingerprint
    * (the tokenizer-model idiom): everything corpus-sized stays
    * inside this call. */
  private[graft] def trainLinearModel(
      train: DataFrame,
      driverMax: Long = DRIVER_LIN_MAX): (Seq[String], Array[Long]) = {
    val s = train.sparkSession
    import s.implicits._
    val B = LIN_BUCKETS
    // class list: bounded by the label vocabulary (languages /
    // verdicts) — a legitimate driver read, like kmeans centroids
    val labels = train.select(col("y")).distinct()
      .as[String].collect().sorted
    val C = labels.length
    if (C == 0) return (Seq.empty, Array.emptyLongArray)
    val ci = labels.zipWithIndex.toMap // 0-based
    // final weights, flat: w(c * B + f)
    val w = new Array[Long](C * B)
    val nFeat = train.count()
    if (nFeat <= driverMax) {
      // ── driver loop (documented bounded read) ──
      val rows = train.select(col("doc_id"), col("y"), col("f"),
        col("n")).as[(Long, String, Int, Long)].collect()
      val byDoc = rows.groupBy(_._1).toArray.sortBy(_._1)
      var epoch = 0
      var changed = true
      while (epoch < LIN_EPOCHS && changed) {
        changed = false
        val upd = new Array[Long](C * B)
        byDoc.foreach { case (_, fs) =>
          val y = ci(fs.head._2)
          var best = 0
          var bestSc = Long.MinValue
          var c = 0
          while (c < C) {
            var sc = 0L
            fs.foreach { case (_, _, f, n) => sc += w(c * B + f) * n }
            if (sc > bestSc) { bestSc = sc; best = c }
            c += 1
          }
          if (best != y) {
            changed = true
            fs.foreach { case (_, _, f, n) =>
              upd(y * B + f) += n
              upd(best * B + f) -= n
            }
          }
        }
        var i = 0
        while (i < w.length) { w(i) += upd(i); i += 1 }
        epoch += 1
      }
    } else {
      // ── distributed loop: model broadcast out, updates aggregated
      // back (associative integer sums — bit-parity with the loop
      // above). One epoch = one broadcast join + argmax window +
      // one model-sized aggregate. ──
      import org.apache.spark.sql.expressions.Window
      val trainP = train.persist()
      // per-doc true-class index, computed once (label-set-bounded
      // broadcast map)
      val ciLit = typedLit(ci)
      val ydoc = trainP.select(col("doc_id"), col("y")).distinct()
        .select(col("doc_id"),
          element_at(ciLit, col("y")).cast("int").as("yidx"))
        .persist()
      var epoch = 0
      var changed = true
      while (epoch < LIN_EPOCHS && changed) {
        val wDf = broadcast(s.createDataset(
          (0 until C).flatMap(c => (0 until B).map(f =>
            (c, f, w(c * B + f))))
        ).toDF("cidx", "f", "wt"))
        // one epoch: broadcast-join scores → per-doc argmax (a
        // partial-aggregating max-of-struct — (sc asc, -cidx asc)
        // maximum IS (sc desc, cidx asc), with no sort window) → the
        // misclassified set → two-sided update fan → ONE model-sized
        // integer aggregate back to the driver
        val upd = trainP
          .join(wDf, Seq("f"))
          .groupBy(col("doc_id"), col("cidx"))
          .agg(sum(col("wt") * col("n")).as("sc"))
          .groupBy(col("doc_id"))
          .agg(max(struct(col("sc"), (-col("cidx")).as("nci"),
            col("cidx"))).as("b"))
          .select(col("doc_id"), col("b.cidx").as("cidx"))
          .join(ydoc, Seq("doc_id"))
          .filter(col("cidx") =!= col("yidx"))
          .select(col("doc_id"), col("cidx").as("pidx"), col("yidx"))
          .join(trainP.select(col("doc_id"), col("f"), col("n")),
            Seq("doc_id"))
          .select(explode(array(
            struct((col("yidx") * B + col("f")).as("i"),
              col("n").as("d")),
            struct((col("pidx") * B + col("f")).as("i"),
              (-col("n")).as("d")))).as("e"))
          .select(col("e.i").as("i"), col("e.d").as("d"))
          .groupBy(col("i")).agg(sum(col("d")).as("dd"))
          .collect()
        if (upd.isEmpty) changed = false
        else upd.foreach(r => w(r.getInt(0)) += r.getLong(1))
        epoch += 1
      }
      ydoc.unpersist()
      trainP.unpersist()
    }
    (labels.toSeq, w)
  }

  /** Score (doc_id, f, n) rows with a frozen model (same
    * max-of-struct argmax: classes are indexed, so the (sc desc,
    * cidx asc) winner is the (sc desc, label asc) winner). */
  private[graft] def scoreLinear(test: DataFrame,
      labels: Seq[String], w: Array[Long]): DataFrame = {
    val s = test.sparkSession
    import s.implicits._
    val B = LIN_BUCKETS
    val C = labels.length
    if (C == 0)
      return s.emptyDataset[(Long, String, Long)]
        .toDF("doc_id", "pred", "score")
    val wDf = broadcast(s.createDataset(
      (0 until C).flatMap(c => (0 until B).map(f =>
        (labels(c), c, f, w(c * B + f))))
    ).toDF("c", "cidx", "f", "wt"))
    test
      .join(wDf, Seq("f"))
      .groupBy(col("doc_id"), col("c"), col("cidx"))
      .agg(sum(col("wt") * col("n")).as("sc"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("sc"), (-col("cidx")).as("nci"),
        col("c"))).as("b"))
      .select(col("doc_id"), col("b.c").as("pred"),
        col("b.sc").cast("long").as("score"))
  }

  /** Test-split features — built fresh for scoring (one narrow,
    * row-local pass; no cache to pin). */
  private def testFeats(d: DataFrame): DataFrame =
    linFeaturesFrom(d.filter(pmod(col("doc_id"), lit(10)) >= 7),
      lit("")).select(col("doc_id"), col("f"), col("n"))

  /** Train a head on `d`, release the working feature cache the
    * moment the model is frozen (the corpus-sized trigram explode was
    * persisted for the SESSION lifetime before — the dsir-feats
    * residency class, r17 finding #3), and score the test split from
    * a fresh narrow pass. */
  private def trainHead(d: DataFrame, label: Column,
      driverMax: Long): (Seq[String], Array[Long]) = {
    val feats = linFeaturesFrom(d, label).persist()
    try trainLinearModel(
      feats.filter(pmod(col("doc_id"), lit(10)) < 7), driverMax)
    finally feats.unpersist() // training is eager (collect / epoch jobs)
  }

  /** Per-head frozen-model memo, keyed on (dir, corpus fingerprint,
    * head): the model is C×B integers — the documented
    * bounded-driver-read class — and corpus-fingerprint-stable, so
    * repeat scoring (bench reps, the ensemble card) replays the
    * artifact instead of retraining (the tokenizer-model idiom). */
  private val linModelMemo = new BuildMemo[(Seq[String], Array[Long])]()

  /** text_classify_linear — the langid head (labels = `lang`). */
  def textClassifyLinear(s: SparkSession, dir: String): DataFrame = {
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    val d = documents(s, dir)
    val (labels, w) = linModelMemo.getOrBuild(s"$dir|$fp|lang",
      s.sparkContext) {
      MemoBuilds.record("lin_model_lang")
      trainHead(d, col("lang"), DRIVER_LIN_MAX)
    }
    scoreLinear(testFeats(d), labels, w)
      .select(col("doc_id"), col("pred").as("pred_lang"), col("score"))
  }

  private[graft] def textClassifyLinearFrom(
      d: DataFrame, driverMax: Long = DRIVER_LIN_MAX): DataFrame = {
    val (labels, w) = trainHead(d, col("lang"), driverMax)
    scoreLinear(testFeats(d), labels, w)
      .select(col("doc_id"), col("pred").as("pred_lang"), col("score"))
  }

  /** text_quality_linear — the quality head: labels are the Gopher
    * keep verdict on the train split ('hq'/'lq') — the CCNet shape
    * (train a linear filter on a rule-curated positive set). */
  def textQualityLinear(s: SparkSession, dir: String): DataFrame = {
    val fp = IndexManifest.corpusFingerprint(dir, "documents")
    val d = documents(s, dir)
    val (labels, w) = linModelMemo.getOrBuild(s"$dir|$fp|quality",
      s.sparkContext) {
      MemoBuilds.record("lin_model_quality")
      trainQualityHead(d)
    }
    scoreLinear(testFeats(d), labels, w)
      .select(col("doc_id"), col("pred").as("pred_quality"),
        col("score"))
  }

  private def trainQualityHead(d: DataFrame): (Seq[String], Array[Long]) = {
    val lab = TextQueries.gopherRulesFrom(d)
      .select(col("doc_id"),
        when(col("keep"), "hq").otherwise("lq").as("yq"))
    trainHead(d.join(lab, Seq("doc_id")).withColumnRenamed("yq", "ylab"),
      col("ylab"), DRIVER_LIN_MAX)
  }

  private[graft] def textQualityLinearFrom(d: DataFrame): DataFrame = {
    val (labels, w) = trainQualityHead(d)
    scoreLinear(testFeats(d), labels, w)
      .select(col("doc_id"), col("pred").as("pred_quality"),
        col("score"))
  }

  // ── oracles: the whole chain in one recursive CTE ──

  /** Shared CTE chain; `%LABEL%` supplies `liny(doc_id, y)`. */
  private def linSqlChain(finalPredCol: String): String =
    s"""linp AS (SELECT doc_id, substr(lower(text), 1, $LIN_PREFIX) AS p
       |  FROM documents),
       |ling AS (SELECT doc_id,
       |    (unicode(substr(p, g.i, 1)) * 961
       |     + unicode(substr(p, g.i + 1, 1)) * 31
       |     + unicode(substr(p, g.i + 2, 1))) % $LIN_BUCKETS AS f
       |  FROM linp, unnest(generate_series(1, greatest(len(p) - 2, 0)))
       |    AS g(i)),
       |linf AS (SELECT doc_id, f, CAST(count(*) AS BIGINT) AS n
       |  FROM ling GROUP BY doc_id, f),
       |liny AS (%LABEL%),
       |ltr AS (SELECT linf.doc_id, liny.y, linf.f, linf.n
       |  FROM linf JOIN liny USING (doc_id)
       |  WHERE ((linf.doc_id % 10) + 10) % 10 < 7),
       |lte AS (SELECT doc_id, f, n FROM linf
       |  WHERE ((doc_id % 10) + 10) % 10 >= 7),
       |lcls AS (SELECT y AS c, CAST(row_number() OVER (ORDER BY y)
       |    AS INT) AS ci
       |  FROM (SELECT DISTINCT y FROM ltr)),
       |lnc AS (SELECT count(*) AS nc FROM lcls),
       |lydoc AS (SELECT DISTINCT doc_id, ci AS yci
       |  FROM ltr JOIN lcls ON lcls.c = ltr.y),
       |lst(it, w) AS (
       |  SELECT 0, (SELECT list_transform(
       |      range(1, nc * $LIN_BUCKETS + 1),
       |      x -> CAST(0 AS BIGINT)) FROM lnc)
       |  UNION ALL
       |  SELECT s.it + 1, list_transform(range(1, len(s.w) + 1),
       |      x -> s.w[x] + COALESCE(map_extract(u.um, x)[1],
       |        CAST(0 AS BIGINT)))
       |  FROM lst s, LATERAL (
       |    SELECT map_from_entries(list(struct_pack(k := idx, v := dd)))
       |      AS um
       |    FROM (
       |      SELECT idx, sum(delta) AS dd FROM (
       |        SELECT (fan.e).idx AS idx, (fan.e).d AS delta
       |        FROM (
       |          SELECT doc_id, yci, pci FROM (
       |            SELECT doc_id, yci, ci AS pci FROM (
       |              SELECT t.doc_id, c.ci, y.yci,
       |                sum(s.w[(c.ci - 1) * $LIN_BUCKETS + t.f + 1]
       |                  * t.n) AS sc
       |              FROM ltr t
       |              JOIN lydoc y ON y.doc_id = t.doc_id
       |              CROSS JOIN lcls c
       |              GROUP BY t.doc_id, c.ci, y.yci)
       |            QUALIFY row_number() OVER (PARTITION BY doc_id
       |              ORDER BY sc DESC, ci) = 1
       |          ) WHERE yci <> pci
       |        ) m JOIN ltr t2 ON t2.doc_id = m.doc_id,
       |        LATERAL (SELECT unnest([
       |          struct_pack(
       |            idx := (m.yci - 1) * $LIN_BUCKETS + t2.f + 1,
       |            d := t2.n),
       |          struct_pack(
       |            idx := (m.pci - 1) * $LIN_BUCKETS + t2.f + 1,
       |            d := -t2.n)]) AS e) fan
       |      ) GROUP BY idx)
       |  ) u
       |  WHERE s.it < $LIN_EPOCHS),
       |lfw AS (SELECT w FROM lst ORDER BY it DESC LIMIT 1),
       |lsc AS (SELECT t.doc_id, c.c, c.ci,
       |    sum(lfw.w[(c.ci - 1) * $LIN_BUCKETS + t.f + 1] * t.n) AS sc
       |  FROM lte t CROSS JOIN lcls c, lfw
       |  GROUP BY 1, 2, 3)
       |SELECT doc_id, c AS $finalPredCol, CAST(sc AS BIGINT) AS score
       |FROM lsc QUALIFY row_number() OVER (PARTITION BY doc_id
       |  ORDER BY sc DESC, ci) = 1""".stripMargin

  val textClassifyLinearSql: String =
    ("WITH RECURSIVE " + linSqlChain("pred_lang"))
      .replace("%LABEL%", "SELECT doc_id, lang AS y FROM documents")

  val textQualityLinearSql: String =
    ("WITH RECURSIVE " + linSqlChain("pred_quality"))
      .replace("%LABEL%",
        "SELECT doc_id, CASE WHEN keep THEN 'hq' ELSE 'lq' END AS y" +
          " FROM (%GOPHER%)")
      .replace("%GOPHER%", TextQueries.textGopherRulesSql)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_classify_linear" -> (textClassifyLinear _),
    "text_quality_linear" -> (textQualityLinear _)
  )

  def oracle: Map[String, String] = Map(
    "text_classify_linear" -> textClassifyLinearSql,
    "text_quality_linear" -> textQualityLinearSql
  )
}
