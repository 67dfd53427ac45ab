package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** The end-to-end curation pipeline as ONE declared, oracle-checked
  * query: exact dedup → near-dup cluster keepers → global-quantile
  * quality filter → per-language corpus stats. Each stage is the
  * already-verified operator (DedupQueries, TextQueries); this
  * composes them the way a production training-data run would, and
  * the DuckDB oracle recomputes the whole chain (recursive-CTE
  * connected components included) so the composition itself is
  * hash-checked, not just the parts.
  *
  * Scale shape: two hash aggs (content hash, cluster drop-list), one
  * iterative CC on the (tiny) near-dup pair set, one broadcast
  * scalar threshold, one final agg — no global sorts, no unbounded
  * windows, every join on ids.
  */
object PipelineQueries {

  def pipelineCleanCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = documents(s, dir)
    // stage 1: exact dedup — one keeper per distinct text (the same
    // aggregate dedup_exact declares)
    val keep1 = DedupQueries.dedupExactFrom(docs)
      .select(col("keep_id").as("doc_id"))
    // stage 2: near-dup clustering — drop cluster non-keepers
    val drop2 = DedupQueries
      .clustersFrom(DedupQueries.dedupNgramJaccardFrom(docs)
        .select(col("a"), col("b")))
      .filter(col("is_keeper") === 0)
      .select(col("doc_id"))
    val surv = docs
      .join(keep1, Seq("doc_id"))
      .join(drop2, Seq("doc_id"), "left_anti")
    // stage 3: quality filter at the survivors' P20 (one broadcast
    // scalar; approx_percentile at 100 TB — same plan shape)
    val sq = surv.withColumn("quality", TextQueries.QualityScore.quality)
    val thr = sq.agg(
      round(expr("percentile(quality, 0.2)") + lit(1e-9), 6).as("thr"))
    sq.join(broadcast(thr))
      .filter(col("quality") >= col("thr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
  }

  val pipelineCleanCorpusSql: String =
    s"""WITH keep1 AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
       |cc AS (SELECT doc_id, is_keeper
       |       FROM (${DedupQueries.dedupClusterCcSql}) z),
       |drop2 AS (SELECT doc_id FROM cc WHERE is_keeper = 0),
       |surv AS (SELECT d.* FROM documents d JOIN keep1 USING (doc_id)
       |         WHERE d.doc_id NOT IN (SELECT doc_id FROM drop2)),
       |sq AS (
       |  SELECT doc_id, lang, n_chars,
       |    round(least(CAST(n_chars AS DOUBLE)/500.0, 1.0)*0.4 +
       |      (CAST(len(list_filter(string_split(text,' '),
       |        w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE)
       |        / len(string_split(text,' ')))*0.3 +
       |      (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
       |        / len(string_split(text,' ')))*0.3 + 1e-9, 4) AS quality
       |  FROM surv),
       |thr AS (SELECT round(quantile_cont(quality, 0.2) + 1e-9, 6) AS thr
       |        FROM sq)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM sq, thr WHERE sq.quality >= thr.thr
       |GROUP BY lang""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_clean_corpus" -> (pipelineCleanCorpus _)
  )

  def oracle: Map[String, String] = Map(
    "pipeline_clean_corpus" -> pipelineCleanCorpusSql
  )
}
