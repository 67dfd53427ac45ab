package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column operators (SURVEY.md §2.11 multimodal_struct):
  * media as opaque binary + typed metadata, queried relationally.
  */
object MultimodalQueries {

  /** multimodal_struct — typed multimodal record: text ref + binary
    * payload + metadata map, with the scalar projections (type, size)
    * kept outside the struct for predicate pushdown. */
  def multimodalStruct(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("image/png"))
        .when(col("doc_id") % 3 === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("media_type"),
      length(col("text").cast("binary")).as("payload_bytes"),
      hex(substring(col("text"), 1, 16).cast("binary")).as("payload_head_hex"),
      to_json(map(lit("source"), col("source"), lit("lang"), col("lang")))
        .as("meta_json"))

  val multimodalStructSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
      |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
      |       ELSE 'video/mp4' END AS media_type,
      |  octet_length(encode(text)) AS payload_bytes,
      |  hex(encode(substr(text, 1, 16))) AS payload_head_hex,
      |  CAST(to_json(MAP(['source','lang'], [source, lang])) AS VARCHAR)
      |    AS meta_json
      |FROM documents""".stripMargin

  /** multimodal_features — the mapPartitions decode pipeline (stub
    * decoder; see graft.multimodal.MediaPipeline). Rows-only: the
    * fake features are engine-defined. */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    graft.multimodal.MediaPipeline.featureStats(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_struct" -> (multimodalStruct _),
    "multimodal_features" -> (multimodalFeatures _)
  )

  def oracle: Map[String, String] = Map(
    "multimodal_struct" -> multimodalStructSql
    // multimodal_features: stub-decoder output — unit-tested plumbing
  )
}
