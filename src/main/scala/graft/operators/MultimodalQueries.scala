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

  /** multimodal_dedup — exact media dedup by payload content hash:
    * the binary twin of dedup_exact (hashing opaque image/audio/video
    * bytes is the standard first dedup pass over a media corpus — no
    * decode needed). One hash agg; only the 32-byte digest travels,
    * never payload bytes. Keeper = min doc_id per distinct payload. */
  def multimodalDedup(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"),
        sha2(col("text").cast("binary"), 256).as("payload_sha"),
        length(col("text").cast("binary")).as("payload_bytes"))
      .groupBy(col("payload_sha"), col("payload_bytes"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))

  // DuckDB's sha256 takes VARCHAR; hashing the string is byte-
  // identical to Spark's sha2(text.cast(binary)) because the binary
  // cast IS the UTF-8 encoding of the string.
  val multimodalDedupSql: String =
    """SELECT sha256(text) AS payload_sha,
      |  octet_length(encode(text)) AS payload_bytes,
      |  min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_struct" -> (multimodalStruct _),
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_dedup" -> (multimodalDedup _)
  )

  def oracle: Map[String, String] = Map(
    "multimodal_struct" -> multimodalStructSql,
    "multimodal_dedup" -> multimodalDedupSql
    // multimodal_features: stub-decoder output — unit-tested plumbing
  )
}
