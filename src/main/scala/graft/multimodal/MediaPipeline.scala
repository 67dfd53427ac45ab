package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.11 multimodal_struct).
  *
  * Media payloads ride as opaque `binary` columns with typed metadata
  * (media_type, width/height/duration in a map) — the same shape the
  * reference gives granule assets (href + media_type,
  * avhrr recipe.py:70). Decode / feature-extraction runs per-partition
  * over batches, the Spark-side contract any decoder plugs into.
  *
  * Two decoders implement the trait: RealDecoders.PixelDecoder — a
  * REAL decode of JPEG/PNG/GIF/TIFF (JDK ImageIO) plus netpbm/BMP
  * images and PCM WAV audio in pure byte arithmetic (block-mean luma,
  * DCT pHash, windowed RMS/ZCR) — and the StubDecoder below, kept for
  * formats that genuinely need a codec library this container lacks:
  * a deterministic fake that hashes payload bytes, so the distributed
  * plumbing stays exercised even for undecodable types. Video is
  * half-real: Mp4Container demuxes ISO-BMFF for real (headers, sample
  * tables, keyframe byte extraction — see keyframeSample); only the
  * codec decode of the extracted sample bytes needs the stub.
  */
object MediaPipeline {

  case class MediaRecord(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      meta: Map[String, String])

  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      features: Array[Float])

  /** Decoder contract: payload bytes → fixed-width feature vector.
    * Real implementations (JPEG decode + resize + embed, PCM frame
    * sample, video keyframe) implement this trait; the engine never
    * depends on the media library directly (SURVEY §7.2 risk 1). */
  trait Decoder extends Serializable {
    def featureDim: Int
    def decode(mediaType: String, payload: Array[Byte]): Array[Float]
  }

  /** Deterministic stand-in decoder: xxhash-style mix of payload bytes
    * into `dim` floats in [-1, 1]. NOT a real decoder — it exists so
    * the distributed plumbing is exercised end-to-end. */
  final class StubDecoder(dim: Int = 8) extends Decoder {
    def featureDim: Int = dim
    def decode(mediaType: String, payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        var h = 1125899906842597L + i * 0x9e3779b97f4a7c15L
        var j = 0
        while (j < payload.length) {
          h = (h ^ payload(j)) * 0x100000001b3L
          j += 1
        }
        out(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2 - 1
        i += 1
      }
      out
    }
  }

  /** Build a typed media dataset from `documents` — payload is the
    * UTF-8 text bytes standing in for image/audio bytes. */
  def mediaRecords(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("image/png"))
          .when(col("doc_id") % 3 === 1, lit("audio/wav"))
          .otherwise(lit("video/mp4")).as("media_type"),
        col("text").cast("binary").as("payload"),
        map(
          lit("source"), col("source"),
          lit("lang"), col("lang"),
          lit("n_chars"), col("n_chars").cast("string")).as("meta"))
      .as[MediaRecord]
  }

  /** Per-partition decode: one decoder instance per partition (the
    * expensive init a real codec needs), streaming over rows — the
    * mapPartitions shape that scales to arbitrarily wide partitions
    * without materializing batches. STRICT: a decoder failure fails
    * the job — use decodeQuarantined over corpora that may hold
    * corrupt or undecodable payloads. */
  def extractFeatures(
      records: Dataset[MediaRecord],
      decoder: Decoder): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.doc_id, r.media_type, r.payload.length,
          decoder.decode(r.media_type, r.payload))
      }
    }
  }

  /** One decode outcome: `error` is null on success, else the reason
    * and `features` is empty — the media twin of the granule sources'
    * quarantine rows (one bad file must never kill the corpus job). */
  case class MediaDecoded(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      features: Array[Float],
      error: String)

  /** Decode with per-row quarantine: malformed payloads and formats
    * the decoder refuses become error rows instead of task failures.
    * NonFatal, not just IllegalArgumentException: the contract is
    * "one bad file never kills the corpus job", and it must hold for
    * ANY decoder behind the seam — a third-party codec throwing AIOOBE
    * or NegativeArraySizeException on an adversarial payload is
    * exactly the case quarantine exists for. */
  def decodeQuarantined(
      records: Dataset[MediaRecord],
      decoder: Decoder): Dataset[MediaDecoded] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        try MediaDecoded(r.doc_id, r.media_type, r.payload.length,
          decoder.decode(r.media_type, r.payload), null)
        catch {
          case scala.util.control.NonFatal(e) =>
            MediaDecoded(r.doc_id, r.media_type, r.payload.length,
              Array.empty[Float],
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
  }

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `stride`-th — the video-keyframe / audio-window shape. Pure
    * per-row work; for MP4 payloads use keyframeSample below, which
    * replaces the byte-slicing with real container-aware extraction.
    * `error` is null on success (the quarantine contract's shape —
    * frameSample itself cannot fail, keyframeSample can). */
  case class MediaFrames(
      doc_id: Long, media_type: String, n_frames: Int,
      frames: Seq[Array[Byte]], error: String = null)

  /** The shared byte-slicing: fixed-size frames, every `stride`-th
    * kept — frameSample's whole job, keyframeSample's non-container
    * fallback. */
  private def byteFrames(
      payload: Array[Byte], frameBytes: Int, stride: Int): Seq[Array[Byte]] = {
    val all = payload.grouped(frameBytes).toArray
    all.indices.collect { case i if i % stride == 0 => all(i) }.toSeq
  }

  def frameSample(
      records: Dataset[MediaRecord],
      frameBytes: Int = 32,
      stride: Int = 4): Dataset[MediaFrames] = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    import records.sparkSession.implicits._
    records.map { r =>
      val kept = byteFrames(r.payload, frameBytes, stride)
      MediaFrames(r.doc_id, r.media_type, kept.length, kept)
    }
  }

  /** Container-aware keyframe sampling: MP4 payloads are demuxed for
    * real (Mp4Container walks the sample tables and pulls sync-sample
    * bytes out of mdat); other media types fall back to the byte-
    * grouped frameSample slicing. Per-row quarantine — a malformed
    * container yields zero frames with the reason in `error`, never a
    * task failure. This is the 100 TB shape: keyframe selection reads
    * only the sample table, so the expensive downstream (codec) work
    * applies to the few percent of bytes the sync table selects. */
  def keyframeSample(
      records: Dataset[MediaRecord],
      maxFrames: Int = 16,
      frameBytes: Int = 32,
      stride: Int = 4): Dataset[MediaFrames] = {
    require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")
    require(frameBytes > 0 && stride > 0, "frameBytes/stride must be positive")
    import records.sparkSession.implicits._
    records.map { r =>
      try {
        val frames =
          if (r.media_type == "video/mp4" || r.media_type == "video/quicktime")
            Mp4Container.keyframeBytes(r.payload, maxFrames)
          else byteFrames(r.payload, frameBytes, stride).take(maxFrames)
        MediaFrames(r.doc_id, r.media_type, frames.length, frames)
      } catch {
        case scala.util.control.NonFatal(e) =>
          MediaFrames(r.doc_id, r.media_type, 0, Seq.empty,
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }

  /** Resize: project a feature vector to `dim` (truncate or
    * interpolation-free pad) — the normalize-before-index step of an
    * embedding pipeline. */
  def resizeFeatures(
      feats: Dataset[MediaFeatures], dim: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    feats.map { f =>
      val out =
        if (f.features.length >= dim) f.features.take(dim)
        else f.features ++ Array.fill(dim - f.features.length)(0.0f)
      f.copy(features = out)
    }
  }

  /** The declared multimodal feature query: records → stub decode →
    * per-type feature stats. */
  def featureStats(spark: SparkSession, dir: String): DataFrame = {
    val feats = extractFeatures(mediaRecords(spark, dir), new StubDecoder(8))
    feats.toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        // every record must come out the far side of the decode with a
        // full finite feature vector — the per-record pipeline proof
        // stated as a count the oracle can re-derive (the feature
        // VALUES are decoder-defined; their presence is not)
        sum(when(size(col("features")) === 8 &&
          !exists(col("features"), f => isnan(f) || f.isNull), 1L)
          .otherwise(0L)).as("n_decoded"))
  }
}
