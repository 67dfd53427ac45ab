package graft.ingest

import java.io.{BufferedInputStream, DataInputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** GranuleSource over REAL NetCDF classic files: glob-list the
  * granules, then each partition opens its files through the Hadoop
  * FileSystem and parses ONLY the header for global attributes
  * (NetcdfClassic) — the engine form of the reference's
  * OpenURLWithFSSpec → OpenWithXarray → attrs chain
  * (avhrr recipe.py:124-127, consumed at :46-63), minus pulling the
  * data payload. At scale this is a listing shuffle plus a few KB of
  * reads per granule, regardless of granule size.
  *
  * Attribute names default to the AVHRR recipe's (recipe.py:46-63);
  * pass `attrMap` to rebind B1 columns to other conventions. A file
  * that fails to parse yields a row with empty attr strings — the
  * strict-cast quarantine in ItemAssembly then captures it with its
  * source url, matching the engine's bad-row discipline (never kill
  * the job for one granule).
  */
final class NetcdfGranuleSource(
    glob: String,
    attrMap: Map[String, String] = NetcdfGranuleSource.AVHRR_ATTRS,
    storageOptions: Map[String, String] = Map.empty)
    extends GranuleSource {

  override def granules(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cols = NetcdfGranuleSource.B1_COLUMNS
    val binding = attrMap
    val options = storageOptions
    // Session-conf snapshot (credential propagation rationale on the
    // shared helper); per-source storageOptions override the session
    // (the reference's storage_kwargs, avhrr recipe.py:124,154).
    val sessionConf = ListingCache.sessionConfSnapshot(spark)
    ListingCache.globListing(spark, glob, storageOptions).as[String]
      .mapPartitions { it =>
        val conf = ListingCache.confWith(
          new org.apache.hadoop.conf.Configuration(false),
          sessionConf ++ options)
        it.map { url =>
          val attrs = NetcdfGranuleSource.headerAttrs(url, conf)
          (url,
            attrs.getOrElse(binding("id"), ""),
            attrs.getOrElse(binding("uuid"), ""),
            attrs.getOrElse(binding("westernmost_longitude"), ""),
            attrs.getOrElse(binding("southernmost_latitude"), ""),
            attrs.getOrElse(binding("easternmost_longitude"), ""),
            attrs.getOrElse(binding("northernmost_latitude"), ""),
            attrs.getOrElse(binding("time_coverage_start"), ""),
            attrs.getOrElse(binding("time_coverage_end"), ""))
        }
      }
      .toDF(cols: _*)
  }
}

object NetcdfGranuleSource {

  /** B1 granule_meta columns (FIXTURES.md), in schema order. */
  val B1_COLUMNS: Seq[String] = Seq(
    "source", "id", "uuid",
    "westernmost_longitude", "southernmost_latitude",
    "easternmost_longitude", "northernmost_latitude",
    "time_coverage_start", "time_coverage_end")

  /** Identity binding: the AVHRR granules use exactly the B1 names
    * (they were modeled on these attrs, recipe.py:46-63). */
  val AVHRR_ATTRS: Map[String, String] =
    B1_COLUMNS.drop(1).map(c => c -> c).toMap

  /** Parse one file's global attrs; a malformed granule returns empty
    * (quarantined downstream by the strict casts). */
  private[ingest] def headerAttrs(
      url: String,
      conf: org.apache.hadoop.conf.Configuration): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(url)
    try {
      val fs = p.getFileSystem(conf)
      val bin = new BufferedInputStream(fs.open(p), 8192)
      val in = new DataInputStream(bin)
      try {
        // sniff the magic to route the two on-disk formats netcdf
        // produces: classic CDF-1/2/5 vs HDF5-backed netcdf4
        // (file_type="netcdf4", avhrr recipe.py:120,126)
        bin.mark(8)
        val magic = new Array[Byte](8)
        // readNBytes loops to 8 bytes or EOF — a single read() may
        // legally return short (block boundary) and misroute a valid
        // HDF5 granule into the classic parser's quarantine
        val got = in.readNBytes(magic, 0, 8)
        bin.reset()
        if (got >= 8 && Hdf5Header.isHdf5Magic(magic))
          Hdf5Header.readRootAttrs(in)
        else NetcdfClassic.readHeader(in).attrs
      } finally in.close()
    } catch {
      // Narrow on purpose: NetcdfClassic bounds every length word, so
      // corrupt FILES always surface as IOException (or a require's
      // IllegalArgumentException) — those quarantine, logged. Systemic
      // RuntimeExceptions (fs misconfiguration, client bugs) still
      // fail fast instead of silently quarantining the whole corpus.
      case e @ (_: java.io.IOException | _: IllegalArgumentException) =>
        System.err.println(
          s"[graft] quarantined granule $url: ${e.getMessage}")
        Map.empty
    }
  }
}
