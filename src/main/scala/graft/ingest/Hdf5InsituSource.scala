package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One platform row decoded from a real netcdf4 file — the B2 schema
  * InsituAssembly consumes (top-level: Spark encoders require it). */
case class PlatformFileRow(
    source: String,
    id: String,
    category: String,
    geospatial_lon_min: String,
    geospatial_lat_min: String,
    geospatial_lon_max: String,
    geospatial_lat_max: String,
    lon: Seq[Double],
    lat: Seq[Double],
    time: Seq[Timestamp],
    attrs: Map[String, String])

/** The in-situ platforms source over REAL HDF5-backed netcdf4 files —
  * the engine twin of the reference's OpenURLWithFSSpec →
  * OpenWithXarray chain for the second recipe (insitu recipe.py:
  * 153-160), where each granule carries its trajectory as LONGITUDE/
  * LATITUDE/TIME coordinate variables plus global attrs
  * (recipe.py:73-93). Produces the same DataFrame shape as the
  * synthetic InsituSource.platforms, so InsituAssembly.assemble runs
  * identically over fixtures and real files.
  *
  * Scale shape: one listing, then each task reads only its own files
  * (whole-file reads — variable data lives past any head probe) and
  * decodes with the pure-Scala Hdf5Header reader. A file that fails
  * to parse yields a row with empty attr strings; the strict-cast
  * quarantine downstream captures it with its url (never kill the
  * job for one platform).
  */
object Hdf5InsituSource {

  /** Whole-file read cap — an in-situ platform granule is O(MB); a
    * multi-GB object under the glob is a misconfiguration, not data. */
  private val MAX_FILE = 256 << 20

  def platforms(
      spark: SparkSession,
      glob: String,
      storageOptions: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val sessionConf = ListingCache.sessionConfSnapshot(spark)
    val options = storageOptions // local binding: the closure must not capture `spark`
    ListingCache.globListing(spark, glob, storageOptions).as[String]
      .mapPartitions { it =>
        val conf = ListingCache.confWith(
          new org.apache.hadoop.conf.Configuration(false),
          sessionConf ++ options)
        it.map(url => readPlatform(url, conf))
      }
      .toDF()
  }

  private[ingest] def readPlatform(
      url: String,
      conf: org.apache.hadoop.conf.Configuration): PlatformFileRow = {
    // category from the url path, recipe.py:75: rsplit("/", 3)[1]
    val segs = url.split("/")
    val category = if (segs.length >= 3) segs(segs.length - 3) else ""
    try {
      val p = new org.apache.hadoop.fs.Path(url)
      val fs = p.getFileSystem(conf)
      val len = fs.getFileStatus(p).getLen
      if (len > MAX_FILE)
        throw new java.io.IOException(s"granule of $len bytes exceeds cap")
      val bytes = new Array[Byte](len.toInt)
      val in = fs.open(p)
      try in.readFully(0, bytes) finally in.close()
      val f = Hdf5Header.readFile(bytes)
      val attrs = f.rootAttrs
      val time = f.dataset("TIME")
      val times = time.attrs.get("units").flatMap(cfEpoch) match {
        case Some((perUnitMicros, epochMicros)) =>
          time.data.toSeq.map { v =>
            // round, don't truncate: 1/24 days is binary-inexact and
            // truncation lands hour marks at 00:59:59.999999
            val micros = epochMicros + Math.round(v * perUnitMicros)
            val ts = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
            ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
            ts
          }
        case None => Seq.empty // undecodable calendar: no datetimes
      }
      PlatformFileRow(url,
        attrs.getOrElse("id", ""), category,
        attrs.getOrElse("geospatial_lon_min", ""),
        attrs.getOrElse("geospatial_lat_min", ""),
        attrs.getOrElse("geospatial_lon_max", ""),
        attrs.getOrElse("geospatial_lat_max", ""),
        f.dataset("LONGITUDE").data.toSeq,
        f.dataset("LATITUDE").data.toSeq,
        times, attrs)
    } catch {
      case e @ (_: java.io.IOException | _: IllegalArgumentException) =>
        System.err.println(s"[graft] quarantined platform $url: ${e.getMessage}")
        PlatformFileRow(url, "", category, "", "", "", "",
          Seq.empty, Seq.empty, Seq.empty, Map.empty)
    }
  }

  /** CF epoch components: date, optional time (with optional fractional
    * seconds), optional Z/±hh[:mm] offset — each component 1-or-2 digit
    * tolerant. */
  private val EpochRe =
    ("""(\d{1,4})-(\d{1,2})-(\d{1,2})""" +
      """(?:[T ](\d{1,2}):(\d{1,2})(?::(\d{1,2})(\.\d+)?)?)?""" +
      """\s*(Z|[+-]\d{1,2}(?::?\d{2})?)?""").r

  /** CF time units "<unit> since <epoch>" → (micros per unit, epoch
    * micros). Unrecognized forms → None (times omitted, not wrong). */
  private[graft] def cfEpoch(units: String): Option[(Long, Long)] = {
    val Re = "(?i)(seconds?|minutes?|hours?|days?)\\s+since\\s+(.+)".r
    units.trim match {
      case Re(u, epochRaw) =>
        val perUnit = u.toLowerCase.stripSuffix("s") match {
          case "second" => 1000000L
          case "minute" => 60L * 1000000L
          case "hour" => 3600L * 1000000L
          case "day" => 86400L * 1000000L
        }
        // epoch forms seen in the wild: 1950-01-01, 1950-01-01 00:00:00,
        // 1950-01-01T00:00:00Z, 2000-01-01T00:00:00+02:00 — and the
        // NON-zero-padded spellings real archives carry ('1950-1-1',
        // '1800-01-01 00:00:0.0'), which strict ISO parsing rejects and
        // would silently drop every timestamp of such a granule.
        // Component-parse instead of format-parse: pad-independence for
        // free, explicit offsets HONORED (truncating one would shift
        // every timestamp), bare forms UTC per CF convention.
        epochRaw.trim match {
          case EpochRe(y, mo, d, h, mi, sec, frac, off) =>
            try {
              val offset =
                if (off == null || off == "Z") java.time.ZoneOffset.UTC
                else java.time.ZoneOffset.of(off)
              val nanos =
                if (frac == null) 0
                else math.round(frac.toDouble * 1e9).toInt
              val odt = java.time.OffsetDateTime.of(
                y.toInt, mo.toInt, d.toInt,
                if (h == null) 0 else h.toInt,
                if (mi == null) 0 else mi.toInt,
                if (sec == null) 0 else sec.toInt,
                nanos, offset)
              Some((perUnit, odt.toInstant.toEpochMilli * 1000L))
            } catch { // invalid month/day/offset → unrecognized, not wrong
              case _: java.time.DateTimeException => None
            }
          case _ => None
        }
      case _ => None
    }
  }
}
