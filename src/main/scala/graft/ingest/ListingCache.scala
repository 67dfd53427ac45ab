package graft.ingest

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-addressed listing cache (src_listing_cache /
  * snk_listing_cache) — the engine's `cached_glob`
  * (insitu recipe.py:30-45): key = sha256(glob), value = a parquet
  * file holding the listing. Cache hit replaces the expensive remote
  * enumeration with one local columnar read.
  *
  * Unlike the reference (driver-side pandas list), the listing stays
  * a DataFrame end-to-end — at scale the enumeration itself can be
  * distributed (per-prefix listing tasks) and unioned.
  */
object ListingCache {

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  def cachePath(cacheRoot: String, glob: String): String =
    s"$cacheRoot/${sha256Hex(glob)}.parquet"

  /** Listing with cache: returns a single-column `url` DataFrame,
    * sorted (the reference's `sorted(fs.glob(...))`,
    * insitu recipe.py:40). `lister` runs only on miss. The cache
    * probe/mkdir go through the Hadoop FileSystem of `cacheRoot`, so a
    * non-local root (hdfs://, s3a://) actually hits — a java.nio probe
    * would always miss there and silently re-list every time. */
  def cachedListing(
      spark: SparkSession,
      glob: String,
      cacheRoot: String,
      cache: Boolean = true)(lister: String => DataFrame): DataFrame = {
    val path = cachePath(cacheRoot, glob)
    val hPath = new org.apache.hadoop.fs.Path(path)
    lazy val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (cache && fs.exists(hPath)) {
      spark.read.parquet(path).orderBy("url")
    } else {
      val listed = lister(glob).select(col("url")).orderBy("url")
      if (cache) {
        fs.mkdirs(new org.apache.hadoop.fs.Path(cacheRoot))
        listed.coalesce(1).write.mode("overwrite").parquet(path)
        spark.read.parquet(path).orderBy("url")
      } else listed
    }
  }

  /** Hadoop Configuration with per-source overrides — the engine form
    * of the reference's fsspec `storage_kwargs`
    * (avhrr recipe.py:124,154): credentials/endpoints for the store
    * being listed or opened, e.g. fs.s3a.access.key /
    * fs.s3a.endpoint, without mutating the session-wide
    * configuration. */
  def confWith(
      base: org.apache.hadoop.conf.Configuration,
      storageOptions: Map[String, String])
      : org.apache.hadoop.conf.Configuration =
    if (storageOptions.isEmpty) base
    else {
      val c = new org.apache.hadoop.conf.Configuration(base)
      storageOptions.foreach { case (k, v) => c.set(k, v) }
      c
    }

  /** Snapshot the SESSION Hadoop conf as a plain serializable Map for
    * executor-side `fs.open`: credentials set the standard way
    * (spark.hadoop.fs.s3a.* on the session) must reach executor tasks
    * too — a bare `new Configuration()` there silently drops them and
    * every granule "quarantines" on auth errors. One definition for
    * every file-reading source (NetcdfGranuleSource,
    * Hdf5InsituSource). */
  def sessionConfSnapshot(spark: SparkSession): Map[String, String] = {
    val c = spark.sparkContext.hadoopConfiguration
    val it = c.iterator()
    val buf = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); buf += e.getKey -> e.getValue }
    buf.result()
  }

  /** Glob listing over any Hadoop-visible filesystem
    * (src_glob_listing): file:// here, hdfs:///s3a:// on a cluster.
    * `storageOptions` = per-source auth/endpoint overrides. */
  def globListing(
      spark: SparkSession,
      glob: String,
      storageOptions: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val conf = confWith(spark.sparkContext.hadoopConfiguration, storageOptions)
    val fsPath = new org.apache.hadoop.fs.Path(glob)
    val fs = fsPath.getFileSystem(conf)
    val statuses = Option(fs.globStatus(fsPath)).getOrElse(Array.empty)
    statuses.map(_.getPath.toString).sorted.toSeq.toDF("url")
  }
}
