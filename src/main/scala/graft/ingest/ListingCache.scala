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

  /** Glob listing over any Hadoop-visible filesystem
    * (src_glob_listing): file:// here, hdfs:///s3a:// on a cluster. */
  def globListing(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fsPath = new org.apache.hadoop.fs.Path(glob)
    val fs = fsPath.getFileSystem(conf)
    val statuses = Option(fs.globStatus(fsPath)).getOrElse(Array.empty)
    statuses.map(_.getPath.toString).sorted.toSeq.toDF("url")
  }
}
