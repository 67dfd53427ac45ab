package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog maintenance: file-level statistics and small-file
  * compaction for the partitioned parquet store.
  *
  * An incrementally-upserted catalog accretes small files — every
  * merge rewrites its affected partitions with however many tasks the
  * merge ran, and a month of hourly streaming micro-batches can leave
  * thousands of KB-sized files per leaf. At 100 TB that is the
  * difference between a scan issuing 10⁶ vs 10⁸ object-store GETs and
  * between planning 128 MB splits vs per-file splits. Compaction is
  * the standing maintenance operator every production table format
  * (Delta OPTIMIZE, Iceberg rewrite_data_files) ships; this is the
  * engine-native form for the plain-parquet catalog
  * (cf. pgstac's VACUUM/partition maintenance role behind the
  * reference's ToPgStac sink, avhrr recipe.py:85,137).
  */
object CatalogMaintenance {

  /** Per-file statistics via the `_metadata` hidden column — one scan,
    * no driver-side listing: (file, bytes, n_rows, leaf). The
    * compaction planner's input and a useful health audit on its own
    * (file-size histograms, sliver detection). */
  def fileStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"),
        col("_metadata.file_size").as("bytes"))
      .groupBy(col("file"), col("bytes"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("leaf", regexp_replace(col("file"), "/[^/]*$", ""))

  /** Compact every partition leaf whose file count exceeds what
    * `targetBytes` (default 128 MB — one scan split) implies: each
    * such leaf is re-read, coalesced to ⌈bytes/target⌉ files, staged
    * beside the leaf, and swapped in with the same checked
    * backup/swap/restore protocol as upsert (object stores take a
    * committer overwrite of exactly that leaf instead). Returns
    * (leaves examined, leaves compacted).
    *
    * Scale shape: one driver listing per leaf (bounded by partition
    * count, not file count × data), one read+write job per compacted
    * leaf touching only that leaf's bytes. Readers are never exposed
    * to a partial leaf: the swap is a metadata rename, and a crash
    * preserves either the original leaf or its hidden backup. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val st = fs.listStatus(p).toSeq
        .filterNot(_.getPath.getName.startsWith("."))
      val subs = st.filter(s => s.isDirectory &&
          s.getPath.getName.contains("="))
        .flatMap(s => leaves(s.getPath))
      val hasData = st.exists(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet"))
      if (hasData) subs :+ p else subs
    }
    val all = leaves(hPath)
    var compacted = 0
    all.foreach { leaf =>
      val files = fs.listStatus(leaf).toSeq.filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val want = math.max(1L,
        math.ceil(bytes.toDouble / targetBytes).toLong).toInt
      if (files.length > want) {
        val staging = new org.apache.hadoop.fs.Path(leaf.getParent,
          s".${leaf.getName}.compact-${java.util.UUID.randomUUID}")
        // the staging WRITE may fail with the leaf untouched — safe
        // to clean up and rethrow
        try {
          spark.read.parquet(leaf.toString)
            .coalesce(want)
            .write.mode("overwrite").parquet(staging.toString)
        } catch {
          case e: Throwable =>
            // best-effort cleanup must never mask the write failure
            try fs.delete(staging, true)
            catch { case _: Throwable => () }
            throw e
        }
        if (CatalogStore.atomicRenameFs(fs)) {
          // a swap failure restores the original (or its backup);
          // staging is preserved and named for manual recovery. On
          // success the staging path itself was renamed onto the
          // leaf — nothing left to clean up.
          try CatalogStore.swapDir(fs, staging, leaf)
          catch {
            case e: Throwable => throw new java.io.IOException(
              s"compaction swap failed; staged copy preserved at $staging", e)
          }
        } else {
          // object store: committer overwrite of exactly this leaf
          // (static — never dynamic, so cloud committers are fine).
          // mode(overwrite) deletes the leaf BEFORE the rewrite job
          // runs, so on failure the STAGING COPY is the only
          // remaining data — never delete it here; preserve and name
          // it, exactly like upsert's commit path.
          try {
            spark.read.parquet(staging.toString)
              .write.mode("overwrite").parquet(leaf.toString)
          } catch {
            case e: Throwable => throw new java.io.IOException(
              s"compaction overwrite failed; staged copy preserved at $staging", e)
          }
          fs.delete(staging, true)
        }
        compacted += 1
      }
    }
    (all.length, compacted)
  }
}
