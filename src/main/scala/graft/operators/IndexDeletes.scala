package graft.operators

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tombstone deletes for the persisted index layouts — the GDPR /
  * takedown / retraction path a 100 TB serving index needs. The
  * reference's catalog deletes items through the STAC Transaction
  * extension (DELETE, served by pgstac — docker-compose.yml:30-44);
  * the engine's index twin cannot afford the relational answer
  * (rewrite the postings of one doc) because a document's rows are
  * scattered across term buckets: finding them means a corpus-wide
  * scan. So deletion is split the way every LSM-shaped store splits
  * it:
  *
  *   1. DELETE (this object) — write the ids to
  *      `deletes/batch_id=D/`: O(batch) work, immediate effect.
  *   2. SERVE — every read path anti-joins the (small, broadcast)
  *      tombstone set and corrects derived statistics, so a deleted
  *      doc is invisible the moment the tombstone lands.
  *   3. COMPACT — the next maintenance fold physically drops the
  *      tombstoned rows, rebuilds derived tables, and clears the
  *      tombstones (see compactTextIndex / compactVectorIndex).
  *
  * Tombstones kill ALL rows of an id, whatever ingest batch they
  * arrived in — so a deleted id stays dead until a compaction clears
  * its tombstone; re-ingesting the same id is only defined after that
  * compaction boundary. Delete batches share the ingest stream's
  * monotone batch-id space (they are stream batches), so the
  * exactly-once layout contract carries over: a replayed delete batch
  * overwrites its own partition.
  */
object IndexDeletes {

  val Subdir = "deletes"

  /** The live tombstone ids at `root`, as a 1-column (`idCol`)
    * distinct frame — None when no tombstones exist (the common case;
    * serve paths skip all delete handling on None). Directory-probe
    * cheap: no Spark job when the dir is absent or holds no data. */
  // engine-owned layout (long ids under batch_id partitions) —
  // declaring it skips footer inference on every tombstone-aware serve
  private def delSchema(idCol: String) = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField(idCol, LongType), StructField("batch_id", LongType)))
  }

  def readDeletes(s: SparkSession, root: String,
      idCol: String): Option[DataFrame] = {
    val p = Paths.get(root, Subdir)
    if (!hasParquet(p)) None
    else Some(s.read.schema(delSchema(idCol)).parquet(s"$root/$Subdir")
      .select(col(idCol)).distinct())
  }

  /** Tombstones written by batch `batchId` (empty frame if none) —
    * used to make delete-batch REPLAYS self-consistent: a replay must
    * recompute its "newly deleted" set against everyone ELSE's
    * tombstones, not its own first attempt's. */
  def readDeletesExcept(s: SparkSession, root: String, idCol: String,
      batchId: Long): Option[DataFrame] = {
    val p = Paths.get(root, Subdir)
    if (!hasParquet(p)) None
    else Some(s.read.schema(delSchema(idCol)).parquet(s"$root/$Subdir")
      .filter(col("batch_id") =!= batchId)
      .select(col(idCol)).distinct())
  }

  /** Land one delete batch's tombstones under
    * `deletes/batch_id=D/` — dynamic partition overwrite scoped to
    * this batch, so replays overwrite themselves. */
  def writeTombstones(ids: DataFrame, root: String, idCol: String,
      batchId: Long): Unit =
    ids.select(col(idCol)).distinct()
      .withColumn("batch_id", lit(batchId))
      .coalesce(1)
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic").mode("overwrite")
      .parquet(s"$root/$Subdir")

  /** Drop every tombstone — called by compaction AFTER the folds have
    * physically removed the tombstoned rows and rebuilt the derived
    * tables. Anti-joining an already-removed row is a no-op, so a
    * crash anywhere before this point leaves serving correct; a crash
    * during it at worst leaves some tombstones behind (still
    * correct, just re-filtered until the next compaction). */
  def clearDeletes(root: String): Unit =
    IndexManifest.deleteRecursively(Paths.get(root, Subdir))

  /** Fence replayed delete batches, THEN drop the tombstones: records
    * `compact.through.deletes = max folded delete batch id` before
    * clearing, so a delete stream whose checkpoint is lost cannot
    * re-apply a pre-compaction tombstone batch — its ids may have
    * been legitimately re-ingested since the compaction boundary, and
    * a bare replay would silently erase them. The commit paths
    * (compactTextIndex / compactVectorIndex / finalizeRebuild) call
    * this in place of a bare clear; crash between fence and clear is
    * safe (leftover tombstones of already-removed rows are no-ops and
    * the next maintenance pass re-clears). */
  def fenceAndClear(root: String): Unit = {
    if (!Files.isDirectory(Paths.get(root, Subdir))) return
    val ids = IndexCompaction.listBatchIds(Paths.get(root, Subdir))
    if (ids.nonEmpty) {
      val prev = IndexCompaction.compactedThrough(root, Subdir)
      IndexManifest.update(root,
        Map(s"compact.through.$Subdir" ->
          math.max(prev, ids.max).toString))
    }
    clearDeletes(root)
  }

  /** Whether any tombstones exist at `root` (directory probe only). */
  def hasDeletes(root: String): Boolean =
    hasParquet(Paths.get(root, Subdir))

  private[operators] def hasParquet(p: java.nio.file.Path): Boolean = {
    if (!Files.isDirectory(p)) return false
    val s = Files.walk(p)
    try s.iterator().asScala.exists(f => Files.isRegularFile(f) &&
      f.getFileName.toString.endsWith(".parquet"))
    finally s.close()
  }
}
