package graft.operators

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compaction for the persisted index layouts.
  *
  * Streamed ingest lands every micro-batch in its own
  * `<part>=P/batch_id=M/` partition directory (that layout IS the
  * exactly-once contract: a replayed batch overwrites itself). The
  * price accrues at serve time: after thousands of micro-batches each
  * pruned partition holds thousands of tiny files, and file LISTING —
  * not data volume — starts to dominate the serve path. At deployment
  * scale this is the classic small-files problem; compaction is the
  * maintenance operation that pays it down.
  *
  * `compact` folds every batch partition into the single LARGEST
  * batch id per part value (so the stream's monotonically increasing
  * ids stay monotone across a compaction) and then drops the older
  * batch directories. **Batch-id contract**: `batch_id` is a LAYOUT
  * coordinate (the exactly-once replay key), not document provenance —
  * compaction relabels every folded row to the fold target `mx` and
  * discards the original ids. Consumers that need per-row lineage must
  * carry it as a data column; anything comparing index content across
  * a compaction must compare modulo `batch_id`. The fold is crash-safe via a write-ahead journal
  * in the index manifest:
  *
  *   1. STAGE   — write the merged layout to `<subdir>.compacting/`
  *                and mark it complete with a `_STAGED` file. A crash
  *                here leaves the live directory untouched; the next
  *                compaction overwrites the debris.
  *   2. JOURNAL — record `compact.pending.<subdir> = mx` in the
  *                manifest (a single-file replace — the atomic pointer).
  *   3. SWAP    — per part directory: delete the live one, move the
  *                staged one in. Idempotent: already-moved parts are
  *                gone from the staging dir, so a crashed swap re-runs
  *                to completion.
  *   4. COMMIT  — clear the journal key, record
  *                `compact.through.<subdir> = mx`, drop the staging dir.
  *
  * `recover` (called first by `compact`, and by the open paths) replays
  * an interrupted swap from the journal. The directory moves assume
  * rename-capable storage (local fs, HDFS); on an object store the
  * same journal drives a copy+delete swap or a generation-pointer
  * layout — see SCALE.md.
  *
  * After compacting through mx, a streaming replay of any batch id
  * <= mx would dynamic-overwrite a partition that now holds the whole
  * MERGED corpus — catastrophic data loss, not just a double count —
  * so the append kernels (`appendToIndex`, `appendToVectorIndex`)
  * reject such ids loudly via [[compactedThrough]]. Compaction is a
  * quiesce-time maintenance op: run it when the stream is stopped and
  * checkpoint-committed. On the SERVE side the quiesce contract is
  * enforced, not just stated: the top-level maintenance ops
  * (compactTextIndex / compactVectorIndex / rebuild / repair) run
  * under [[IndexLease.withMaintenance]] and refuse while any in-JVM
  * serve lease is held — the swap deletes live directories, and a
  * reader mid-scan cannot be guaranteed pre-or-post state on file://.
  */
object IndexCompaction {

  /** What one compaction did: the batch id everything folded into,
    * and the data-file count before/after (the small-files number). */
  final case class CompactStats(
      subdir: String, compactedThrough: Long, batchDirsBefore: Long,
      filesBefore: Long, filesAfter: Long, noop: Boolean)

  private def pendingKey(subdir: String) = s"compact.pending.$subdir"
  private def throughKey(subdir: String) = s"compact.through.$subdir"

  /** The largest batch id folded away at `root/subdir`, or -1 if never
    * compacted. Append kernels must only write batch ids ABOVE this. */
  def compactedThrough(root: String, subdir: String): Long =
    IndexManifest.readIfExists(root)
      .get(throughKey(subdir)).map(_.toLong).getOrElse(-1L)

  /** Fold all `batch_id` partitions of `root/subdir` (partitioned by
    * `partCols :+ batch_id`) into one batch partition per part value.
    * `merge` transforms the unified read before rewrite — identity for
    * postings/assignments, an aggregate fold for summable stats, a
    * tombstone anti-join when deletes are being applied. `force` runs
    * the fold even over a single batch partition (needed exactly when
    * `merge` must rewrite content — e.g. pending tombstones — and the
    * small-files motive alone would have skipped it). */
  def compact(s: SparkSession, root: String, subdir: String,
      partCols: Seq[String],
      merge: DataFrame => DataFrame = identity,
      force: Boolean = false): CompactStats = {
    recover(root, subdir)
    val live = Paths.get(root, subdir)
    require(Files.isDirectory(live), s"no $subdir under $root")
    val batchIds = listBatchIds(live)
    val before = countDataFiles(live)
    if (batchIds.isEmpty || (batchIds.size <= 1 && !force))
      return CompactStats(subdir, batchIds.headOption.getOrElse(-1L),
        batchIds.size, before, before, noop = true)
    val mx = batchIds.max
    stage(s, root, subdir, partCols, merge, mx)
    journal(root, subdir, mx)
    finalizeSwap(root, subdir)
    CompactStats(subdir, mx, batchIds.size, before, countDataFiles(live),
      noop = false)
  }

  /** Phase 1: write the merged layout to `<subdir>.compacting/` and
    * mark it `_STAGED`. Never touches the live directory. */
  private[operators] def stage(s: SparkSession, root: String,
      subdir: String, partCols: Seq[String],
      merge: DataFrame => DataFrame, mx: Long): Unit = {
    val tmp = stagingDir(root, subdir)
    IndexManifest.deleteRecursively(tmp)
    val unified = merge(s.read.parquet(s"$root/$subdir").drop("batch_id"))
      .withColumn("batch_id", lit(mx))
    // one output task per part value -> exactly one data file per
    // compacted partition directory
    val repartitioned =
      if (partCols.isEmpty) unified.repartition(1)
      else unified.repartition(partCols.map(col): _*)
    repartitioned.write
      .partitionBy(partCols :+ "batch_id": _*)
      .mode("overwrite").parquet(tmp.toString)
    // The marker carries the staged part-dir NAMES (v2): they are the
    // authoritative post-swap directory set. Without it, a part value
    // whose every row was merged away (a bucket/cid list fully
    // tombstoned by a delete-applying fold) leaves no staged
    // counterpart, the swap never touches its live dir, and the
    // supposedly-deleted rows would resurrect once the tombstones are
    // cleared. Written to a temp name + atomic-ish move so a crash
    // mid-write cannot leave a torn marker that reads as complete.
    val markerTmp = tmp.resolve("_STAGED.tmp")
    Files.write(markerTmp,
      ("v2" +: partDirs(tmp).map(_.getFileName.toString))
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(markerTmp, tmp.resolve("_STAGED"))
  }

  /** Phase 2: the atomic journal write that makes the swap mandatory. */
  private[operators] def journal(root: String, subdir: String,
      mx: Long): Unit =
    IndexManifest.update(root, Map(pendingKey(subdir) -> mx.toString))

  /** Phases 3+4: move staged part directories over the live ones, then
    * commit. Idempotent — safe to re-run from any crash point after
    * the journal entry exists, and tolerant of a concurrent recoverer
    * having already moved individual part dirs (the staged source
    * vanishing under us with the target present means someone else
    * completed that move; anything else is a real error). */
  private[operators] def finalizeSwap(root: String, subdir: String): Unit = {
    val pending = IndexManifest.readIfExists(root).get(pendingKey(subdir))
    require(pending.isDefined, s"no pending compaction for $subdir at $root")
    val mx = pending.get.toLong
    val live = Paths.get(root, subdir)
    val tmp = stagingDir(root, subdir)
    // v2 markers list the staged part-dir names — the authoritative
    // post-swap set (see stage()). Read BEFORE moving: the staged dirs
    // drain out of tmp as they move, but the intended end state must
    // not. Legacy (empty) markers yield None and fall back to the old
    // batch_id-only prune.
    val stagedSet: Option[Set[String]] = {
      val marker = tmp.resolve("_STAGED")
      if (!Files.exists(marker)) None
      else {
        val lines = Files.readAllLines(marker).asScala
          .map(_.trim).filter(_.nonEmpty).toSeq
        if (lines.headOption.contains("v2")) Some(lines.tail.toSet) else None
      }
    }
    partDirs(tmp).foreach { staged =>
      moveStagedOver(staged, live.resolve(staged.getFileName))
    }
    stagedSet match {
      case Some(names) =>
        // any live part dir outside the staged set was either fully
        // merged into a staged sibling (old top-level batch dirs) or
        // fully EMPTIED by the merge (a bucket/cid whose every row was
        // tombstoned — it gets no staged counterpart at all, because
        // Spark writes no partition dir for zero rows). Both must go:
        // leaving the emptied dir would resurrect deleted rows the
        // moment fenceAndClear drops their tombstones. Idempotent
        // across crash-replays — the set comes from the durable
        // marker, not from what happens to remain in tmp.
        partDirs(live).foreach { d =>
          if (!names.contains(d.getFileName.toString))
            IndexManifest.deleteRecursively(d)
        }
      case None =>
        // legacy marker: stats-style layouts have no part column —
        // batch dirs sit directly under the subdir. Any live batch dir
        // older than mx is fully merged into the staged output — drop
        // it. (Emptied part dirs cannot be detected without the v2
        // name list; legacy staged runs predate delete-applying
        // compactions, so none can exist.)
        partDirs(live).foreach { d =>
          val n = d.getFileName.toString
          if (n.startsWith("batch_id=") &&
            n.stripPrefix("batch_id=").toLong < mx)
            IndexManifest.deleteRecursively(d)
        }
    }
    // fences only ever RISE: mx is the max batch id the fold saw, but
    // the standing fence can legitimately sit higher — migrateToLanes
    // stamps it at the root's global max (delete batches included),
    // and a repair that only dropped empty centroids fences at a fold
    // id it never wrote. Committing a bare mx here would LOWER such a
    // fence and re-admit exactly the replays it was raised to reject.
    val prior = IndexManifest.readIfExists(root)
      .get(throughKey(subdir)).map(_.toLong).getOrElse(-1L)
    IndexManifest.update(root,
      Map(throughKey(subdir) -> math.max(prior, mx).toString),
      remove = Seq(pendingKey(subdir)))
    IndexManifest.deleteRecursively(tmp)
  }

  /** Replace `target` with `staged` tolerantly: an absent staged dir
    * with the target already a directory means another recoverer
    * completed this move first (skip); anything else is a real error.
    * THE shared staged-swap move — compaction's finalizeSwap and the
    * IVF rebuild's finalizeRebuild both go through here so the
    * crash/concurrency semantics live in exactly one place. */
  private[operators] def moveStagedOver(staged: Path, target: Path): Unit =
    if (Files.exists(staged)) {
      IndexManifest.deleteRecursively(target)
      try Files.move(staged, target)
      catch {
        case e: java.nio.file.NoSuchFileException =>
          if (!Files.isDirectory(target)) throw e
      }
    }

  /** How long a `.recovering` lease may sit unrefreshed before another
    * opener declares its holder dead and breaks it. Holders refresh
    * their lease at a quarter of this period, so only a genuinely
    * dead process goes stale — a long recovery (thousands of dir
    * moves on slow storage) keeps its lease alive. */
  private val LeaseStaleMs = 60000L

  /** Serialize a destructive recovery section on `root` behind a
    * lease file (`<name>.recovering`, atomic create): a second opener
    * waits the holder out; a lease older than [[LeaseStaleMs]] is
    * presumed orphaned by a crashed holder and broken. Two hardening
    * details: the holder writes a unique token into the lease and a
    * daemon thread refreshes its mtime, so (a) a live holder is never
    * declared stale however long the body runs, and (b) a holder
    * whose lease WAS broken (e.g. a 60 s GC pause) will not delete
    * the new holder's lease on exit — it only removes a lease still
    * carrying its own token. Shared by compaction recovery and the
    * IVF rebuild's swap recovery. */
  private[operators] def withRecoveryLease[T](root: String, name: String)(
      body: => T): T = {
    val lease = Paths.get(root, s"$name.recovering")
    val token = java.util.UUID.randomUUID().toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val deadline = System.nanoTime() + LeaseStaleMs * 2000000L
    var held = false
    while (!held) {
      try {
        Files.write(lease, token,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // another opener is recovering this section — wait it out
          val age = try System.currentTimeMillis() -
            Files.getLastModifiedTime(lease).toMillis
          catch { case _: java.io.IOException => 0L }
          if (age > LeaseStaleMs) Files.deleteIfExists(lease)
          else if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"recovery lease $lease still held after wait — a crashed " +
                "holder should have gone stale; remove the file if the " +
                "holding process is known dead")
          else Thread.sleep(50)
      }
    }
    val refresher = new Thread(() => {
      var alive = true
      while (alive) {
        try {
          Thread.sleep(LeaseStaleMs / 4)
          Files.setLastModifiedTime(lease,
            java.nio.file.attribute.FileTime.fromMillis(
              System.currentTimeMillis()))
        } catch {
          case _: InterruptedException => alive = false
          // a transient refresh failure (busy mount) must NOT kill the
          // refresher — that would let a live holder's lease go stale
          // and re-admit the concurrent-recovery race; retry next tick
          case _: java.io.IOException => ()
        }
      }
    }, s"graft-lease-refresh-$name")
    refresher.setDaemon(true)
    refresher.start()
    try body finally {
      refresher.interrupt()
      // delete only OUR lease — if it was broken and re-acquired, the
      // file now carries the new holder's token and must survive
      try if (Files.exists(lease) &&
        java.util.Arrays.equals(Files.readAllBytes(lease), token))
        Files.deleteIfExists(lease)
      catch { case _: java.io.IOException => () }
    }
  }

  /** Replay an interrupted compaction. A journal entry with a complete
    * (`_STAGED`) staging dir re-runs the swap; a journal entry whose
    * staging dir is gone is only trusted as "swap finished, commit
    * raced the crash" when the live layout proves it (exactly the one
    * folded batch partition) — any other layout means external
    * interference, and committing would delete unmerged live data, so
    * the attempt is abandoned instead. Destructive moves over live
    * bucket directories are serialized by [[withRecoveryLease]]. */
  def recover(root: String, subdir: String): Unit = {
    // fast path — no journal entry, nothing to do, no lease taken
    if (IndexManifest.readIfExists(root).get(pendingKey(subdir)).isEmpty)
      return
    withRecoveryLease(root, subdir) {
      // re-read under the lease: the previous holder may have finished
      val m = IndexManifest.readIfExists(root)
      m.get(pendingKey(subdir)).foreach { p =>
        val mx = p.toLong
        val live = Paths.get(root, subdir)
        val tmp = stagingDir(root, subdir)
        if (Files.exists(tmp.resolve("_STAGED")))
          finalizeSwap(root, subdir)
        else if (!Files.isDirectory(tmp) &&
          listBatchIds(live) == Seq(mx))
          finalizeSwap(root, subdir) // swap done; only the commit is owed
        else {
          // either a half-written stage (no marker: the live dir was
          // never touched, moves happen strictly after the marker) or
          // a vanished stage over a live layout that is NOT the folded
          // end state — committing would delete unmerged batches.
          // Abandon: drop the debris and the journal entry.
          IndexManifest.deleteRecursively(tmp)
          IndexManifest.update(root, Map.empty,
            remove = Seq(pendingKey(subdir)))
        }
      }
    }
  }

  /** Replay every unreplayed compaction journal at `root` — the guard
    * the APPEND/DELETE kernels run before landing new batch
    * directories. A crashed compaction's pending journal will replay
    * eventually (the next compact() or open path), and the v2
    * marker-driven prune then deletes every live part dir absent from
    * the staged set — which would include anything appended after the
    * crash but before the replay. Replaying first keeps the prune's
    * view of "live" current, so resumed streams cannot lose batches
    * to a later recovery. Cheap when nothing is pending: one manifest
    * read, no lease taken. */
  def recoverAllPending(root: String): Unit =
    IndexManifest.readIfExists(root).keys
      .filter(_.startsWith("compact.pending."))
      .toSeq.sorted
      .foreach(k => recover(root, k.stripPrefix("compact.pending.")))

  private def stagingDir(root: String, subdir: String): Path =
    Paths.get(root, s"$subdir.compacting")

  private def partDirs(p: Path): Seq[Path] = {
    if (!Files.isDirectory(p)) return Nil
    val s = Files.list(p)
    try s.iterator().asScala.filter(d => Files.isDirectory(d) &&
      d.getFileName.toString.contains("=")).toSeq
    finally s.close()
  }

  /** All batch ids present anywhere under `dir` (metadata-only: walks
    * directory names, reads no data). */
  private[graft] def listBatchIds(dir: Path): Seq[Long] = {
    val s = Files.walk(dir)
    try s.iterator().asScala
      .filter(d => Files.isDirectory(d) &&
        d.getFileName.toString.startsWith("batch_id="))
      .map(_.getFileName.toString.stripPrefix("batch_id=").toLong)
      .toSeq.distinct
    finally s.close()
  }

  private[operators] def countDataFiles(dir: Path): Long = {
    val s = Files.walk(dir)
    try s.iterator().asScala.count(f => Files.isRegularFile(f) &&
      f.getFileName.toString.endsWith(".parquet"))
    finally s.close()
  }
}
