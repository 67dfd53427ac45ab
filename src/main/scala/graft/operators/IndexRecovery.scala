package graft.operators

/** One place to ask "did a maintenance op crash mid-swap at this
  * root?" and to replay it SAFELY.
  *
  * The append/delete kernels must replay a crashed compaction/
  * rebuild/repair before landing new batch directories (the eventual
  * replay's marker-driven prune deletes live part dirs absent from
  * its staged set — anything appended in between would be eaten).
  * But the replay itself moves and deletes live directories, which is
  * exactly what [[IndexLease.withMaintenance]] exists to fence from
  * concurrent serve readers — replaying UNLEASED from an append path
  * would re-open the mid-swap vanished-file race for any serve
  * running at that moment, in this JVM or (via the serve epochs)
  * another one. So the kernels route through [[replayPendingLeased]]:
  * one manifest read when the root is clean (the overwhelmingly
  * common case — no lease taken, no epoch scan), and the full
  * exclusive-maintenance discipline only when a crashed journal
  * actually needs replaying. If serves are live at that moment the
  * append FAILS LOUDLY with the lease's quiesce message rather than
  * racing — the same contract every scheduled maintenance op obeys.
  *
  * Maintenance bodies already inside [[IndexLease.withMaintenance]]
  * (compact/rebuild/repair/migrateToLanes) keep calling the raw
  * recover routines directly — the lease is not reentrant, and they
  * already hold it.
  */
object IndexRecovery {

  /** Journal keys whose presence means a crashed maintenance swap has
    * not been replayed. One manifest read; Nil for clean or absent
    * roots. */
  def pendingKeys(root: String): Seq[String] =
    IndexManifest.readIfExists(root).keys.filter { k =>
      k.startsWith("compact.pending.") ||
        k == "rebuild.pending" || k == "repair.pending"
    }.toSeq.sorted

  /** Replay any crashed maintenance journal at `root` under the
    * exclusive maintenance lease; no-op (one manifest read, no lease)
    * when the root is clean. Throws the lease's quiesce error if
    * serves are live — the caller must quiesce and retry, never
    * append over an unreplayed swap. */
  def replayPendingLeased(root: String): Unit =
    if (pendingKeys(root).nonEmpty)
      IndexLease.withMaintenance(root) {
        // re-checked implicitly: each recover routine re-reads the
        // manifest and no-ops if another maintainer won the race
        IndexCompaction.recoverAllPending(root)
        SimilarityQueries.recoverRebuild(root)
        SimilarityQueries.recoverRepair(root)
      }
}
