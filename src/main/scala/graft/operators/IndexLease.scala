package graft.operators

import java.nio.file.{Files, Path, Paths}

/** Serve/maintenance mutual exclusion per index root — in-JVM fast
  * path plus a durable on-disk layer for the multi-process fleet.
  *
  * The maintenance swaps (compaction, rebuild, repair) DELETE live
  * part directories and move staged ones in. On rename-capable
  * storage that is crash-safe (the journal replays), but it is not
  * READER-safe: a query planned against the pre-swap file listing can
  * hit a vanished file mid-scan, and "every response is either the
  * pre- or post-state" cannot be guaranteed on file:// while dirs
  * move underneath the scan. So the quiesce contract the maintenance
  * scaladocs state is ENFORCED here rather than asserted:
  *
  *   - the serve facade ([[IndexServe]]) wraps each query's
  *     plan+execute in [[withServeLease]] (shared — any number may
  *     hold it);
  *   - every maintenance op body runs inside [[withMaintenance]]
  *     (exclusive), which REFUSES — loudly, with the live lease
  *     count — while any serve lease is held, and makes new serve
  *     leases fail while maintenance runs.
  *
  * IN-JVM layer: one atomic long per root (≥0 = active serve-lease
  * count, −1 = maintenance in progress) — exact, free, and the only
  * layer a single-process deployment needs.
  *
  * CROSS-PROCESS layer (the 100 TB deployment is a serve fleet plus a
  * maintenance scheduler, not one JVM): both sides leave heartbeats
  * under the root and each refuses on the other's FRESH foreign
  * heartbeat, stealing stale ones —
  *
  *   - each serving process refreshes its own `serve.epoch.<token>`
  *     file (token = per-JVM UUID); a daemon ticker keeps it fresh
  *     while any in-JVM serve lease is held, so a long-running query
  *     cannot go stale mid-scan;
  *   - maintenance holds `maintenance.recovering` — the same
  *     token-carrying, mtime-heartbeat, stale-breakable lease file
  *     the crash-recovery replays use
  *     ([[IndexCompaction.withRecoveryLease]]), so two processes'
  *     maintenance serializes and a crashed maintainer's lease is
  *     broken after [[StaleMs]];
  *   - ORDER makes the race safe: serve refreshes its epoch BEFORE
  *     checking the maintenance lease; maintenance acquires its lease
  *     BEFORE scanning epochs. Whichever lands second sees the other
  *     and refuses — there is no interleaving where both proceed. A
  *     serve refused this way retracts its epoch (when it holds the
  *     only in-JVM lease) so the maintainer's next attempt proceeds.
  *
  * A process that dies mid-serve leaves an epoch that goes stale in
  * [[StaleMs]] and is then stolen by the next maintenance attempt;
  * a maintainer that dies leaves a lease the next serve breaks the
  * same way. Heartbeat refresh runs at a quarter of the staleness
  * window, so only genuinely dead processes get stolen from. The
  * on-disk layer assumes the root's filesystem gives create-if-absent
  * and mtime (local fs, NFS, HDFS-style mounts); SCALE.md documents
  * the fleet contract and the object-store variant.
  */
object IndexLease {

  /** How long a heartbeat may sit unrefreshed before another process
    * declares its holder dead. Shared with the recovery-lease
    * discipline ([[IndexCompaction]]). */
  private[operators] val StaleMs = 60000L

  /** This JVM's identity in the on-disk layer. */
  private[operators] val processToken: String =
    java.util.UUID.randomUUID().toString

  /** "Never refreshed" sentinel for RootState.lastRefresh. NOT 0:
    * System.nanoTime has an arbitrary origin and may be small or
    * negative, so a 0 sentinel compared with `now - 0 < window` would
    * silently suppress every epoch write while nanoTime sits below
    * the window — no heartbeat at all, and a foreign maintainer would
    * see no fresh epochs over live serves. */
  private val Never = Long.MinValue

  private final class RootState {
    val count = new java.util.concurrent.atomic.AtomicLong(0L)
    // nanoTime of the last epoch-file refresh (throttles serve-path
    // writes to one per quarter-staleness window)
    val lastRefresh = new java.util.concurrent.atomic.AtomicLong(Never)
    @volatile var ticker: Thread = null
  }

  private val states =
    new java.util.concurrent.ConcurrentHashMap[String, RootState]()

  private def state(root: String): RootState =
    states.computeIfAbsent(canonical(root), _ => new RootState)

  /** Testing hook: drop the in-JVM layer (simulates a process that
    * restarted — the on-disk layer must carry the contract alone). */
  private[operators] def resetInJvmStateForTest(): Unit = states.clear()

  /** One key per PHYSICAL root: toRealPath resolves symlinks (a serve
    * tier opening `/indexes/current` and a scheduler configured with
    * the target dir must collide on one counter — normalize alone
    * would give them independent locks and void the exclusion).
    * Falls back to the normalized absolute path when the root does
    * not exist yet. */
  private def canonical(root: String): String =
    try java.nio.file.Paths.get(root).toRealPath().toString
    catch {
      case _: java.io.IOException =>
        java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString
    }

  private def epochFile(root: String): Path =
    Paths.get(root, s"serve.epoch.$processToken")

  private def maintenanceLease(root: String): Path =
    Paths.get(root, "maintenance.recovering")

  private def ageMs(p: Path): Long =
    try System.currentTimeMillis() - Files.getLastModifiedTime(p).toMillis
    catch { case _: java.io.IOException => Long.MaxValue }

  /** Write/refresh this process's serve epoch, throttled to one disk
    * touch per quarter window. Roots that don't exist yet (pure
    * in-JVM test fixtures) are skipped silently. */
  private def refreshEpoch(root: String, st: RootState): Unit = {
    val now = System.nanoTime()
    val last = st.lastRefresh.get()
    if (last != Never && now - last < StaleMs * 250000L)
      return // refreshed < StaleMs/4 ago (nanos)
    if (!st.lastRefresh.compareAndSet(last, now)) return // someone else is on it
    try {
      val f = epochFile(root)
      if (Files.exists(f))
        Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis()))
      else if (Files.isDirectory(Paths.get(root))) {
        Files.write(f, processToken.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        f.toFile.deleteOnExit() // a clean exit retracts its heartbeat
      }
    } catch { case _: java.io.IOException => () } // transient; next tick retries
  }

  /** Keep the epoch fresh while serve leases are held, however long a
    * single query runs — the per-call refresh alone would let a >60 s
    * collect go stale mid-scan and be stolen from. One daemon per
    * actively-served root; it idles (no disk touch) at count 0. */
  private def ensureTicker(root: String, st: RootState): Unit = {
    if (st.ticker != null && st.ticker.isAlive) return
    st.synchronized {
      if (st.ticker != null && st.ticker.isAlive) return
      val t = new Thread(() => {
        while (true) {
          try Thread.sleep(StaleMs / 4)
          catch { case _: InterruptedException => return }
          if (st.count.get() > 0L) {
            st.lastRefresh.set(Never) // force through the throttle
            refreshEpoch(root, st)
          }
        }
      }, s"graft-serve-epoch-$processToken")
      t.setDaemon(true)
      t.start()
      st.ticker = t
    }
  }

  /** Hold a shared serve lease on `root` around a query's plan AND
    * execution (the DataFrame a serve path returns is lazy — a lease
    * held only during construction protects nothing). Throws
    * IllegalStateException while maintenance holds the root — whether
    * that maintenance is this process (in-JVM state) or another one
    * (fresh on-disk maintenance lease). */
  def withServeLease[T](root: String)(body: => T): T = {
    val st = state(root)
    var ok = false
    while (!ok) {
      val v = st.count.get()
      if (v < 0L) throw new IllegalStateException(
        s"index root $root is under maintenance (compaction/rebuild/" +
          "repair) — serve again when it completes")
      ok = st.count.compareAndSet(v, v + 1L)
    }
    try {
      // epoch BEFORE the foreign-maintenance check (write-then-check:
      // a maintainer landing concurrently checks epochs after its own
      // lease write, so one of us is guaranteed to see the other)
      refreshEpoch(root, st)
      ensureTicker(root, st)
      val ml = maintenanceLease(root)
      if (Files.exists(ml)) {
        val foreign = try !java.util.Arrays.equals(
          Files.readAllBytes(ml),
          processToken.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        catch { case _: java.io.IOException => false } // vanished = released
        if (foreign) {
          if (ageMs(ml) > StaleMs) {
            // Dead maintainer. If it died MID-SWAP (pending journal
            // keys in the manifest), the live layout may be half
            // swapped — some part dirs deleted, staged ones not yet
            // moved in — and serving it would silently return wrong
            // results (missing documents) on every request. Refuse
            // with the remediation instead of stealing the lease.
            if (IndexRecovery.pendingKeys(root).nonEmpty)
              throw new IllegalStateException(
                s"index root $root has a STALE maintenance lease and " +
                  "an unreplayed maintenance journal — the maintainer " +
                  "died mid-swap and the live layout may be " +
                  "inconsistent; run IndexRecovery.replayPendingLeased" +
                  "(root) (any append/compact path does) before serving")
            // Died after commit (journal clear): the layout is
            // consistent — break the lease. Re-check staleness right
            // before the delete so a lease freshly RE-acquired by a
            // live maintainer during our age check is not deleted
            // (file leases have no atomic compare-and-delete; the
            // recheck narrows the window from a whole check-to-delete
            // stall to microseconds).
            if (ageMs(ml) > StaleMs) Files.deleteIfExists(ml)
          }
          else {
            // retract our epoch when we hold the only lease here, so
            // the live foreign maintainer's next attempt proceeds
            // (and un-throttle so the next serve re-creates it)
            if (st.count.get() == 1L)
              try {
                Files.deleteIfExists(epochFile(root))
                st.lastRefresh.set(Never)
              } catch { case _: java.io.IOException => () }
            throw new IllegalStateException(
              s"index root $root is under maintenance by another process " +
                "(fresh on-disk maintenance lease) — serve again when it " +
                "completes")
          }
        }
      }
      body
    } finally st.count.decrementAndGet()
  }

  /** Run a maintenance body holding the exclusive in-JVM lease AND the
    * durable on-disk lease. Refuses — rather than racing the swap
    * under live readers — while any serve lease is held in this JVM
    * or any OTHER process shows a fresh serve epoch; stale foreign
    * epochs (dead servers) are stolen. Two processes' maintenance
    * serializes on the heartbeat lease file (a crashed holder goes
    * stale and is broken). */
  def withMaintenance[T](root: String)(body: => T): T = {
    val st = state(root)
    if (!st.count.compareAndSet(0L, -1L)) {
      val v = st.count.get()
      throw new IllegalStateException(
        if (v > 0L)
          s"refusing maintenance on $root: $v serve lease(s) active — " +
            "quiesce the serve tier first (maintenance swaps move live " +
            "directories; a concurrent reader could scan a vanishing file)"
        else
          s"refusing maintenance on $root: another maintenance op holds it")
    }
    try {
      // roots that exist on disk get the durable layer; purely
      // in-JVM fixtures (root never created) keep the fast path
      if (!Files.isDirectory(Paths.get(root))) body
      else IndexCompaction.withRecoveryLease(root, "maintenance") {
        // lease BEFORE the epoch scan (see withServeLease's ordering
        // note). Our own epoch cannot represent active serves — the
        // in-JVM count was 0 — so it is retracted, not counted (and
        // the refresh throttle is reset so the next serve re-creates
        // it instead of riding a warm throttle into an epoch-less
        // window another maintainer could steal).
        try {
          Files.deleteIfExists(epochFile(root))
          st.lastRefresh.set(Never)
        } catch { case _: java.io.IOException => () }
        val foreign = listForeignEpochs(root)
        val fresh = foreign.filter(ageMs(_) <= StaleMs)
        if (fresh.nonEmpty)
          throw new IllegalStateException(
            s"refusing maintenance on $root: fresh serve epoch(s) from " +
              s"other process(es) [${fresh.map(_.getFileName).mkString(", ")}]" +
              " — quiesce the serve fleet first, or wait for the epochs " +
              s"to go stale (${StaleMs} ms) if those processes are dead")
        foreign.foreach { p => // stale: dead servers — steal
          // re-check age right before the delete: a server that was
          // merely paused may have refreshed its epoch since the scan
          // (deleting a FRESH epoch would admit this maintenance under
          // that server's live serves)
          try if (ageMs(p) > StaleMs) Files.deleteIfExists(p)
          catch { case _: java.io.IOException => () }
        }
        // post-steal re-scan: an epoch that turned fresh during the
        // steal (or survived it) means its server is alive after all
        val fresh2 = listForeignEpochs(root).filter(ageMs(_) <= StaleMs)
        if (fresh2.nonEmpty)
          throw new IllegalStateException(
            s"refusing maintenance on $root: serve epoch(s) " +
              s"[${fresh2.map(_.getFileName).mkString(", ")}] turned " +
              "fresh during the stale-epoch steal — the process is " +
              "alive; quiesce the serve fleet first")
        body
      }
    } finally st.count.set(0L)
  }

  private def listForeignEpochs(root: String): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala.filter { p =>
      val n = p.getFileName.toString
      n.startsWith("serve.epoch.") && n != s"serve.epoch.$processToken"
    }.toSeq
    finally s.close()
  }
}
