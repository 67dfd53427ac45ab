package graft.operators

/** In-JVM serve/maintenance mutual exclusion per index root.
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
  *   - a serve-tier request handler wraps each query's plan+execute
  *     in [[withServeLease]] (shared — any number may hold it);
  *   - every maintenance op body runs inside [[withMaintenance]]
  *     (exclusive), which REFUSES — loudly, with the live lease
  *     count — while any serve lease is held, and makes new serve
  *     leases fail while maintenance runs.
  *
  * One atomic long per root: ≥0 = active serve-lease count, −1 =
  * maintenance in progress. In-JVM by design: the serve tier is N
  * handler threads sharing one SparkSession (ConcurrentServeSpec's
  * deployment shape), which is exactly the scope where the file-move
  * race lives. CROSS-process exclusion stays a deployment contract
  * (stop the serving JVMs before scheduled maintenance), same as the
  * stream-quiesce contract on the append side — a multi-JVM serve
  * fleet coordinates through its scheduler, not through this file.
  */
object IndexLease {

  private val states = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  private def state(root: String): java.util.concurrent.atomic.AtomicLong =
    states.computeIfAbsent(canonical(root),
      _ => new java.util.concurrent.atomic.AtomicLong(0L))

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

  /** Hold a shared serve lease on `root` around a query's plan AND
    * execution (the DataFrame a serve path returns is lazy — a lease
    * held only during construction protects nothing). Throws
    * IllegalStateException while maintenance holds the root. */
  def withServeLease[T](root: String)(body: => T): T = {
    val st = state(root)
    var ok = false
    while (!ok) {
      val v = st.get()
      if (v < 0L) throw new IllegalStateException(
        s"index root $root is under maintenance (compaction/rebuild/" +
          "repair) — serve again when it completes")
      ok = st.compareAndSet(v, v + 1L)
    }
    try body finally st.decrementAndGet()
  }

  /** Run a maintenance body holding the exclusive lease. Refuses —
    * rather than racing the swap under live readers — while any
    * serve lease is held. */
  def withMaintenance[T](root: String)(body: => T): T = {
    val st = state(root)
    if (!st.compareAndSet(0L, -1L)) {
      val v = st.get()
      throw new IllegalStateException(
        if (v > 0L)
          s"refusing maintenance on $root: $v serve lease(s) active — " +
            "quiesce the serve tier first (maintenance swaps move live " +
            "directories; a concurrent reader could scan a vanishing file)"
        else
          s"refusing maintenance on $root: another maintenance op holds it")
    }
    try body finally st.set(0L)
  }
}
