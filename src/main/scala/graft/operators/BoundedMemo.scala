package graft.operators

/** A small LRU-bounded, fingerprint-validated memo for driver-side
  * per-root artifacts (the text index's stats fold, the IVF
  * quantizer). An unbounded per-root ConcurrentHashMap leaks in a
  * long-lived multi-tenant serve process (one ≤33 MB quantizer per
  * RETIRED root, forever); this caps resident entries and evicts
  * least-recently-served roots. Keys are canonicalized paths so
  * aliased spellings of one root share one entry.
  *
  * Synchronized LinkedHashMap rather than a concurrent structure: the
  * memo sits behind a fingerprint stat (file metadata read), so calls
  * are driver-side and low-rate — a lock is cheaper than it looks and
  * accessOrder bookkeeping needs one anyway. A fingerprint miss
  * reloads OUTSIDE the lock (loads run Spark jobs); two racing
  * loaders both compute and last-put wins, which is benign (same
  * fingerprint → same value).
  */
private[operators] final class BoundedMemo[V](cap: Int, label: String) {

  private val m = new java.util.LinkedHashMap[String, (String, V)](
    16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, (String, V)]): Boolean =
      size() > cap
  }

  private def key(root: String): String =
    try java.nio.file.Paths.get(root).toRealPath().toString
    catch {
      case _: java.io.IOException =>
        java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString
    }

  /** Value for `root` if cached under exactly this fingerprint. */
  def get(root: String, fp: String): Option[V] = m.synchronized {
    Option(m.get(key(root))).collect { case (`fp`, v) => v }
  }

  def put(root: String, fp: String, v: V): Unit = {
    // a put IS a miss-build completing — record it for the bench's
    // derived warm list (MemoBuilds)
    MemoBuilds.record(label)
    m.synchronized { m.put(key(root), (fp, v)); () }
  }
}
