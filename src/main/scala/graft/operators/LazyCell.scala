package graft.operators

/** A lazily-built memo cell for the per-(JVM, corpus) caches
  * (knnCache, bpeMergeCache, kmeansCache). The caches are
  * ConcurrentHashMaps and their `compute` remapping runs under the
  * map's bin lock — running a multi-minute Spark training loop THERE
  * (the pre-round-15 shape) blocks every concurrent caller hashing
  * into the same bin, and any re-entrant access to the map from
  * inside the build would deadlock. With a cell, `compute` only
  * ALLOCATES (cheap, lock-held for nanoseconds) and the build runs on
  * the first `.value` access OUTSIDE the map lock, synchronized on
  * the cell itself — so concurrent callers of the SAME key still get
  * exactly one build (the second blocks on the cell, not the map),
  * and other keys are never blocked.
  *
  * `completed` never triggers the build — eviction paths use it to
  * unpersist a stale value's cached blocks without accidentally
  * BUILDING the stale value first. A build that THROWS leaves the
  * lazy val uninitialized (Scala re-evaluates on next access), so
  * callers must pair an uncompleted cell with a liveness check on the
  * SparkContext it would build against (stored alongside in the map
  * value) and replace cells whose owning context died.
  */
private[operators] final class LazyCell[V](thunk: () => V) {
  @volatile private var done = false
  lazy val value: V = { val v = thunk(); done = true; v }

  /** The built value, or None if the build has not finished —
    * NEVER forces the build. */
  def completed: Option[V] = if (done) Some(value) else None
}

/** The standard per-(JVM, key) memo of SESSION-FREE build artifacts
  * (index/fixture root paths, centroid arrays): a ConcurrentHashMap
  * whose `compute` only allocates a [[LazyCell]] — the (often
  * tens-of-seconds) build runs on `.value` OUTSIDE the map's bin
  * lock. Keys embed the corpus fingerprint, so staleness is a new
  * key, never an eviction; a COMPLETED value is reusable forever
  * (the artifact outlives any session), while an uncompleted cell is
  * reusable only while the SparkContext its thunk captured is alive
  * (a failed build against a stopped session must not be retried
  * forever). Caches that persist DataFrames (knnCache) need the
  * eviction-and-unpersist variant and stay hand-rolled. */
private[operators] final class BuildMemo[V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    String, (org.apache.spark.SparkContext, LazyCell[V])]()

  def getOrBuild(key: String, sc: org.apache.spark.SparkContext)(
      build: => V): V =
    m.compute(key, (_, prev) => prev match {
      case (psc, cell)
          if cell.completed.isDefined || !psc.isStopped => prev
      case _ => (sc, new LazyCell(() => build))
    })._2.value

  /** Testing hook. */
  def clear(): Unit = m.clear()
}
