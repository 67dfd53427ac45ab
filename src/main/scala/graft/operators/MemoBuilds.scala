package graft.operators

/** Append-only registry of memoized-build EVENTS — one `record` per
  * actual cache-miss build in any per-(JVM, corpus/root) memo (index
  * roots, k-NN graph, Lloyd centroids, BPE merges, quantizer/codebook
  * loads, sink fixtures, PQ sidecar).
  *
  * Purpose (VERDICT r14 task 3): Bench used to carry a HAND-LISTED
  * "family-cold" set of qids whose first-in-family timing absorbs a
  * one-time memoized build, and the list went stale twice. With the
  * registry, Bench snapshots `count` around each timed query and
  * derives the set mechanically: any qid whose timing window saw ≥1
  * recorded build is memo-absorbing and gets a warm re-time — no
  * manual maintenance, and new memos added later are covered the day
  * they land (their builder records; forgetting to record shows up as
  * an unexplained warm/cold gap in the next round's bench diff).
  *
  * Deliberately dumb: a concurrent queue of labels. Recording is
  * O(1); `size` walks the queue but the queue holds at most a few
  * dozen entries per JVM (builds are memoized — that is the point).
  */
object MemoBuilds {
  private val events =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def record(label: String): Unit = { events.add(label); () }

  /** Number of builds recorded so far (snapshot; append-only). */
  def count: Int = events.size

  /** Labels of builds recorded after the first `n` — pair with a
    * `count` snapshot to attribute builds to a timing window. */
  def labelsSince(n: Int): Seq[String] = {
    val it = events.iterator()
    var i = 0
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val l = it.next()
      if (i >= n) out += l
      i += 1
    }
    out.result()
  }
}
