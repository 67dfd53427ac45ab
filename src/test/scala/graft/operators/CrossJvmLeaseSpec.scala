package graft.operators

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** The serve/maintenance quiesce contract across REAL process
  * boundaries: a second JVM ([[LeaseProbeMain]]) holds a lease on the
  * same root while this JVM attempts the conflicting operation. Where
  * CrossProcessLeaseSpec simulates the second process with
  * foreign-token files, this spec launches one — distinct process
  * token, real heartbeat file lifecycle, real exit-time retraction —
  * so the fleet contract SCALE.md documents is pinned end-to-end.
  *
  * No Spark on either side: the lease layer is pure file ops, and the
  * conflicts under test are lease-vs-lease, not query-vs-swap (those
  * are covered with live indexes in CrossProcessLeaseSpec and
  * ConcurrentServeSpec).
  */
class CrossJvmLeaseSpec extends AnyFunSuite {

  /** A child JVM holding a lease on `root` until `release()`. */
  private final class Probe(mode: String, root: String) {
    private val javaBin =
      Paths.get(sys.props("java.home"), "bin", "java").toString
    private val pb = new ProcessBuilder(
      javaBin, "-cp", sys.props("java.class.path"),
      "graft.operators.LeaseProbeMain", mode, root)
    pb.redirectErrorStream(true)
    private val p = pb.start()
    private val held = new CountDownLatch(1)
    @volatile private var refusedMsg: Option[String] = None
    private val lines = new java.lang.StringBuilder
    private val reader = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      var l = br.readLine()
      while (l != null) {
        lines.append(l).append('\n')
        if (l == "LEASE_HELD") held.countDown()
        if (l.startsWith("LEASE_REFUSED:")) {
          refusedMsg = Some(l.stripPrefix("LEASE_REFUSED:"))
          held.countDown()
        }
        l = br.readLine()
      }
    })
    reader.setDaemon(true)
    reader.start()

    /** Wait until the child holds the lease (fails the test on child
      * refusal or a hung start). */
    def awaitHeld(): Unit = {
      assert(held.await(60, TimeUnit.SECONDS),
        s"child never reached LEASE_HELD; output so far:\n$lines")
      assert(refusedMsg.isEmpty,
        s"child refused instead of holding: ${refusedMsg.getOrElse("")}")
    }

    /** Expect the child to be refused (exit 2) and return the message. */
    def awaitRefused(): String = {
      assert(held.await(60, TimeUnit.SECONDS),
        s"child neither held nor refused; output so far:\n$lines")
      assert(p.waitFor(60, TimeUnit.SECONDS), "child did not exit")
      assert(p.exitValue() == 2, s"expected refusal exit 2:\n$lines")
      refusedMsg.getOrElse(fail(s"no refusal message:\n$lines"))
    }

    /** Release the child's lease and wait for its clean exit. */
    def release(): Unit = {
      p.getOutputStream.write('\n'); p.getOutputStream.flush()
      assert(p.waitFor(60, TimeUnit.SECONDS), "child did not exit")
      assert(p.exitValue() == 0, s"child failed:\n$lines")
    }

    def destroy(): Unit = p.destroyForcibly()
  }

  private def freshRoot(): String = {
    val root = Files.createTempDirectory("graft-xjvm").toString
    IndexManifest.registerTempRoot(root)
    root
  }

  test("maintenance here refuses while a REAL second JVM serves, and " +
    "proceeds after its clean exit retracts the epoch") {
    val root = freshRoot()
    val probe = new Probe("serve", root)
    try {
      probe.awaitHeld()
      // the child's epoch heartbeat is on disk under ITS process token
      val epochs = Files.list(Paths.get(root)).toArray.map(_.toString)
        .filter(_.contains("serve.epoch."))
      assert(epochs.nonEmpty, "child serve must leave an epoch heartbeat")
      assert(!epochs.exists(_.endsWith(IndexLease.processToken)),
        "the epoch must carry the CHILD's token, not ours")
      val e = intercept[IllegalStateException] {
        IndexLease.withMaintenance(root) { fail("must not run") }
      }
      assert(e.getMessage.contains("fresh serve epoch"), e.getMessage)
      // child exits cleanly -> its shutdown hook retracts the epoch,
      // and maintenance proceeds without waiting out the stale window
      probe.release()
      var ran = false
      IndexLease.withMaintenance(root) { ran = true }
      assert(ran, "maintenance must proceed once the serve fleet drains")
    } finally probe.destroy()
  }

  test("a REAL second JVM's serve is refused while maintenance runs " +
    "here, and succeeds after it completes") {
    val root = freshRoot()
    val done = new CountDownLatch(1)
    val inBody = new CountDownLatch(1)
    val t = new Thread(() => IndexLease.withMaintenance(root) {
      inBody.countDown()
      done.await(60, TimeUnit.SECONDS); ()
    })
    t.start()
    try {
      assert(inBody.await(60, TimeUnit.SECONDS))
      // our maintenance lease file is fresh on disk: the child's serve
      // must refuse on it (its in-JVM state knows nothing of ours)
      val msg = new Probe("serve", root).awaitRefused()
      assert(msg.contains("another process"), msg)
    } finally { done.countDown(); t.join(60000) }
    // maintenance released: the same serve now holds and exits cleanly
    val probe = new Probe("serve", root)
    try { probe.awaitHeld(); probe.release() } finally probe.destroy()
    assert(!Files.exists(Paths.get(root, "maintenance.recovering")),
      "maintenance must release its on-disk lease")
  }

  test("two processes' maintenance serializes on the on-disk lease — " +
    "this JVM's maintenance WAITS out a live foreign holder") {
    val root = freshRoot()
    val probe = new Probe("maint", root)
    try {
      probe.awaitHeld()
      val done = new CountDownLatch(1)
      val t = new Thread(() => {
        IndexLease.withMaintenance(root) { done.countDown() }
      })
      t.start()
      // while the child HOLDS the recovery lease, our maintenance must
      // be blocked in the acquire loop, not running its body (two
      // concurrent swaps on one root would interleave dir moves)
      assert(!done.await(2, TimeUnit.SECONDS),
        "maintenance ran while a live foreign maintainer held the lease")
      probe.release()
      // foreign holder released cleanly: the waiter acquires and runs
      assert(done.await(60, TimeUnit.SECONDS),
        "maintenance never acquired after the foreign holder released")
      t.join(60000)
      assert(!Files.exists(Paths.get(root, "maintenance.recovering")))
    } finally probe.destroy()
  }

  test("two REAL JVMs serve the same root concurrently (shared lease), " +
    "each under its own epoch") {
    val root = freshRoot()
    val a = new Probe("serve", root)
    val b = new Probe("serve", root)
    try {
      a.awaitHeld(); b.awaitHeld()
      val epochs = Files.list(Paths.get(root)).toArray.map(_.toString)
        .filter(_.contains("serve.epoch."))
      assert(epochs.length == 2,
        s"each serving process must heartbeat its own epoch: $epochs")
      a.release(); b.release()
      // both exited cleanly: both epochs retracted, root quiesced
      val left = Files.list(Paths.get(root)).toArray.map(_.toString)
        .filter(_.contains("serve.epoch."))
      assert(left.isEmpty, s"clean exits must retract epochs: $left")
      var ran = false
      IndexLease.withMaintenance(root) { ran = true }
      assert(ran)
    } finally { a.destroy(); b.destroy() }
  }
}
