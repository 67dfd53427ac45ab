package graft.operators

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The durable on-disk half of the serve/maintenance quiesce contract
  * (IndexLease): a second process's heartbeats must carry the
  * exclusion that the in-JVM counter cannot see — maintenance refuses
  * on a fresh foreign serve epoch and steals a stale one; serving
  * refuses on a fresh foreign maintenance lease and breaks a stale
  * one. The "second JVM" is simulated by foreign-token heartbeat
  * files plus clearing the in-JVM state, so every refusal proven here
  * is carried by disk alone.
  */
class CrossProcessLeaseSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))

  private def freshRoot(): String = {
    val root = Files.createTempDirectory("graft-xproc").toString
    IndexManifest.registerTempRoot(root)
    (0 to 1).foreach { b =>
      TextQueries.appendToIndex(
        docs.filter(pmod(col("doc_id"), lit(2)) === b), root, b.toLong)
    }
    root
  }

  private def stale(p: java.nio.file.Path): Unit =
    Files.setLastModifiedTime(p,
      FileTime.fromMillis(System.currentTimeMillis() - 120000L))

  test("a leased serve leaves this process's epoch heartbeat on disk") {
    val root = freshRoot()
    assert(IndexServe.bm25TopK(spark, root).collect().nonEmpty)
    assert(Files.exists(
      Paths.get(root, s"serve.epoch.${IndexLease.processToken}")),
      "facade serve must leave a durable epoch for foreign maintainers")
  }

  test("maintenance refuses a fresh foreign epoch and steals a stale one") {
    val root = freshRoot()
    val foreign = Paths.get(root, "serve.epoch.dead-beef-second-jvm")
    Files.write(foreign, "dead-beef-second-jvm".getBytes)
    // the in-JVM layer knows nothing of the foreign server — the
    // refusal must come from disk
    IndexLease.resetInJvmStateForTest()
    val e = intercept[IllegalStateException] {
      TextQueries.compactTextIndex(spark, root)
    }
    assert(e.getMessage.contains("serve epoch"), e.getMessage)
    // the foreign server dies: its epoch goes stale and maintenance
    // takes over, stealing the orphan
    stale(foreign)
    IndexLease.resetInJvmStateForTest()
    val stats = TextQueries.compactTextIndex(spark, root)
    assert(stats.forall(!_.noop))
    assert(!Files.exists(foreign), "stale foreign epoch must be stolen")
    // and the maintenance lease is released afterwards
    assert(!Files.exists(Paths.get(root, "maintenance.recovering")))
  }

  test("serving refuses a fresh foreign maintenance lease, breaks a stale one") {
    val root = freshRoot()
    val pre = IndexServe.bm25TopK(spark, root).collect().toSeq
    val ml = Paths.get(root, "maintenance.recovering")
    Files.write(ml, "foreign-maintainer-jvm".getBytes)
    IndexLease.resetInJvmStateForTest()
    val e = intercept[IllegalStateException] {
      IndexServe.bm25TopK(spark, root)
    }
    assert(e.getMessage.contains("another process"), e.getMessage)
    // the foreign maintainer dies mid-run: its heartbeat goes stale;
    // the next serve breaks the orphan and proceeds on the (recovered)
    // on-disk state
    stale(ml)
    IndexLease.resetInJvmStateForTest()
    assert(IndexServe.bm25TopK(spark, root).collect().toSeq == pre)
    assert(!Files.exists(ml), "stale foreign maintenance lease must break")
  }

  test("serving refuses to break a stale maintenance lease over an " +
    "unreplayed journal") {
    val root = freshRoot()
    val pre = IndexServe.bm25TopK(spark, root).collect().toSeq
    // the foreign maintainer journaled a compaction, then died BEFORE
    // committing: stale lease + pending journal key = the live layout
    // cannot be trusted, so serving must refuse with the remediation
    // rather than steal the lease and read a half-swapped index
    val ml = Paths.get(root, "maintenance.recovering")
    Files.write(ml, "foreign-maintainer-jvm".getBytes)
    stale(ml)
    IndexManifest.update(root, Map("compact.pending.postings" -> "1"))
    IndexLease.resetInJvmStateForTest()
    val e = intercept[IllegalStateException] {
      IndexServe.bm25TopK(spark, root)
    }
    assert(e.getMessage.contains("unreplayed maintenance journal"),
      e.getMessage)
    // remediation: the leased replay clears the journal (this one has
    // no staging dir and a multi-batch live layout — the abandon
    // branch) and breaks the stale lease; serving then resumes with
    // the pre-crash results
    IndexRecovery.replayPendingLeased(root)
    assert(IndexRecovery.pendingKeys(root).isEmpty)
    IndexLease.resetInJvmStateForTest()
    assert(IndexServe.bm25TopK(spark, root).collect().toSeq == pre)
  }

  test("appends replay a crashed journal under the maintenance lease " +
    "and refuse while serves are live") {
    val root = freshRoot()
    IndexManifest.update(root, Map("compact.pending.postings" -> "1"))
    // a serve lease is live in this JVM: the append's journal replay
    // moves live directories, so it must refuse exactly like any
    // scheduled maintenance — not race the reader
    val e = intercept[IllegalStateException] {
      IndexLease.withServeLease(root) {
        TextQueries.appendToIndex(
          docs.limit(5).withColumn("doc_id", col("doc_id") + 100000L),
          root, 2L)
      }
    }
    assert(e.getMessage.contains("serve lease"), e.getMessage)
    assert(IndexRecovery.pendingKeys(root).nonEmpty,
      "refused append must leave the journal for a quiesced replay")
    // quiesced: the same append replays the journal first, then lands
    TextQueries.appendToIndex(
      docs.limit(5).withColumn("doc_id", col("doc_id") + 100000L),
      root, 2L)
    assert(IndexRecovery.pendingKeys(root).isEmpty,
      "append must replay the pending journal before landing batches")
  }

  test("maintenance and serve of THIS process keep their fast path") {
    // no foreign files: the durable layer must not get in its own way
    val root = freshRoot()
    val pre = IndexServe.bm25TopK(spark, root).collect().toSeq
    val stats = TextQueries.compactTextIndex(spark, root)
    assert(stats.forall(!_.noop))
    assert(IndexServe.bm25TopK(spark, root).collect().toSeq == pre)
    // the compaction retracted our idle epoch; the serve above
    // re-created it for the next foreign maintainer to see
    assert(Files.exists(
      Paths.get(root, s"serve.epoch.${IndexLease.processToken}")))
  }
}
