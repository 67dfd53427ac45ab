package graft.operators

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The durable-root contract shared by the persisted text and vector
  * indexes ("build once, serve many" across SESSIONS, not just within
  * one JVM):
  *
  *   - `write` lands `manifest.properties` at the index root AFTER the
  *     artifacts are fully written, so the manifest doubles as a commit
  *     marker — `read` on a half-built or foreign directory fails
  *     loudly instead of serving garbage.
  *   - the manifest records the ENGINE CONSTANTS the artifact was built
  *     under (bucket count, assignment fan-out, …). Serving is only
  *     correct when build-time and serve-time constants agree — e.g. a
  *     term's bucket is recomputed at serve time for pruning — so the
  *     open path verifies them instead of trusting the caller.
  *   - `corpusFingerprint` is the cheap (file count, total bytes, max
  *     mtime) signature used to key the per-JVM build memos: a corpus
  *     regenerated in place gets a NEW index instead of a stale
  *     cache hit. Footer-cheap — it stats files, never reads data.
  *
  * Plain java.util.Properties on purpose: no parser to maintain, and
  * the file stays human-readable next to the parquet artifacts.
  */
object IndexManifest {

  val FILE = "manifest.properties"

  /** Per-root JVM locks serializing manifest read-modify-writes. The
    * manifest is the compaction journal's commit record, so two
    * in-process maintenance ops (e.g. the postings and stats folds if
    * ever parallelized, or recovery racing a compaction) must not
    * interleave their read-modify-write cycles and silently drop each
    * other's keys. Cross-process writers are serialized by the
    * recovery lease in IndexCompaction; readers are safe regardless
    * because [[storeAtomically]] replaces the file by rename. */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    rootLocks.computeIfAbsent(
      Paths.get(root).toAbsolutePath.normalize.toString, _ => new Object)

  /** Replace `root/FILE` atomically: store to a sibling temp file,
    * then rename over the target. A crash mid-store leaves only temp
    * debris — readers always see either the complete old map or the
    * complete new one, never a truncated file. This is what makes the
    * manifest usable as the compaction journal's atomic pointer. */
  private def storeAtomically(root: String, p: java.util.Properties): Unit = {
    val target = Paths.get(root, FILE)
    val tmp = Files.createTempFile(Paths.get(root), s".$FILE.", ".tmp")
    try {
      val out = Files.newOutputStream(tmp)
      try p.store(out, null) finally out.close()
      try Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          // Object-store-ish mounts: the non-atomic replace may be a
          // delete-then-copy, during which the manifest is briefly
          // ABSENT — and an absent manifest reads as compactedThrough
          // = -1, which would wave a folded batch id past the replay
          // guard (the exact loss the journal exists to prevent).
          // Park the current map at a .bak sibling first; readIfExists
          // falls back to it, so readers in the window see the
          // just-previous map (the same thing they'd have seen a
          // moment earlier) instead of nothing.
          // the .bak is left in place (overwritten on the next store)
          // so there is no instant where neither file exists. Residual
          // honesty: on a mount whose replace is delete-then-copy a
          // reader can still catch the target HALF-copied and parse a
          // truncated map — closing that fully needs FS atomicity or
          // content checksums; the maintenance ops that write here are
          // quiesce-time single-writer by contract, which is the real
          // guard on such mounts.
          // stamp the root as non-atomic FIRST: readIfExists only
          // consults the .bak on roots carrying this marker, so a
          // mount with real atomic renames can never serve a stale
          // .bak after the main file vanishes for an unrelated reason
          // (which would let update()'s read-modify-write resurrect a
          // cleared journal key or lower a compact.through fence)
          try Files.createFile(Paths.get(root, s"$FILE.nonatomic"))
          catch { case _: java.nio.file.FileAlreadyExistsException => () }
          if (Files.exists(target))
            Files.copy(target, Paths.get(root, s"$FILE.bak"),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          Files.move(tmp, target,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally Files.deleteIfExists(tmp)
  }

  def write(root: String, kind: String, config: Map[String, String]): Unit =
    lockFor(root).synchronized {
      val p = new java.util.Properties()
      p.setProperty("kind", kind)
      config.foreach { case (k, v) => p.setProperty(k, v) }
      storeAtomically(root, p)
    }

  /** Best-effort read with no validation — empty map when the root has
    * no manifest yet (e.g. a raw streaming root that was never stamped
    * by a durable build). Maintenance code uses this to consult
    * compaction keys without imposing the full open() contract. */
  def readIfExists(root: String): Map[String, String] = {
    // .bak fallback: on ATOMIC_MOVE-less mounts storeAtomically parks
    // the previous map beside the target during its non-atomic
    // replace; a reader catching the absent-target window (checked by
    // the read itself, so the exists-then-open race is covered too)
    // sees the just-previous map — through values only ever grow, so
    // an older map errs toward rejecting batches, never admitting a
    // folded one — instead of an empty map's ct = -1. The fallback is
    // SCOPED to roots stamped `.nonatomic` by the fallback store path:
    // on a mount with real atomic renames the main file can only be
    // absent because it never existed or something external removed
    // it, and silently reading a leftover .bak there would hand
    // update()'s read-modify-write a stale map (resurrecting a cleared
    // rebuild.pending, lowering a fence). ONLY absence falls through:
    // any other IO failure propagates loudly, because treating it as
    // "no manifest" would fail every guard open and let update()'s
    // read-modify-write silently wipe existing keys.
    def load(f: Path): Option[Map[String, String]] =
      try {
        val p = new java.util.Properties()
        val in = Files.newInputStream(f)
        try p.load(in) finally in.close()
        Some(p.stringPropertyNames().asScala
          .map(k => k -> p.getProperty(k)).toMap)
      } catch { case _: java.nio.file.NoSuchFileException => None }
    load(Paths.get(root, FILE))
      .orElse {
        if (Files.exists(Paths.get(root, s"$FILE.nonatomic")))
          load(Paths.get(root, s"$FILE.bak"))
        else if (Files.exists(Paths.get(root, s"$FILE.bak")))
          // an UNMARKED .bak with the main file gone is ambiguous:
          // either a pre-marker binary crashed inside its non-atomic
          // replace window (the .bak is the truth) or something
          // external removed the main file on an atomic mount (the
          // .bak may be arbitrarily stale). Guessing either way is a
          // silent failure mode — trusting a stale map can resurrect
          // journal state, and an empty map reads as ct = -1 and
          // fails every replay guard open. Demand adjudication.
          throw new IllegalStateException(
            s"$root has $FILE.bak but no $FILE and no $FILE.nonatomic " +
              "marker — either restore the manifest, or (if this root " +
              "was written by an older engine on a non-atomic mount and " +
              "the .bak is known current) rename the .bak to the " +
              "manifest name; refusing to guess")
        else None
      }
      .getOrElse(Map.empty)
  }

  /** Read-modify-write of the manifest: merge `set`, drop `remove`,
    * preserving every other key. Creates the file if absent (raw
    * streaming roots get a manifest holding only maintenance keys;
    * open() still rejects them until a build stamps a kind). The file
    * is replaced by atomic rename ([[storeAtomically]]) under the
    * per-root lock, so concurrent readers see either the old or the
    * new map — this is the "atomic pointer" the compaction journal
    * relies on — and in-JVM writers never lose each other's keys. */
  def update(root: String, set: Map[String, String],
      remove: Seq[String] = Nil): Unit =
    lockFor(root).synchronized {
      val merged = readIfExists(root) -- remove ++ set
      val p = new java.util.Properties()
      merged.foreach { case (k, v) => p.setProperty(k, v) }
      storeAtomically(root, p)
    }

  /** Read and validate a manifest. `expect` pairs are hard
    * requirements — a mismatch (or a missing manifest) throws with a
    * rebuild-or-match diagnosis. Returns the full config. */
  def open(root: String, kind: String,
      expect: Map[String, String]): Map[String, String] = {
    val f = Paths.get(root, FILE)
    require(Files.exists(f),
      s"no $FILE under $root — not a completed index root (the manifest " +
        "is written last, so a missing one means a half-built or foreign " +
        "directory); build with buildTextIndexAt/buildVectorIndexAt")
    val p = new java.util.Properties()
    val in = Files.newInputStream(f)
    try p.load(in) finally in.close()
    val m = p.stringPropertyNames().asScala.map(k => k -> p.getProperty(k)).toMap
    require(m.get("kind").contains(kind),
      s"index at $root is kind=${m.getOrElse("kind", "?")}, expected $kind")
    val bad = expect.collect {
      case (k, v) if !m.get(k).contains(v) =>
        s"$k: built with ${m.getOrElse(k, "ABSENT")}, engine has $v"
    }
    require(bad.isEmpty,
      s"index at $root was built under different engine constants — " +
        s"${bad.mkString("; ")}. Rebuild the index (or run a matching " +
        "engine version); serving would prune/route incorrectly.")
    m
  }

  /** (file count, total bytes, max mtime-millis) over one table's
    * parquet path — file stats only, no data read. */
  def corpusFingerprint(dir: String, table: String): String =
    pathFingerprint(Paths.get(dir, s"$table.parquet"))

  /** The generic form of [[corpusFingerprint]]: a cheap change
    * signature over any file or directory. Serve paths key their
    * per-JVM read memos (stats fold, IVF quantizer) on this — a
    * compaction/rebuild/delete rewrites files, the signature moves,
    * the memo refreshes; nothing ever serves through a stale cache
    * without a matching on-disk state. */
  def pathFingerprint(p: Path): String = {
    if (!Files.exists(p)) return "absent"
    var n = 0L; var bytes = 0L; var mtime = 0L
    def visit(f: Path): Unit = {
      n += 1
      bytes += Files.size(f)
      mtime = math.max(mtime, Files.getLastModifiedTime(f).toMillis)
    }
    if (Files.isDirectory(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.filter(Files.isRegularFile(_)).foreach(visit)
      finally s.close()
    } else visit(p)
    s"$n-$bytes-$mtime"
  }

  // -- temp-root lifecycle: the per-JVM memoized builds land in temp
  // directories; register them so a clean JVM exit removes them
  // (File.deleteOnExit can't remove non-empty directories)
  private val tempRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tempRoots.asScala.foreach { r =>
        try deleteRecursively(Paths.get(r)) catch { case _: Exception => () }
      }))
  }

  def registerTempRoot(root: String): Unit = { hook; tempRoots.add(root) }

  private[operators] def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
