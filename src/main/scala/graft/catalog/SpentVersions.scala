package graft.catalog

import java.nio.file.{Files, Path, StandardOpenOption}

/** Bounded spent-version ledger backing the manifest/lease CAS commits.
  *
  * Both [[ChunkCatalog]] and [[LeaseStore]] commit by hard-linking an
  * immutable version-named file; because superseded versions get cleaned up,
  * each committed version number must stay provably "spent" forever — a
  * writer whose directory listing lagged behind several commits could
  * otherwise re-link an already-used number, producing an acknowledged commit
  * no reader resolves (max version wins). The original guard was one empty
  * marker file per version, never deleted — correct, but unbounded metadata
  * growth (at the measured ~5 commits/s that is ~400k inodes/day).
  *
  * This ledger keeps the guard bounded: a `floor.<v>` file asserts "every
  * version ≤ v is spent" (version numbers are dense — each commit targets
  * current-max + 1 — so the floor subsumes every individual marker at or
  * below it). Periodically the committing writer raises the floor to the
  * version it just committed and deletes the markers the floor now covers,
  * capping the directory at ~`compactEvery` numeric markers plus one floor
  * file.
  *
  * The floor check and the marker create must be atomic relative to a
  * concurrent compaction (floor raise + marker delete), or a marker could be
  * deleted between a writer's stale floor read and its createFile — the
  * create would win and resurrect a spent version. All entry points therefore
  * run under a per-directory OS file lock (`.lock`, advisory `FileChannel`
  * lock — the multi-process analog of the reference's single metadata
  * server); a JVM-wide monitor per directory serializes same-process callers
  * first, since overlapping JVM-local FileLocks throw rather than block. The
  * critical sections are microseconds (one small-directory listing, one file
  * create) against commits that write kilobytes-to-megabytes of shard data.
  */
private[catalog] object SpentVersions {

  /** Raise the floor once per this many commits (the steady-state bound on
    * marker files kept).
    */
  val CompactEvery = 1024L

  private val jvmLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def monitor(dir: Path): Object =
    jvmLocks.computeIfAbsent(dir.toAbsolutePath.normalize.toString, _ => new Object)

  private def withFsLock[A](dir: Path)(body: => A): A = monitor(dir).synchronized {
    val ch = java.nio.channels.FileChannel.open(dir.resolve(".lock"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val l = ch.lock()
      try body finally l.release()
    } finally ch.close()
  }

  private def listNames(dir: Path): Seq[String] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).toVector
    } finally s.close()
  }

  private def floorOf(dir: Path): Long =
    listNames(dir).iterator
      .filter(_.startsWith("floor."))
      .flatMap(_.stripPrefix("floor.").toLongOption)
      .foldLeft(0L)(math.max)

  /** Atomically {refuse if `version` is already spent} + {hard-link
    * target ← tmp}: the CAS commit itself, inside the ledger's critical
    * section. Sharing the lock closes the two races the split
    * link-then-mark protocol left open:
    *
    *  (a) a lagging writer re-linking a version number whose file was
    *      superseded AND cleaned up — an acknowledged commit no reader
    *      resolves (the marker's original purpose, now refused BEFORE the
    *      link instead of detected after it);
    *  (b) a committer misreading its own SUCCESS as a conflict because a
    *      fast successor read its linked file, committed on top, and spent
    *      the number before the committer's own post-link mark landed — the
    *      commit then retried and re-applied its mutation (observed as a
    *      lease acquirer conflicting with its own first acquire under
    *      contention, LeaseSpec's disjoint-CAS race; in the catalog the
    *      retry path also deleted shard files the successor's manifest
    *      still referenced).
    *
    * After a true return the content at `version` is the caller's,
    * permanently: inside the critical section "file deleted" implies
    * "marker present" (cleanup marks before deleting), so a successful link
    * proves the number was never used, and any marker that appears LATER
    * refers to this very commit — no post-link confirmation is needed, and
    * the marker itself is created by whichever successor supersedes the
    * version (markSpent-before-delete in its cleanup loop).
    * False ⇒ spent version or lost link race; the caller just retries.
    */
  def linkFresh(dir: Path, version: Long, target: Path, tmp: Path): Boolean =
    withFsLock(dir) {
      if (version <= floorOf(dir) || Files.exists(dir.resolve(version.toString)))
        false
      else
        try { Files.createLink(target, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
    }

  /** Record a historical version as spent during post-commit cleanup
    * (idempotent; versions the floor already covers need no marker).
    */
  def markSpent(dir: Path, version: Long): Unit = withFsLock(dir) {
    if (version > floorOf(dir)) {
      try Files.createFile(dir.resolve(version.toString))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    ()
  }

  /** After committing `version`, periodically raise the floor to it and drop
    * every marker it covers. Safe at floor = committed version: the next
    * fresh commit targets version + 1 > floor, while any number ≤ version is
    * genuinely spent (numbers are dense). Crash between the floor create and
    * the deletes just leaves markers the next compaction removes.
    */
  def compact(dir: Path, version: Long, every: Long = CompactEvery): Unit = {
    if (version % every != 0L || version <= 0L) return
    withFsLock(dir) {
      if (version > floorOf(dir)) {
        try Files.createFile(dir.resolve(s"floor.$version"))
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
        listNames(dir).foreach { n =>
          val covered = n.toLongOption.exists(_ <= version) ||
            n.stripPrefix("floor.").toLongOption.exists(v => n.startsWith("floor.") && v < version)
          if (covered)
            try Files.deleteIfExists(dir.resolve(n))
            catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
  }
}
