package graft.catalog

import java.nio.file.{Files, Path, StandardOpenOption}
import java.nio.charset.StandardCharsets
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Status of a compaction lease (reference src/metadata/mod.rs:112-120). */
sealed trait LeaseStatus
object LeaseStatus {
  case object Active extends LeaseStatus
  case object Completed extends LeaseStatus
  case object Failed extends LeaseStatus

  def name(s: LeaseStatus): String = s match {
    case Active => "active"; case Completed => "completed"; case Failed => "failed"
  }
  def parse(s: String): LeaseStatus = s match {
    case "completed" => Completed; case "failed" => Failed; case _ => Active
  }
}

/** Compaction lease for mutual exclusion between concurrent compactors
  * (reference src/metadata/mod.rs:93-110). Times are epoch millis.
  */
final case class CompactionLease(
    leaseId: String,
    holderId: String,
    chunks: Seq[String],
    acquiredAtMs: Long,
    expiresAtMs: Long,
    level: Int,
    status: LeaseStatus)

/** Acquire refused because another active lease claims one of the chunks
  * (reference Error::ChunksAlreadyLeased) — the caller SKIPS the group, it
  * does not retry.
  */
final case class ChunksAlreadyLeasedException(conflicts: Seq[String])
    extends RuntimeException(s"chunks already leased: ${conflicts.mkString(", ")}")

/** All leases, one CAS-committed document (reference CompactionLeases in a
  * single S3 object, src/metadata/s3.rs:1002-1060).
  *
  * The reference commits the document with ETag compare-and-swap. On a shared
  * filesystem the equivalent is version-named immutable files: the current
  * document is `leases.<ver>.json` with the highest version; a writer that
  * loaded version N commits by hard-LINKING its fully-written temp file to
  * `leases.<N+1>.json` — link creation is atomic and fails with EEXIST if any
  * other writer committed N+1 first, which IS the CAS conflict. Works across
  * JVMs/processes sharing the directory; nothing in this class assumes a
  * single writer. Superseded versions are deleted best-effort after commit
  * (a reader that raced the cleanup re-lists and finds the newer version).
  *
  * Retry discipline mirrors the reference (s3.rs:30-33): `maxCasRetries`
  * attempts with exponential backoff from `baseBackoffMs`. The clock is
  * injectable so expiry paths are testable.
  */
final class LeaseStore(
    val root: Path,
    ttlMs: Long = 300000L, // 5 min (reference compactor/mod.rs:229)
    renewExtensionMs: Long = 300000L, // renew sets expiry = now + 5 min
    maxCasRetries: Int = 10,
    baseBackoffMs: Long = 25L,
    clock: () => Long = () => System.currentTimeMillis()) {

  import LeaseStore._

  // spent-version ledger (bounded by SpentVersions floor compaction — see
  // tryCommit and SpentVersions)
  private val markers = root.resolve(".versions")

  Files.createDirectories(root)
  Files.createDirectories(markers)

  /** Acquire a lease on `chunks` before compacting them. Throws
    * [[ChunksAlreadyLeasedException]] if any chunk is claimed by an active,
    * unexpired lease — immediately, without CAS retries (the group belongs to
    * someone else; reference s3.rs:1602-1647).
    */
  def acquire(nodeId: String, chunks: Seq[String], level: Int): CompactionLease =
    casLoop("acquire") { doc =>
      val now = clock()
      // expired active leases are scavenged opportunistically here, so the
      // acquire that steps over a dead holder also persists its removal
      val live = doc.filterNot { case (_, l) =>
        l.status == LeaseStatus.Active && l.expiresAtMs <= now }
      val leased: Set[String] = live.valuesIterator
        .filter(l => l.status == LeaseStatus.Active && l.expiresAtMs > now)
        .flatMap(_.chunks).toSet
      val conflicts = chunks.filter(leased.contains)
      if (conflicts.nonEmpty) throw ChunksAlreadyLeasedException(conflicts)
      val lease = CompactionLease(
        leaseId = java.util.UUID.randomUUID().toString,
        holderId = nodeId, chunks = chunks.toVector,
        acquiredAtMs = now, expiresAtMs = now + ttlMs,
        level = level, status = LeaseStatus.Active)
      (live + (lease.leaseId -> lease), lease)
    }

  /** Mark a lease completed. A missing lease is a no-op — it may have expired
    * and been scavenged (reference s3.rs:1720-1740).
    */
  def complete(leaseId: String): Unit = terminal(leaseId, LeaseStatus.Completed)

  /** Mark a lease failed so its chunks are releasable. Missing → no-op. */
  def fail(leaseId: String): Unit = terminal(leaseId, LeaseStatus.Failed)

  private def terminal(leaseId: String, to: LeaseStatus): Unit =
    casLoop(LeaseStatus.name(to)) { doc =>
      doc.get(leaseId) match {
        case Some(l) => (doc + (leaseId -> l.copy(status = to)), ())
        case None => (doc, ()) // expired + scavenged under us: served its purpose
      }
    }

  /** Extend an active lease's expiry to now + extension. Unlike
    * complete/fail, a missing or non-active lease is an ERROR — the renewal
    * loop must stop, the holder no longer owns the chunks
    * (reference s3.rs:1882-1900).
    */
  def renew(leaseId: String): Unit =
    casLoop("renew") { doc =>
      doc.get(leaseId) match {
        case Some(l) if l.status == LeaseStatus.Active =>
          (doc + (leaseId -> l.copy(expiresAtMs = clock() + renewExtensionMs)), ())
        case Some(_) =>
          throw new IllegalStateException(s"cannot renew non-active lease $leaseId")
        case None =>
          throw new IllegalStateException(s"lease $leaseId not found")
      }
    }

  /** Current document (for filtering and scavenging). */
  def loadAll(): Map[String, CompactionLease] = load()._1

  /** Chunk paths claimed by active, unexpired leases right now. */
  def activeLeasedChunks(): Set[String] = {
    val now = clock()
    loadAll().valuesIterator
      .filter(l => l.status == LeaseStatus.Active && l.expiresAtMs > now)
      .flatMap(_.chunks).toSet
  }

  /** Remove expired active leases and ALL terminal (Completed/Failed) leases.
    * Returns the number removed; 0 removals commit nothing
    * (reference s3.rs:1975-2010).
    */
  def scavenge(): Int = {
    val (doc0, _) = load()
    val now = clock()
    def keep(l: CompactionLease): Boolean =
      l.status == LeaseStatus.Active && l.expiresAtMs > now
    if (doc0.valuesIterator.forall(keep)) 0
    else casLoop("scavenge") { doc =>
      val kept = doc.filter { case (_, l) => keep(l) }
      (kept, doc.size - kept.size)
    }
  }

  // --- CAS machinery ---------------------------------------------------------

  /** Load-mutate-commit with conflict retries. `mutate` returns the next
    * document and the result; returning a document `eq` to the input skips the
    * commit. Domain refusals (ChunksAlreadyLeased, renew errors) propagate
    * immediately — only commit CONFLICTS retry.
    */
  private def casLoop[A](op: String)(
      mutate: Map[String, CompactionLease] => (Map[String, CompactionLease], A)): A = {
    var attempt = 0
    while (true) {
      val (doc, ver) = load()
      val (next, result) = mutate(doc)
      if (next eq doc) return result
      if (tryCommit(next, ver)) return result
      attempt += 1
      if (attempt >= maxCasRetries)
        throw new IllegalStateException(s"lease $op: too many CAS conflicts ($attempt)")
      // full jitter: see ChunkCatalog.mutate — deterministic backoff keeps
      // racing losers in lockstep on a local FS
      Thread.sleep(1L + java.util.concurrent.ThreadLocalRandom.current()
        .nextLong(baseBackoffMs * (1L << math.min(attempt, 6))))
    }
    throw new IllegalStateException("unreachable")
  }

  /** (document, version). Re-lists if the winning file vanished under us —
    * that only happens when a newer version superseded it.
    */
  private def load(): (Map[String, CompactionLease], Long) = {
    var spins = 0
    while (true) {
      val ver = currentVersion()
      if (ver == 0L) return (Map.empty, 0L)
      try return (parseDoc(new String(
        Files.readAllBytes(root.resolve(fileName(ver))), StandardCharsets.UTF_8)), ver)
      catch {
        case _: java.nio.file.NoSuchFileException =>
          spins += 1
          if (spins > 1000) throw new IllegalStateException("lease document unreadable")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def currentVersion(): Long = {
    val s = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .flatMap(p => versionOf(p.getFileName.toString))
        .foldLeft(0L)(math.max)
    } finally s.close()
  }

  /** The CAS: temp file carries the complete content; the atomic commit is
    * [[SpentVersions.linkFresh]] — the spent-number refusal and the hard
    * link to the next version name share one critical section, which is what
    * makes a successful link PROOF of commit (see linkFresh's scaladoc for
    * the two races the previous link-then-mark split protocol left open;
    * one of them was observed as LeaseSpec's disjoint-CAS acquirers
    * conflicting with their own committed leases). Same discipline as
    * ChunkCatalog.tryCommit.
    */
  private def tryCommit(doc: Map[String, CompactionLease], loadedVer: Long): Boolean = {
    val tmp = root.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, renderDoc(doc).getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    val target = root.resolve(fileName(loadedVer + 1))
    try {
      val committed = SpentVersions.linkFresh(markers, loadedVer + 1, target, tmp)
      if (committed) {
        // best-effort cleanup of superseded versions (marked first, so a
        // pre-marker crash can't make them resurrectable); readers that
        // raced it re-list and find this newer one
        var v = loadedVer
        while (v > 0L && {
          SpentVersions.markSpent(markers, v)
          Files.deleteIfExists(root.resolve(fileName(v)))
        }) v -= 1
        SpentVersions.compact(markers, loadedVer + 1)
      }
      committed
    } finally {
      try Files.deleteIfExists(tmp)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}

object LeaseStore {

  private def fileName(ver: Long): String = s"leases.$ver.json"

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("leases.") && name.endsWith(".json"))
      name.stripPrefix("leases.").stripSuffix(".json").toLongOption.filter(_ > 0L)
    else None

  private[catalog] def renderDoc(doc: Map[String, CompactionLease]): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "leases" -> JObject(doc.toList.sortBy(_._1).map { case (id, l) =>
        id -> (JObject(
          "lease_id" -> JString(l.leaseId),
          "holder_id" -> JString(l.holderId),
          "chunks" -> JArray(l.chunks.map(JString(_): JValue).toList),
          "acquired_at" -> JLong(l.acquiredAtMs),
          "expires_at" -> JLong(l.expiresAtMs),
          "level" -> JInt(l.level),
          "status" -> JString(LeaseStatus.name(l.status))): JValue)
      }))))

  private[catalog] def parseDoc(json: String): Map[String, CompactionLease] = {
    def long(j: JValue): Long = j match {
      case JLong(l) => l; case JInt(i) => i.toLong; case JDouble(d) => d.toLong
      case _ => 0L
    }
    (JsonMethods.parse(json) \ "leases") match {
      case JObject(fields) => fields.map { case (id, j) =>
        id -> CompactionLease(
          leaseId = (j \ "lease_id") match { case JString(s) => s; case _ => id },
          holderId = (j \ "holder_id") match { case JString(s) => s; case _ => "" },
          chunks = (j \ "chunks") match {
            case JArray(a) => a.collect { case JString(s) => s }
            case _ => Nil
          },
          acquiredAtMs = long(j \ "acquired_at"),
          expiresAtMs = long(j \ "expires_at"),
          level = long(j \ "level").toInt,
          status = (j \ "status") match {
            case JString(s) => LeaseStatus.parse(s); case _ => LeaseStatus.Active
          })
      }.toMap
      case _ => Map.empty
    }
  }
}
