package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The spent-version ledger keeps the manifest/lease CAS resurrection guard
  * while staying bounded (floor compaction) — the r8 fix for the
  * marker-file-per-commit growth the original guard cost (~400k inodes/day at
  * the measured catalog commit rate).
  */
class SpentVersionsSpec extends AnyFunSuite {

  private def freshDir() = Files.createTempDirectory("graft_spent_")

  private def entryCount(dir: java.nio.file.Path): Long = {
    val s = Files.list(dir)
    try s.count()
    finally s.close()
  }

  test("mark is a CAS: first caller wins, repeat is a conflict") {
    val dir = freshDir()
    assert(SpentVersions.mark(dir, 1L))
    assert(!SpentVersions.mark(dir, 1L))
    assert(SpentVersions.mark(dir, 2L))
  }

  test("linkFresh: spent number refused before linking; EEXIST loses; success is proof of commit") {
    val dir = freshDir()
    val files = freshDir()
    def tmpFile(s: String): java.nio.file.Path = {
      val p = files.resolve(s".tmp-$s")
      Files.write(p, s.getBytes)
      p
    }
    // fresh number: links
    assert(SpentVersions.linkFresh(dir, 1L, files.resolve("v1"), tmpFile("a")))
    assert(Files.exists(files.resolve("v1")))
    // same number again: file exists -> EEXIST -> lost race (marker absent!)
    assert(!SpentVersions.linkFresh(dir, 1L, files.resolve("v1"), tmpFile("b")))
    // successor spends 1 during cleanup (markSpent-before-delete), deletes it
    SpentVersions.markSpent(dir, 1L)
    Files.delete(files.resolve("v1"))
    // lagging writer re-targeting the cleaned-up number: refused BEFORE the
    // link — no zombie file is created
    assert(!SpentVersions.linkFresh(dir, 1L, files.resolve("v1"), tmpFile("c")))
    assert(!Files.exists(files.resolve("v1")))
    // numbers at or under a raised floor are refused the same way
    (2L to 1024L).foreach(v =>
      assert(SpentVersions.linkFresh(dir, v, files.resolve(s"v$v"), tmpFile(s"d$v"))))
    SpentVersions.compact(dir, 1024L)
    assert(!SpentVersions.linkFresh(dir, 512L, files.resolve("v512b"), tmpFile("e")))
    assert(!Files.exists(files.resolve("v512b")))
    assert(SpentVersions.linkFresh(dir, 1025L, files.resolve("v1025"), tmpFile("f")))
  }

  test("compact raises the floor, drops covered markers, keeps the guard") {
    val dir = freshDir()
    (1L to 2048L).foreach(v => assert(SpentVersions.mark(dir, v)))
    SpentVersions.compact(dir, 2048L)
    // every individual marker ≤ 2048 is gone; the floor file + .lock remain
    assert(entryCount(dir) <= 3, "compaction must drop covered markers")
    // the guard survives the deletion: any covered version is still spent
    assert(!SpentVersions.mark(dir, 1L))
    assert(!SpentVersions.mark(dir, 2048L))
    // and fresh versions still commit
    assert(SpentVersions.mark(dir, 2049L))
  }

  test("markSpent below the floor does not regrow marker files") {
    val dir = freshDir()
    (1L to 1024L).foreach(v => SpentVersions.mark(dir, v))
    SpentVersions.compact(dir, 1024L)
    val n0 = entryCount(dir)
    (1L to 100L).foreach(v => SpentVersions.markSpent(dir, v))
    assert(entryCount(dir) == n0, "covered versions need no marker")
  }

  test("repeated compaction replaces the floor file instead of accumulating") {
    val dir = freshDir()
    (1L to 1024L).foreach(v => SpentVersions.mark(dir, v))
    SpentVersions.compact(dir, 1024L)
    (1025L to 2048L).foreach(v => SpentVersions.mark(dir, v))
    SpentVersions.compact(dir, 2048L)
    val s = Files.list(dir)
    val floors =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("floor.")).toList
      } finally s.close()
    assert(floors == List("floor.2048"), s"stale floors must be dropped: $floors")
    assert(!SpentVersions.mark(dir, 1500L))
  }

  test("off-cycle versions skip compaction entirely") {
    val dir = freshDir()
    (1L to 10L).foreach(v => SpentVersions.mark(dir, v))
    SpentVersions.compact(dir, 10L) // 10 % 1024 != 0 → no-op
    assert(entryCount(dir) >= 10L)
  }

  test("catalog end-to-end: 1100 commits cross the compaction point and stay bounded") {
    val root = Files.createTempDirectory("graft_cat_spent_")
    val cat = new ChunkCatalog(root, cacheTtlMs = 0L)
    val hourNs = 3600L * 1000000000L
    (1 to 1100).foreach { i =>
      cat.register(ChunkMeta(s"chunks/c$i", (i % 48) * hourNs,
        (i % 48) * hourNs + hourNs - 1, 10, 1000, 0))
    }
    val markers = root.resolve(".versions")
    assert(entryCount(markers) < 200,
      s"ledger must stay bounded after compaction, saw ${entryCount(markers)}")
    // a fresh instance reassembles the full state from the sharded layout
    val cat2 = new ChunkCatalog(root, cacheTtlMs = 0L)
    assert(cat2.state.chunks.size == 1100)
    // and further commits still work on both instances
    cat2.register(ChunkMeta("chunks/extra", 0L, hourNs - 1, 10, 1000, 0))
    cat.invalidateCache()
    assert(cat.state.chunks.contains("chunks/extra"))
  }

  test("lease store end-to-end: commit churn crosses compaction and stays bounded") {
    val root = Files.createTempDirectory("graft_lease_spent_")
    val store = new LeaseStore(root)
    (1 to 360).foreach { i =>
      val l = store.acquire("n1", Seq(s"chunks/x$i"), 0)
      store.complete(l.leaseId)
      store.scavenge()
    }
    val markers = root.resolve(".versions")
    assert(entryCount(markers) < 200,
      s"lease ledger must stay bounded, saw ${entryCount(markers)}")
    // the store still functions after compaction
    val l = store.acquire("n1", Seq("chunks/final"), 0)
    assert(store.activeLeasedChunks().contains("chunks/final"))
    store.complete(l.leaseId)
  }
}
