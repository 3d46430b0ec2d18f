package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.{ChunkCatalog, ChunkMeta}
import graft.compact.Compactor
import graft.ingest.{ChunkWriter, Converters, MetricPoint}
import java.nio.file.Files

class CompactorSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val hourNs = 3600L * 1000000000L
  private val t0 = 1704067200L * 1000000000L

  test("L0 candidate selection: hour groups at threshold") {
    val cat = new ChunkCatalog(Files.createTempDirectory("graft_cmp_"), cacheTtlMs = 0L)
    def c(p: String, hour: Long) =
      ChunkMeta(p, hour * hourNs, hour * hourNs + 1, 10, 100)
    cat.registerAll(Seq(c("a", 0), c("b", 0), c("c", 0), c("d", 1)))
    val comp = new Compactor(spark, cat, l0FileThreshold = 3)
    val groups = comp.l0Candidates()
    assert(groups.size == 1)
    assert(groups.head.map(_.path).toSet == Set("a", "b", "c"))
  }

  test("leveled candidate selection: greedy size grouping") {
    val cat = new ChunkCatalog(Files.createTempDirectory("graft_cmp2_"), cacheTtlMs = 0L)
    def c(p: String, hour: Long, size: Long) =
      ChunkMeta(p, hour * hourNs, hour * hourNs + 1, 10, size, level = 1)
    cat.registerAll(Seq(c("a", 0, 400), c("b", 1, 400), c("c", 2, 400), c("d", 3, 900)))
    val comp = new Compactor(spark, cat, levelTargetBytes = _ => 1000L)
    val groups = comp.leveledCandidates(1)
    assert(groups.size == 1) // a+b (800) fits; c+d exceeds → c alone dropped (size<2)
    assert(groups.head.map(_.path) == Seq("a", "b"))
  }

  test("compactGroup merges, sorts, bumps level, swaps catalog, defers GC") {
    val cat = new ChunkCatalog(Files.createTempDirectory("graft_cmp3_"), cacheTtlMs = 0L)
    val writer = new ChunkWriter(cat)
    val mk = (offset: Long) => (0 until 10).map(i =>
      MetricPoint(t0 + i * 60L * 1000000000L + offset, "cpu", i.toDouble, Map("h" -> "x")))
    writer.write(Converters.pointsToDf(spark, mk(0)))
    writer.write(Converters.pointsToDf(spark, mk(1000)))
    assert(cat.allChunks.size == 2)
    val comp = new Compactor(spark, cat, l0FileThreshold = 2)
    val merged = comp.runOnce()
    assert(merged.size == 1)
    assert(merged.head.level == 1)
    assert(merged.head.rowCount == 20)
    cat.invalidateCache()
    assert(cat.allChunks.size == 1)
    assert(cat.state.pendingDeletes.size == 2)
    // data preserved and time-sorted
    val df = spark.read.parquet(merged.head.path)
    assert(df.count() == 20)
    val ts = df.select("timestamp_ns").collect().map(_.getLong(0))
    assert(ts.sorted.toSeq == ts.toSeq)
  }

  test("retention removes wholly-expired chunks with skew margin") {
    val cat = new ChunkCatalog(Files.createTempDirectory("graft_cmp4_"), cacheTtlMs = 0L)
    cat.registerAll(Seq(
      ChunkMeta("old", 0, 1000, 10, 100),
      ChunkMeta("new", 5000L * 1000000000L, 6000L * 1000000000L, 10, 100)))
    val comp = new Compactor(spark, cat)
    val removed = comp.applyRetention(cutoffNs = 4000L * 1000000000L)
    assert(removed == Seq("old"))
    cat.invalidateCache()
    assert(cat.allChunks.map(_.path) == Seq("new"))
  }
}
