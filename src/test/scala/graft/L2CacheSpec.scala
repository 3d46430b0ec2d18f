package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.ChunkCatalog
import graft.engine.{QueryEngine, Telemetry}
import graft.ingest.{ChunkWriter, Converters, MetricPoint}
import java.nio.file.Files

/** L2 disk result-cache tier (reference foyer NVMe layer,
  * src/query/cached_store.rs:49-181): L1 evictions demote the materialized
  * result to a local parquet file; an L1 miss with a demoted key promotes it
  * back instead of re-executing. Byte-bounded, staleness-safe (the key carries
  * the pruned chunk-path set), and strictly fail-open (an unreadable file
  * falls through to a plain recompute).
  */
class L2CacheSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val hourNs = 3600L * 1000000000L
  private val t0 = 1704067200L * 1000000000L

  /** Engine whose L1 evicts every previously persisted entry on each insert
    * (retained budget 1 byte) so demotion is deterministic to trigger.
    */
  private def l2Engine(maxL2Bytes: Long = 256L << 20,
                       graceMs: Long = 0L): (QueryEngine, ChunkCatalog, java.io.File) = {
    val cat = new ChunkCatalog(Files.createTempDirectory("graft_l2_"), cacheTtlMs = 0L)
    val points = for {
      h <- 0 until 3; m <- Seq("cpu_usage", "mem_usage")
      host <- Seq("server1", "server2"); i <- 0 until 6
    } yield MetricPoint(t0 + h * hourNs + i * 600L * 1000000000L,
      m, (i % 100) / 100.0 + h, Map("host" -> host))
    new ChunkWriter(cat).write(Converters.pointsToDf(spark, points))
    val dir = Files.createTempDirectory("graft_l2c_").toFile
    val eng = new QueryEngine(spark, cat, QueryEngine.QueryLimits(
      maxCachedResultBytes = 1L << 20, maxRetainedCacheBytes = 1L,
      l2CacheDir = Some(dir.getAbsolutePath), maxL2CacheBytes = maxL2Bytes,
      l2DeleteGraceMs = graceMs))
    (eng, cat, dir)
  }

  private def eventually[T](timeoutMs: Long = 30000L)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond) {
      if (System.currentTimeMillis() > deadline) fail("condition not met in time")
      Thread.sleep(50)
    }
  }

  private def l2Dirs(root: java.io.File): Seq[java.io.File] =
    Option(root.listFiles()).map(_.toSeq.filter(_.isDirectory)).getOrElse(Nil)

  private val qA = s"SELECT metric_name, COUNT(*) AS c FROM metrics " +
    s"WHERE timestamp_ns >= $t0 GROUP BY metric_name ORDER BY metric_name"
  private val qB = s"SELECT host, COUNT(*) AS c FROM metrics " +
    s"WHERE timestamp_ns >= $t0 GROUP BY host ORDER BY host"

  test("L1 eviction demotes to disk; repeat serves from L2 as a LocalRelation") {
    val (eng, _, dir) = l2Engine()
    val d0 = Telemetry.l2Demotions.sum()
    val expected = eng.sql(qA).collect().map(_.toSeq).toSeq
    eng.sql(qB).count() // 1-byte retained budget → evicts qA → demote
    eventually() { Telemetry.l2Demotions.sum() > d0 }
    assert(l2Dirs(dir).nonEmpty, "demoted entry dir must exist")
    // small results demote as driver-serialized rows (no Spark job on promote)
    assert(l2Dirs(dir).exists(d => new java.io.File(d, "rows.bin").isFile),
      "localizable result must use the serialized-rows form")
    val h0 = Telemetry.l2Hits.sum()
    val served = eng.sql(qA)
    assert(Telemetry.l2Hits.sum() == h0 + 1, "repeat must be an L2 hit")
    assert(served.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "small L2 hit must serve a driver-local relation, not a rescan")
    assert(served.collect().map(_.toSeq).toSeq == expected)
    // the promoted entry is back in L1: the NEXT repeat is a plain L1 hit
    val h1 = Telemetry.l2Hits.sum()
    eng.sql(qA).count()
    assert(Telemetry.l2Hits.sum() == h1, "promoted entry must hit L1, not L2 again")
  }

  test("L2 byte budget LRU-evicts demoted files (grace-deferred delete)") {
    val (eng, _, dir) = l2Engine(maxL2Bytes = 1L, graceMs = 0L)
    val d0 = Telemetry.l2Demotions.sum()
    eng.sql(qA).count()
    eng.sql(qB).count() // demotes qA
    eventually() { Telemetry.l2Demotions.sum() >= d0 + 1 }
    // a third persisted insert evicts qB → demotes it → the 1-byte L2 budget
    // then LRU-evicts qA's file
    eng.sql(s"SELECT COUNT(DISTINCT host) AS h FROM metrics " +
      s"WHERE timestamp_ns >= $t0").count()
    eventually() { Telemetry.l2Demotions.sum() >= d0 + 2 }
    // budget of 1 byte keeps only the most recent demoted entry; the evicted
    // file is physically deleted (grace 0)
    eventually() { l2Dirs(dir).size == 1 }
  }

  test("staleness: new ingest changes the key, so L2 is never consulted") {
    val (eng, cat, _) = l2Engine()
    val d0 = Telemetry.l2Demotions.sum()
    val before = eng.sql(qA).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    eng.sql(qB).count()
    eventually() { Telemetry.l2Demotions.sum() > d0 }
    // a new chunk in the window changes the pruned path set → different key
    new ChunkWriter(cat).write(Converters.pointsToDf(spark,
      Seq(MetricPoint(t0 + 10L, "cpu_usage", 0.5, Map("host" -> "server3")))))
    val h0 = Telemetry.l2Hits.sum()
    val after = eng.sql(qA).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Telemetry.l2Hits.sum() == h0, "changed key must bypass the stale L2 entry")
    assert(after("cpu_usage") == before("cpu_usage") + 1, "fresh rows must be visible")
  }

  test("unreadable demoted file falls back to recompute (fail-open)") {
    val (eng, _, dir) = l2Engine()
    val d0 = Telemetry.l2Demotions.sum()
    val expected = eng.sql(qA).collect().map(_.toSeq).toSeq
    eng.sql(qB).count()
    eventually() { Telemetry.l2Demotions.sum() > d0 }
    // corrupt every demoted payload (serialized-rows or parquet form alike)
    l2Dirs(dir).foreach { d =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet") || f.getName == "rows.bin")
        .foreach { f => val w = new java.io.FileOutputStream(f); w.write(1); w.close() }
    }
    val h0 = Telemetry.l2Hits.sum()
    val served = eng.sql(qA).collect().map(_.toSeq).toSeq
    assert(served == expected, "corrupt L2 entry must recompute, not fail or mis-serve")
    assert(Telemetry.l2Hits.sum() == h0, "a failed promote is not a hit")
  }

  test("plan-only entries (never materialized) do not demote") {
    val (eng, _, dir) = l2Engine()
    // result estimate above maxCachedResultBytes → plan-cached but not persisted
    val cat2 = new ChunkCatalog(Files.createTempDirectory("graft_l2p_"), cacheTtlMs = 0L)
    val pts = for (i <- 0 until 100) yield
      MetricPoint(t0 + i * 1000000L, "m", i.toDouble, Map("host" -> "h"))
    new ChunkWriter(cat2).write(Converters.pointsToDf(spark, pts))
    val dir2 = Files.createTempDirectory("graft_l2c2_").toFile
    val eng2 = new QueryEngine(spark, cat2, QueryEngine.QueryLimits(
      maxCachedResultBytes = 0L, maxRetainedCacheBytes = 1L,
      l2CacheDir = Some(dir2.getAbsolutePath)))
    val d0 = Telemetry.l2Demotions.sum()
    eng2.sql(s"SELECT COUNT(*) AS c FROM metrics WHERE timestamp_ns >= $t0").count()
    eng2.sql(s"SELECT COUNT(*) AS c2 FROM metrics WHERE timestamp_ns >= $t0").count()
    Thread.sleep(500)
    assert(Telemetry.l2Demotions.sum() == d0, "plan-only entries must not demote")
    assert(l2Dirs(dir2).isEmpty)
    assert(eng != null && dir != null) // silence unused warnings
  }
}
