package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sharding.{HotShardConfig, RollingAverage, ShardAction, ShardMonitor}
import graft.catalog.{ChunkCatalog, ChunkMeta}
import graft.compact.Compactor
import graft.engine.QueryEngine
import java.nio.file.Files

/** Operational control surfaces ported from the reference: hot-shard detection
  * (src/sharding/monitor.rs), compaction backpressure (src/compactor/mod.rs:
  * 203-221), query concurrency + timeout (src/query/mod.rs:50-60).
  */
class OpsControlSpec extends AnyFunSuite {

  test("rolling average: eviction, avg, rate") {
    val r = new RollingAverage(windowMs = 1000L)
    r.addSample(10.0, nowMs = 0L)
    r.addSample(20.0, nowMs = 500L)
    assert(r.avg == 15.0)
    r.addSample(30.0, nowMs = 1600L) // evicts both older samples
    assert(r.avg == 30.0)
    // rate: 3 samples over 1 second span
    val q = new RollingAverage(windowMs = 60000L)
    q.addSample(1.0, 0L); q.addSample(1.0, 500L); q.addSample(1.0, 1000L)
    assert(q.ratePerSecond == 3.0)
  }

  test("hot shard: split only after sustained hotness over the detection window") {
    val mon = new ShardMonitor(HotShardConfig(
      detectionWindowMs = 60000L, writeQpsThreshold = 10.0))
    // 100 writes in 1 s → 100 QPS >> 10 → hot, but not yet sustained
    (0 until 100).foreach(i => mon.recordWrite("s1", 100L, 1.0, nowMs = i * 10L))
    assert(mon.evaluateShards(nowMs = 1000L).isEmpty) // just became hot
    // keep it hot past the window → Split recommended
    (0 until 100).foreach(i => mon.recordWrite("s1", 100L, 1.0, nowMs = 61000L + i * 10L))
    assert(mon.evaluateShards(nowMs = 62000L) == Seq(ShardAction.Split("s1")))
  }

  test("hot shard: each threshold axis triggers; cooling resets the clock") {
    val cfg = HotShardConfig(detectionWindowMs = 1000L)
    val mon = new ShardMonitor(cfg)
    // CPU axis
    mon.recordCpu("c", 0.9, nowMs = 0L)
    assert(mon.evaluateShards(0L).isEmpty) // hot, not sustained
    mon.recordCpu("c", 0.9, nowMs = 1500L)
    assert(mon.evaluateShards(1500L) == Seq(ShardAction.Split("c")))
    // latency axis
    mon.recordWrite("l", 1L, latencyMs = 500.0, nowMs = 0L)
    // cooling: samples age out → hot_since cleared, then re-hot restarts the clock
    mon.recordCpu("c", 0.1, nowMs = 5000L) // old hot samples evicted
    assert(!mon.evaluateShards(5000L).contains(ShardAction.Split("c")))
    mon.recordCpu("c", 0.9, nowMs = 6000L)
    assert(!mon.evaluateShards(6000L).contains(ShardAction.Split("c"))) // clock restarted
  }

  test("compaction backpressure: 0 / 50 / 100 ms bands at 3x and 6x the L0 threshold") {
    val cat = new ChunkCatalog(Files.createTempDirectory("graft_bp_"), cacheTtlMs = 0L)
    val compactor = new Compactor(SparkTestBase.spark, cat, l0FileThreshold = 2)
    def addL0(n: Int, from: Int): Unit = (from until (from + n)).foreach(i =>
      cat.register(ChunkMeta(s"c$i", i * 1000L, i * 1000L + 1, 1, 1, level = 0)))
    addL0(5, 0) // 5 ≤ 3·2=6 → no backpressure
    cat.invalidateCache()
    val bp0 = compactor.backpressure()
    assert(bp0.l0PendingFiles == 5 && !bp0.isBehind && bp0.recommendedDelayMs == 0L)
    addL0(5, 5) // 10 > 6 → moderate
    cat.invalidateCache()
    val bp1 = compactor.backpressure()
    assert(bp1.isBehind && bp1.recommendedDelayMs == 50L)
    addL0(5, 10) // 15 > 12 → significant
    cat.invalidateCache()
    assert(compactor.backpressure().recommendedDelayMs == 100L)
  }

  test("query timeout cancels the job group and surfaces QueryTimeoutException") {
    val spark = SparkTestBase.spark
    val cat = new ChunkCatalog(Files.createTempDirectory("graft_qt_"), cacheTtlMs = 0L)
    val eng = new QueryEngine(spark, cat,
      QueryEngine.QueryLimits(maxConcurrent = 4, timeoutMs = 800L))
    // interruptible slow tasks (sleep responds to interruptOnCancel; a tight
    // codegen'd range loop would linger after cancellation and pin local threads)
    val slow = org.apache.spark.sql.functions.udf { x: Long => Thread.sleep(20000L); x }
    val ex = intercept[QueryEngine.QueryTimeoutException] {
      eng.execute("SELECT COUNT(*) AS c FROM metrics") { _ =>
        spark.range(0L, 4L, 1L, 4).select(slow(org.apache.spark.sql.functions.col("id")))
          .collect()
      }
    }
    assert(ex.getMessage.contains("800 ms"))
  }

  test("query concurrency gate serializes beyond maxConcurrent") {
    val spark = SparkTestBase.spark
    val cat = new ChunkCatalog(Files.createTempDirectory("graft_qc_"), cacheTtlMs = 0L)
    val eng = new QueryEngine(spark, cat,
      QueryEngine.QueryLimits(maxConcurrent = 1, timeoutMs = 60000L))
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 3).map { _ =>
      new Thread(() => {
        eng.execute("SELECT COUNT(*) AS c FROM metrics") { df =>
          val n = inFlight.incrementAndGet()
          maxSeen.updateAndGet(m => math.max(m, n))
          Thread.sleep(150)
          inFlight.decrementAndGet()
          df.collect()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(maxSeen.get() == 1) // permit=1 → never two queries in flight
  }
}
