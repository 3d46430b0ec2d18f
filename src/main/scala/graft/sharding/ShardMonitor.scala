package graft.sharding

import scala.collection.mutable

/** Hot-shard detection — the decision layer of the reference's ShardMonitor
  * (src/sharding/monitor.rs:24-34 thresholds, :186-220 evaluation):
  * a shard is HOT when any of {write QPS > 50 K/s, bytes/s > 500 MiB,
  * CPU > 0.75, p99 latency > 100 ms} holds over the rolling detection window,
  * and a SPLIT is recommended once it has stayed hot for longer than the
  * window (sustained 60 s by default).
  *
  * Spark posture: on a cluster this feeds from ingest-job metrics
  * (StreamingQueryListener / QueryExecutionListener), and the recommended
  * action is executed by `graft.compact.ShardSplitter` as a batch rewrite.
  * The clock is injected so the logic is deterministic and testable.
  */
final case class HotShardConfig(
    detectionWindowMs: Long = 60000L,
    writeQpsThreshold: Double = 50000.0,
    bytesPerSecThreshold: Double = 500.0 * 1024 * 1024,
    cpuThreshold: Double = 0.75,
    p99LatencyThresholdMs: Double = 100.0)

sealed trait ShardAction
object ShardAction {
  final case class Split(shardId: String) extends ShardAction
}

/** Time-windowed rolling average / rate (reference RollingAverage,
  * monitor.rs:38-91): samples older than the window are evicted on add.
  */
final class RollingAverage(windowMs: Long) {
  private val samples = mutable.ArrayDeque.empty[(Long, Double)]

  def addSample(v: Double, nowMs: Long): Unit = {
    samples.append((nowMs, v))
    while (samples.nonEmpty && nowMs - samples.head._1 > windowMs)
      samples.removeHead()
  }

  def avg: Double =
    if (samples.isEmpty) 0.0 else samples.iterator.map(_._2).sum / samples.size

  /** Samples per second over the observed span (reference rate_per_second —
    * used for the QPS axis, where each write adds one sample).
    */
  def ratePerSecond: Double = {
    if (samples.size < 2) return 0.0
    val span = (samples.last._1 - samples.head._1) / 1000.0
    if (span <= 0.0) 0.0 else samples.size / span
  }

  def isEmpty: Boolean = samples.isEmpty
}

final class ShardMonitor(config: HotShardConfig = HotShardConfig()) {

  private final class Metrics {
    val writeQps = new RollingAverage(config.detectionWindowMs)
    val bytesPerSec = new RollingAverage(config.detectionWindowMs)
    val cpu = new RollingAverage(config.detectionWindowMs)
    val p99LatencyMs = new RollingAverage(config.detectionWindowMs)
    var hotSinceMs: Option[Long] = None
  }

  private val metrics = mutable.Map.empty[String, Metrics]

  def recordWrite(shardId: String, bytes: Long, latencyMs: Double, nowMs: Long): Unit =
    synchronized {
      val m = metrics.getOrElseUpdate(shardId, new Metrics)
      m.writeQps.addSample(1.0, nowMs)
      m.bytesPerSec.addSample(bytes.toDouble, nowMs)
      m.p99LatencyMs.addSample(latencyMs, nowMs)
    }

  def recordCpu(shardId: String, utilization: Double, nowMs: Long): Unit =
    synchronized {
      metrics.getOrElseUpdate(shardId, new Metrics).cpu.addSample(utilization, nowMs)
    }

  /** Evaluate all shards: mark hot/cool, recommend Split for shards hot longer
    * than the detection window (reference evaluate_shards, monitor.rs:186-232).
    */
  def evaluateShards(nowMs: Long): Seq[ShardAction] = synchronized {
    metrics.toSeq.sortBy(_._1).flatMap { case (shardId, m) =>
      val isHot =
        m.writeQps.ratePerSecond > config.writeQpsThreshold ||
        m.bytesPerSec.avg > config.bytesPerSecThreshold ||
        m.cpu.avg > config.cpuThreshold ||
        m.p99LatencyMs.avg > config.p99LatencyThresholdMs
      if (isHot) {
        if (m.hotSinceMs.isEmpty) m.hotSinceMs = Some(nowMs)
        if (nowMs - m.hotSinceMs.get > config.detectionWindowMs)
          Some(ShardAction.Split(shardId))
        else None
      } else {
        m.hotSinceMs = None
        None
      }
    }
  }
}
