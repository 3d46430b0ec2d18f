package graft.engine

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Self-telemetry counters — the engine's analog of the reference's OTel
  * instruments (src/query/telemetry.rs, src/ingester/telemetry.rs:
  * cardinalsin_query_requests_total / _latency_seconds /
  * _bytes_scanned_total / _cache_{hits,misses}_total,
  * cardinalsin_ingester_rows_total / _bytes_written_total /
  * _chunks_written_total). The reference registers instruments on the
  * process-global OTel meter; this registry is process-global the same way
  * (monotonic counters merge trivially across engines/writers, unlike
  * behavior flags). No OTLP exporter exists offline, so the export surface
  * is the Prometheus text exposition served at /metrics — the format every
  * scraper of a metrics database speaks anyway.
  */
object Telemetry {

  val queryRequestsOk = new LongAdder
  val queryRequestsError = new LongAdder
  val queryLatencyNsSum = new LongAdder
  val queryLatencyCount = new LongAdder
  private val queryLatencyNsMaxA = new AtomicLong(0L)
  val cacheHits = new LongAdder
  val cacheMisses = new LongAdder
  val l2Hits = new LongAdder
  val l2Demotions = new LongAdder
  /** HTTP responses served as pre-serialized cached bytes (r11 warm tier). */
  val httpByteCacheHits = new LongAdder
  val rollupRouted = new LongAdder
  val ingestRows = new LongAdder
  val ingestBytes = new LongAdder
  val ingestChunks = new LongAdder

  def recordQuery(latencyNs: Long, ok: Boolean): Unit = {
    (if (ok) queryRequestsOk else queryRequestsError).increment()
    queryLatencyNsSum.add(latencyNs)
    queryLatencyCount.increment()
    var cur = queryLatencyNsMaxA.get()
    while (latencyNs > cur && !queryLatencyNsMaxA.compareAndSet(cur, latencyNs))
      cur = queryLatencyNsMaxA.get()
  }

  def queryLatencyNsMax: Long = queryLatencyNsMaxA.get()

  /** Prometheus text exposition (version 0.0.4) of every counter. Latency is
    * exported as the sum/count/max triple (enough for rate() and averages —
    * a full histogram needs bucket boundaries the reference tunes per
    * deployment; flagged simplification).
    */
  def prometheusText(): String = {
    def c(name: String, help: String, value: Long, labels: String = ""): String =
      s"# HELP $name $help\n# TYPE $name counter\n$name$labels $value\n"
    def g(name: String, help: String, value: Double): String =
      s"# HELP $name $help\n# TYPE $name gauge\n$name $value\n"
    c("graft_query_requests_total", "Total query requests by result",
      queryRequestsOk.sum(), "{result=\"ok\"}") +
      s"graft_query_requests_total{result=\"error\"} ${queryRequestsError.sum()}\n" +
      "# HELP graft_query_latency_seconds_sum End-to-end query latency sum\n" +
      "# TYPE graft_query_latency_seconds_sum counter\n" +
      f"graft_query_latency_seconds_sum ${queryLatencyNsSum.sum() / 1e9}%.6f\n" +
      c("graft_query_latency_seconds_count", "Query latency sample count",
        queryLatencyCount.sum()) +
      g("graft_query_latency_seconds_max", "Max observed query latency",
        queryLatencyNsMax / 1e9) +
      c("graft_query_cache_hits_total", "Result/plan cache hits", cacheHits.sum()) +
      c("graft_query_cache_misses_total", "Result/plan cache misses", cacheMisses.sum()) +
      c("graft_query_l2_cache_hits_total",
        "L1 misses served from the L2 disk result-cache tier", l2Hits.sum()) +
      c("graft_query_l2_cache_demotions_total",
        "L1 evictions demoted to the L2 disk tier", l2Demotions.sum()) +
      c("graft_http_byte_cache_hits_total",
        "HTTP responses served as pre-serialized cached bytes",
        httpByteCacheHits.sum()) +
      c("graft_query_rollup_routed_total",
        "Queries answered from a registered rollup instead of raw chunks",
        rollupRouted.sum()) +
      c("graft_ingester_rows_total", "Rows ingested through ChunkWriter",
        ingestRows.sum()) +
      c("graft_ingester_bytes_written_total", "Compressed chunk bytes written",
        ingestBytes.sum()) +
      c("graft_ingester_chunks_written_total", "Chunks registered", ingestChunks.sum())
  }
}
