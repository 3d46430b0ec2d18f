package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.schema.MetricSchema

/** Historical + live streaming merge — the Spark Structured Streaming equivalent of
  * the reference's streaming query path (src/query/streaming.rs:73-202):
  *
  *  - The reference runs the SQL over a chunk snapshot, streams those batches, then
  *    tails a broadcast of freshly-flushed batches; `merge_timestamp` is fixed at
  *    query start and live rows with `timestamp < merge_timestamp` are DROPPED (the
  *    dedup boundary between phases — streaming.rs:361-383). No watermark, no
  *    retraction: late rows are silently dropped from the live phase only.
  *
  *  - Here: `historical` is a batch DataFrame over the snapshot; `liveTail` is a
  *    file-source stream over the chunk directory (newly flushed chunk files ARE the
  *    live feed) with the same WHERE applied per micro-batch — Catalyst replaces the
  *    reference's hand-rolled 420-LoC row-filter interpreter
  *    (streaming.rs:219-636) — plus the merge-timestamp cutoff.
  *
  * Topic filters (reference src/ingester/topic_broadcast.rs:13-222) map to plain
  * column predicates on the stream (`metric_name isin ...`), composable with And/Or.
  */
object LiveMerge {

  /** Snapshot phase: everything visible in the catalog at query start. */
  def historical(engine: graft.engine.QueryEngine, sql: String,
                 nowNs: Long = System.currentTimeMillis() * 1000000L): DataFrame =
    engine.sql(sql, nowNs)

  /** Live phase: tail the chunk directory as a file-source stream. Rows before
    * `mergeTimestampNs` are dropped (reference cutoff, streaming.rs:361-383);
    * `where` is the query's WHERE clause applied per live batch.
    */
  def liveTail(spark: SparkSession,
               chunkRoot: String,
               schema: StructType,
               mergeTimestampNs: Long,
               where: Option[String] = None,
               maxFilesPerTrigger: Int = 64): DataFrame = {
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(chunkRoot)
    val cut = raw.filter(col(MetricSchema.TimestampNsCol) >= mergeTimestampNs)
    where.fold(cut)(w => cut.filter(expr(w)))
  }

  /** Serving-surface live tail: the flush-broadcast subscription of the
    * reference's `live:true` streaming path (src/api/query/streaming.rs:89-125
    * subscribes to the ingester broadcast and forwards every freshly flushed
    * batch; src/query/streaming.rs:361-383 drops live rows with
    * `timestamp < merge_timestamp`). Here the "broadcast" is the catalog:
    * each `poll()` returns the rows of chunks registered since the last poll
    * (or since construction — construct BEFORE the historical phase so no
    * flush can fall between snapshot and subscription), merge-cutoff applied.
    * Each poll is a small batch read of only the NEW chunk files — no
    * per-connection Structured Streaming query, so a serving node can hold
    * many tails cheaply.
    */
  final class CatalogTail(spark: SparkSession, catalog: graft.catalog.ChunkCatalog,
                          val mergeTimestampNs: Long) {
    // Seed with the snapshot's chunks AND their L0 provenance: a pre-snapshot
    // flush that was long since compacted away must never be "recovered" —
    // its rows belonged to the historical phase.
    private var seen: Set[String] = {
      val cs = catalog.allChunks
      cs.map(_.path).toSet ++ cs.flatMap(_.sourcePaths)
    }

    /** Rows flushed since the last poll with ts >= merge cutoff; None if no new
      * chunks. Late rows (ts < cutoff) are silently dropped, faithful to the
      * reference's dedup boundary — they were the historical phase's to serve.
      *
      * Delivery is tracked per level-0 FLUSH, not per catalog entry, because
      * compaction/splits rewrite entries between polls:
      *  - a fresh provenance-free level-0 chunk is a new flush → deliver it;
      *  - a fresh REWRITE (merged chunk, split half — carries sourcePaths)
      *    holds rows of flushes that were each either already delivered (their
      *    path is seen) or flushed-then-rewritten-away between polls (never in
      *    the catalog at a poll). The latter are recovered by reading those
      *    source flush files directly — still on disk under grace-period GC.
      *    Forwarding the rewrite itself would duplicate the delivered part.
      * A tail stalled past the GC grace period loses the recovered flushes —
      * the same lagging-subscriber semantics as the reference's bounded
      * broadcast channel (src/api/query/streaming.rs live subscription).
      */
    def poll(): Option[DataFrame] = {
      catalog.invalidateCache()
      val fresh = catalog.allChunks.filterNot(c => seen.contains(c.path))
      if (fresh.isEmpty) None
      else {
        seen ++= fresh.map(_.path)
        val flushes = fresh.filter(c => c.level == 0 && c.sourcePaths.isEmpty).map(_.path)
        val recovered = fresh.flatMap(_.sourcePaths).distinct.filterNot(seen.contains)
        seen ++= recovered
        val readable = flushes ++ recovered.filter(p =>
          java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        if (readable.isEmpty) None
        else Some(spark.read.option("mergeSchema", "true")
          .parquet(readable: _*)
          .filter(col(MetricSchema.TimestampNsCol) >= mergeTimestampNs))
      }
    }
  }

  /** Topic subscription filters (All / Metrics / And / Or — reference
    * topic_broadcast.rs:121-222) expressed as Column predicates.
    */
  sealed trait TopicFilter {
    def toColumn: org.apache.spark.sql.Column = this match {
      case TopicFilter.All => lit(true)
      case TopicFilter.Metrics(ms) => col(MetricSchema.MetricNameCol).isin(ms: _*)
      case TopicFilter.Shard(id) => col("shard_id") === id
      case TopicFilter.Tenant(id) => col("tenant_id") === id
      case TopicFilter.And(l, r) => l.toColumn && r.toColumn
      case TopicFilter.Or(l, r) => l.toColumn || r.toColumn
    }
  }
  object TopicFilter {
    case object All extends TopicFilter
    final case class Metrics(metrics: Seq[String]) extends TopicFilter
    final case class Shard(id: String) extends TopicFilter
    final case class Tenant(id: Long) extends TopicFilter
    final case class And(l: TopicFilter, r: TopicFilter) extends TopicFilter
    final case class Or(l: TopicFilter, r: TopicFilter) extends TopicFilter
  }

  /** Streaming INGEST sink — the Structured Streaming equivalent of the
    * reference's continuous ingester (WAL → write buffer → flush triggers,
    * src/ingester/mod.rs:75-88,632-714): each micro-batch flushes through the
    * SAME production path as batch ingest (sorted hour-partitioned ZSTD chunks
    * + zone maps + atomic catalog registration via ChunkWriter.write), so a
    * stream and a backfill produce byte-identical warehouses.
    *
    * Durability mapping: the reference's WAL replay-on-crash is provided by the
    * streaming checkpoint; foreachBatch is AT-LEAST-once (a micro-batch whose
    * write succeeded but whose checkpoint commit didn't is re-executed), so the
    * sink is made IDEMPOTENT by keying each write on the micro-batch id: the
    * batch dir is derived from batchId and a batch already registered in the
    * catalog is skipped (see ChunkWriter.write batchTag) — replays are no-ops,
    * giving effective exactly-once. The reference's flush triggers (5 min OR
    * 1 M rows OR 100 MB) map to the stream trigger interval and micro-batch
    * sizing options (maxFilesPerTrigger / maxOffsetsPerTrigger on the source).
    *
    * Returns the StreamingQuery; caller owns lifecycle.
    */
  def ingestSink(metrics: DataFrame, // a STREAMING DataFrame in the metrics schema
                 catalog: graft.catalog.ChunkCatalog,
                 checkpointDir: String,
                 tenant: String = "default",
                 triggerIntervalMs: Long = 250L, // reference micro-batch 250 ms
                 sinkId: String = "stream" // distinguishes concurrent sinks on one catalog
                ): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = new graft.ingest.ChunkWriter(catalog, tenant)
    metrics.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerIntervalMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(writer, batch, batchId, sinkId); ()
      }
      .start()
  }

  /** The foreachBatch body, exposed for direct testing of replay semantics. */
  def ingestBatch(writer: graft.ingest.ChunkWriter, batch: DataFrame, batchId: Long,
                  sinkId: String = "stream"): Seq[graft.catalog.ChunkMeta] =
    if (batch.isEmpty) Nil
    else writer.write(batch, batchTag = Some(s"$sinkId-$batchId"))

  /** EXTENSION (beyond the reference, flagged per SURVEY.md §2.9): real event-time
    * windowed aggregation with a watermark — tumbling `windowSeconds` buckets of
    * count/avg per metric, late data bounded by `lateness`.
    */
  def windowedAggExtension(live: DataFrame, windowSeconds: Int,
                           lateness: String = "10 minutes"): DataFrame =
    live
      .withColumn("event_time",
        timestamp_micros(expr(s"${MetricSchema.TimestampNsCol} div 1000")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), s"$windowSeconds seconds"),
        col(MetricSchema.MetricNameCol))
      .agg(count(lit(1)).as("cnt"), avg(col(MetricSchema.ValueF64)).as("avg_value"))
}
