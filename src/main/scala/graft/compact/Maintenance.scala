package graft.compact

import org.apache.spark.sql.SparkSession
import graft.catalog.{ChunkCatalog, ChunkMeta}

/** One maintenance sweep = what the reference's background services do on their
  * 60 s tick (src/compactor/mod.rs:150-250): compaction, retention, GC — expressed
  * as a single idempotent batch entrypoint a scheduler (cron / Airflow / streaming
  * trigger) invokes.
  */
final class Maintenance(
    spark: SparkSession,
    catalog: ChunkCatalog,
    retentionNs: Long = 90L * 86400 * 1000000000L, // 90 days, reference default
    compactor: Compactor = null) {

  private val comp = Option(compactor).getOrElse(new Compactor(spark, catalog))

  final case class SweepReport(
      compacted: Seq[ChunkMeta],
      retentionRemoved: Seq[String],
      gcDeleted: Seq[String])

  def runOnce(nowMs: Long = System.currentTimeMillis()): SweepReport = {
    val compacted = comp.runOnce()
    val cutoffNs = nowMs * 1000000L - retentionNs
    val removed = comp.applyRetention(cutoffNs)
    val deleted = catalog.gc(nowMs)
    SweepReport(compacted, removed, deleted)
  }
}
