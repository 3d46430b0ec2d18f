package graft.compact

import org.apache.spark.sql.SparkSession
import graft.catalog.{ChunkCatalog, ChunkMeta, RollupMeta}

/** One maintenance sweep = what the reference's background services do on their
  * 60 s tick (src/compactor/mod.rs:150-250): compaction, retention, GC — expressed
  * as a single idempotent batch entrypoint a scheduler (cron / Airflow / streaming
  * trigger) invokes. With a [[Maintenance.Downsample]] config the sweep also runs
  * the reference's configured-but-unimplemented `downsample_after_days` loop
  * (mod.rs:70-91): chunks that have fully aged past the threshold are rolled up
  * at the configured resolution and registered for engine-side query routing
  * ([[graft.plans.RollupRouting]]); live ingest beyond the coverage never
  * invalidates the rollup, and the sweep is a no-op while no NEW data has aged.
  */
final class Maintenance(
    spark: SparkSession,
    catalog: ChunkCatalog,
    retentionNs: Long = 90L * 86400 * 1000000000L, // 90 days, reference default
    compactor: Compactor = null,
    downsample: Option[Maintenance.Downsample] = None) {

  private val comp = Option(compactor).getOrElse(new Compactor(spark, catalog))

  final case class SweepReport(
      compacted: Seq[ChunkMeta],
      retentionRemoved: Seq[String],
      gcDeleted: Seq[String],
      rolledUp: Option[RollupMeta])

  def runOnce(nowMs: Long = System.currentTimeMillis()): SweepReport = {
    val compacted = comp.runOnce()
    val cutoffNs = nowMs * 1000000L - retentionNs
    val removed = comp.applyRetention(cutoffNs)
    val deleted = catalog.gc(nowMs)
    val rolledUp = downsample.flatMap { cfg =>
      val rollCutoffNs = nowMs * 1000000L - cfg.afterNs
      Downsampler.agedCoverageEnd(catalog.allChunks, rollCutoffNs,
          cfg.resolutionSeconds).flatMap { covEnd =>
        // idempotence from metadata alone: only rebuild when new data has
        // aged past what an existing same-resolution rollup already covers
        val already = catalog.rollups.exists(r =>
          r.resolutionSeconds == cfg.resolutionSeconds &&
            r.maxCoveredNsExclusive >= covEnd)
        if (already) None
        else Downsampler.materializeAgedRollup(spark, catalog,
            cfg.resolutionSeconds, cfg.labelCols, rollCutoffNs).map { meta =>
          // retire superseded same-resolution registrations (their files are
          // left for GC-by-convention; the catalog stops routing to them)
          catalog.rollups
            .filter(r => r.resolutionSeconds == cfg.resolutionSeconds &&
              r.path != meta.path &&
              r.maxCoveredNsExclusive <= meta.maxCoveredNsExclusive)
            .foreach(r => catalog.dropRollup(r.path))
          meta
        }
      }
    }
    SweepReport(compacted, removed, deleted, rolledUp)
  }
}

object Maintenance {
  /** `downsample_after_days` as nanoseconds + target rollup shape. */
  final case class Downsample(afterNs: Long, resolutionSeconds: Long,
                              labelCols: Seq[String])
}
