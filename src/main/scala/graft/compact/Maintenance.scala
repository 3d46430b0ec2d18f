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
    downsample: Option[Maintenance.Downsample] = None,
    // Config gate for recommendation-driven Z-order layout (r8 directive #3):
    // when set, each sweep asks the controller for the VISIBLE top-scored
    // WHERE columns and clusters that sweep's cold merges by them. None =
    // layout untouched (the fixed clusterBy of `compactor`, or none).
    adaptiveClustering: Option[graft.adaptive.AdaptiveIndex.ClusteringController] = None) {

  private val comp = Option(compactor).getOrElse(new Compactor(spark, catalog))

  final case class SweepReport(
      compacted: Seq[ChunkMeta],
      retentionRemoved: Seq[String],
      gcDeleted: Seq[String],
      rolledUp: Option[RollupMeta],
      clusteredBy: Seq[String] = Nil)

  def runOnce(nowMs: Long = System.currentTimeMillis()): SweepReport = {
    val clusterCols = adaptiveClustering.map { ctrl =>
      // only columns the warehouse actually carries: a recommendation for a
      // column absent from every chunk would z-code to a constant (wasted key
      // bits), so it never reaches the layout
      val known = catalog.allChunks.flatMap(_.columnStats.keys).toSet
      ctrl.activeClusterColumns(nowMs = nowMs).filter(known)
    }.getOrElse(Nil)
    val sweepComp = if (clusterCols.nonEmpty) comp.withClusterBy(clusterCols) else comp
    val compacted = sweepComp.runOnce()
    val cutoffNs = nowMs * 1000000L - retentionNs
    val removed = comp.applyRetention(cutoffNs)
    val deleted = catalog.gc(nowMs)
    val rolledUp = downsample.flatMap { cfg =>
      val rollCutoffNs = nowMs * 1000000L - cfg.afterNs
      // a rollup only substitutes for this config when it matches on BOTH
      // resolution and label set — a same-resolution rollup with different
      // labels can answer different queries, never these
      def matches(r: RollupMeta): Boolean =
        r.resolutionSeconds == cfg.resolutionSeconds &&
          r.labelCols == cfg.labelCols
      Downsampler.agedCoverageEnd(catalog.allChunks, rollCutoffNs,
          cfg.resolutionSeconds).flatMap { covEnd =>
        // idempotence from metadata alone: act only when new data has aged
        // past what an existing matching rollup already covers
        if (catalog.rollups.exists(r => matches(r) &&
            r.maxCoveredNsExclusive >= covEnd)) None
        else {
          // steady state: EXTEND the widest matching prior incrementally
          // (O(newly aged), not O(all aged history)); full build only when
          // no prior exists
          val prior = catalog.rollups.filter(matches)
            .sortBy(-_.maxCoveredNsExclusive).headOption
          val built = prior match {
            case Some(p) =>
              Downsampler.extendAgedRollup(spark, catalog, p, rollCutoffNs)
            case None =>
              Downsampler.materializeAgedRollup(spark, catalog,
                cfg.resolutionSeconds, cfg.labelCols, rollCutoffNs)
          }
          built.foreach { meta =>
            // retire superseded matching registrations: dropRollup stops NEW
            // routing immediately; the FILES go through the same grace-period
            // GC as chunk rewrites — an immediate delete raced queries still
            // executing against the retired rollup's parquet (found by the
            // dual-maintenance soak: FileNotFoundException mid-scan)
            catalog.rollups
              .filter(r => matches(r) && r.path != meta.path &&
                r.maxCoveredNsExclusive <= meta.maxCoveredNsExclusive)
              .foreach { r =>
                catalog.dropRollup(r.path)
                catalog.deferDelete(Seq(r.path), nowMs)
              }
          }
          built
        }
      }
    }
    SweepReport(compacted, removed, deleted, rolledUp, clusterCols)
  }
}

object Maintenance {
  /** `downsample_after_days` as nanoseconds + target rollup shape. */
  final case class Downsample(afterNs: Long, resolutionSeconds: Long,
                              labelCols: Seq[String])
}
