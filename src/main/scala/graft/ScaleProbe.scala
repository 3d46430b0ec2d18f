package graft

import org.apache.spark.sql.SparkSession

/** Manual scale probe: ingest a generator batch 1-2 orders beyond the bench SF and
  * confirm the plans/pruning hold (chunk counts, pruned-path counts, timings).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nHours = if (args.nonEmpty) args(0).toInt else 24
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // shuffle on tmpfs (the host block device intermittently throttles
      // ~100×); the DURABLE parquet write below still goes to real disk —
      // that's the axis this probe measures
      .config("spark.local.dir", "/dev/shm/graft_scale_shuffle")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[scale] $name: ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    val warehouse = java.nio.file.Files.createTempDirectory("graft_scale_")
    val catalog = new graft.catalog.ChunkCatalog(warehouse)
    val writer = new graft.ingest.ChunkWriter(catalog)
    // 100 series × 60 Hz × nHours → 21.6 M samples/day-equivalent
    val rows = 100L * 60 * 3600 * nHours
    println(s"[scale] generating $rows rows over $nHours hours")
    val df = graft.fixtures.DataGenerator.generate(spark,
      metrics = 10, hosts = 5, regions = 2,
      samplesPerSecond = 60, durationSeconds = 3600 * nHours, partitions = 64)
    time("ingest")(writer.write(df))
    println(s"[scale] chunks: ${catalog.allChunks.size}, " +
      s"rows: ${catalog.allChunks.map(_.rowCount).sum}, " +
      s"bytes: ${catalog.allChunks.map(_.sizeBytes).sum / (1 << 20)} MiB")

    val eng = new graft.engine.QueryEngine(spark, catalog)
    val t0 = 1704067200L * 1000000000L
    // pruned window: 10 minutes out of nHours
    val q1 =
      s"""SELECT metric_name, COUNT(*) AS cnt, AVG(value_f64) AS v FROM metrics
         |WHERE timestamp_ns >= ${t0 + 3600L * 1000000000L}
         |  AND timestamp_ns < ${t0 + 4200L * 1000000000L}
         |GROUP BY metric_name""".stripMargin
    val r1 = time("pruned 10-min agg")(eng.sql(q1).collect())
    println(s"[scale] pruned paths: ${eng.lastPrunedPaths.size} of ${catalog.allChunks.size}; " +
      s"rows out: ${r1.length}")
    val r1b = time("pruned 10-min agg (warm)")(eng.sql(q1).collect())
    // full-scan rollup
    val q2 =
      s"""SELECT metric_name, host, COUNT(*) AS cnt, MAX(value_f64) AS mx FROM metrics
         |WHERE timestamp_ns >= $t0 AND timestamp_ns <= ${t0 + nHours * 3600L * 1000000000L}
         |GROUP BY metric_name, host""".stripMargin
    val r2 = time("full-scan rollup")(eng.sql(q2).collect())
    println(s"[scale] full rollup groups: ${r2.length}")
    // compaction sweep over the L0 state
    val comp = new graft.compact.Compactor(spark, catalog, l0FileThreshold = 1)
    println(s"[scale] L0 candidate groups: ${comp.l0Candidates().size}")
    spark.stop()
  }
}
