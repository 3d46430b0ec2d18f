package graft

import org.apache.spark.sql.SparkSession

/** Z-order clustering benefit at scale — the measured record behind the
  * `Compactor(clusterBy=...)` feature (ZORDER_SCALE.json).
  *
  * The warehouse's time pruning is catalog-level and already measured
  * (CATALOG_SCALE.json); what plain timestamp-sorted compaction CANNOT prune
  * is a label predicate (`host = 'host-17'`) inside a wide time window —
  * every chunk covers every host, so the scan reads the full window. This
  * probe builds the SAME dense warehouse twice (43.2 M rows, 2000 series,
  * 6 h) — once plain, once z-clustered on (metric_name, host) — and measures,
  * for a time-only control and two label point-predicates:
  *   - chunks scanned (engine lastPrunedPaths) and their catalog bytes,
  *   - cold query wall time (median of 5, plan cache defeated by a varying
  *     always-true literal),
  *   - result equality plain-vs-clustered (the probe fails loudly on drift),
  * plus the one-time compaction-sweep cost of each layout (the honest price
  * of clustering: a z-sort + range split instead of a timestamp sort).
  *
  * At 100 TB this is the difference between "a host dashboard reads the whole
  * retention window" and "it reads ~1/host-fraction of it": zone maps become
  * tight rectangles in every clustered column, so the existing catalog prune
  * (and parquet row-group stats inside each chunk) kill non-matching chunks.
  */
object ZOrderProbe {

  private def medianOf(runs: Seq[Double]): Double = {
    val s = runs.sorted
    s(s.size / 2)
  }

  private def round3(d: Double): Double = math.round(d * 1000.0) / 1000.0

  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("ZORDER_SCALE.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft_zorder_shuffle")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): (T, Double) = {
      val t = System.nanoTime(); val r = f
      val sec = (System.nanoTime() - t) / 1e9
      println(f"[zorder] $name: $sec%.2f s")
      (r, sec)
    }

    val hourNs = 3600L * 1000000000L
    val t0 = 1704067200L * 1000000000L
    val hours = 6
    // 2000 series × 1 Hz × 6 h = 43.2 M rows, ~2 hourly chunks per L0 flush pair
    val gen = graft.fixtures.DataGenerator.generate(spark,
      metrics = 50, hosts = 40, regions = 1,
      samplesPerSecond = 1, durationSeconds = 3600 * hours, partitions = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRows = gen.count()
    println(s"[zorder] fixture: $nRows rows, 50 metrics x 40 hosts, $hours h")

    def build(cluster: Boolean): (graft.engine.QueryEngine, graft.catalog.ChunkCatalog, Double) = {
      import org.apache.spark.sql.functions.col
      val root = java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"/dev/shm/graft_zorder_wh_${if (cluster) "z" else "plain"}"))
      val cat = new graft.catalog.ChunkCatalog(root)
      val writer = new graft.ingest.ChunkWriter(cat)
      // two interleaved flushes per hour → ripe L0 groups at threshold 2
      // (parity of the SECOND — timestamps step at 1 s, so raw-ns parity
      // would put every row in one flush)
      writer.write(gen.filter((col("timestamp_ns") / 1000000000L) % 2 === 0))
      writer.write(gen.filter((col("timestamp_ns") / 1000000000L) % 2 =!= 0))
      val comp =
        if (cluster) new graft.compact.Compactor(spark, cat, l0FileThreshold = 2,
          clusterBy = Seq("metric_name", "host"),
          clusterTargetBytes = 4L << 20, clusterMinLevel = 1)
        else new graft.compact.Compactor(spark, cat, l0FileThreshold = 2)
      val (_, sweepSec) = time(s"compaction sweep (cluster=$cluster)")(comp.runOnce())
      (new graft.engine.QueryEngine(spark, cat), cat, sweepSec)
    }

    val (plainEng, plainCat, plainSweep) = build(cluster = false)
    val (zEng, zCat, zSweep) = build(cluster = true)
    println(s"[zorder] chunks: plain=${plainCat.allChunks.size} z=${zCat.allChunks.size}")
    // both layouts must hold every generated row, and clustering must have
    // actually range-split (otherwise the probe is measuring nothing)
    require(plainCat.allChunks.map(_.rowCount).sum == nRows &&
      zCat.allChunks.map(_.rowCount).sum == nRows,
      s"row loss: plain=${plainCat.allChunks.map(_.rowCount).sum} " +
        s"z=${zCat.allChunks.map(_.rowCount).sum} want=$nRows")
    require(zCat.allChunks.size > plainCat.allChunks.size,
      "clustered sweep did not range-split — no z-buckets were produced")

    val endNs = t0 + hours * hourNs
    val queries = Seq(
      "time_only_control" -> "",
      "host_point" -> "AND host = 'host-17'",
      "metric_host_point" -> "AND metric_name = 'metric_12' AND host = 'host-17'")

    val results = queries.map { case (name, pred) =>
      def q(i: Int) =
        s"""SELECT metric_name, COUNT(*) AS cnt, SUM(value_f64) AS sum_v
           |FROM metrics
           |WHERE timestamp_ns >= $t0 AND timestamp_ns < $endNs $pred
           |  AND value_f64 > ${-100000 - i}
           |GROUP BY metric_name ORDER BY metric_name""".stripMargin

      // INTERLEAVED plain/z runs: back-to-back pairs see the same JIT and
      // page-cache state, so the median ratio measures the layout, not which
      // engine ran first
      var pRows: Seq[(String, Long, Double)] = Nil
      var zRows: Seq[(String, Long, Double)] = Nil
      var pChunksPaths: Seq[String] = Nil
      var zChunksPaths: Seq[String] = Nil
      def typed(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      val (pRuns, zRuns) = (1 to 5).map { i =>
        val (pr, pSec) = time(s"$name plain run$i")(plainEng.sql(q(i)).collect())
        pRows = typed(pr)
        pChunksPaths = plainEng.lastPrunedPaths
        val (zr, zSec) = time(s"$name z run$i")(zEng.sql(q(i)).collect())
        zRows = typed(zr)
        zChunksPaths = zEng.lastPrunedPaths
        (pSec, zSec)
      }.unzip
      val byPath = (plainCat.allChunks ++ zCat.allChunks).map(c => c.path -> c.sizeBytes).toMap
      val pMed = medianOf(pRuns); val zMed = medianOf(zRuns)
      val pBytes = pChunksPaths.flatMap(byPath.get).sum
      val zBytes = zChunksPaths.flatMap(byPath.get).sum
      val pChunks = pChunksPaths.size
      val zChunks = zChunksPaths.size
      // groups and counts must match exactly; the double SUM is order-sensitive
      // (different layout ⇒ different summation order), so compare within 1e-9
      // relative — layout must not change WHICH rows aggregate, only their order
      require(pRows.size == zRows.size &&
        pRows.zip(zRows).forall { case ((gp, cp, sp), (gz, cz, sz)) =>
          gp == gz && cp == cz && math.abs(sp - sz) <= 1e-9 * math.max(math.abs(sp), 1.0)
        },
        s"$name: clustered result diverged from plain:\n p=$pRows\n z=$zRows")
      println(f"[zorder] $name: plain ${pMed}%.2f s / $pChunks chunks / ${pBytes / 1e6}%.0f MB" +
        f"  vs z ${zMed}%.2f s / $zChunks chunks / ${zBytes / 1e6}%.0f MB")
      name -> Map(
        "plain_sec" -> round3(pMed), "z_sec" -> round3(zMed),
        "plain_chunks" -> pChunks, "z_chunks" -> zChunks,
        "plain_mb" -> (pBytes / 1000000), "z_mb" -> (zBytes / 1000000),
        "speedup" -> round3(pMed / math.max(zMed, 1e-9)))
    }

    def j(v: Any): String = v match {
      case m: Map[_, _] =>
        m.map { case (k, x) => "\"" + k + "\":" + j(x) }.mkString("{", ",", "}")
      case s: String => "\"" + s + "\""
      case other => other.toString
    }
    val record = Map(
      "what" -> ("Z-order clustered vs plain compaction on an identical warehouse: " +
        "label point-predicates prune chunks via the per-column zone-map rectangles " +
        "the z-sort creates; results verified equal"),
      "rows" -> nRows, "series" -> 2000, "hours" -> hours,
      "chunks_plain" -> plainCat.allChunks.size, "chunks_z" -> zCat.allChunks.size,
      "sweep_sec_plain" -> round3(plainSweep), "sweep_sec_z" -> round3(zSweep),
      "queries" -> results.toMap)
    val txt = j(record)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      txt.getBytes("UTF-8"))
    println(s"[zorder] wrote $outJson")
    println(txt)
    spark.stop()
  }
}
