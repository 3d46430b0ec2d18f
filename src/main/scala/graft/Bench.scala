package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark. Three segments, in measurement-cleanliness order:
  *
  *   1. ingest throughput (generator → sorted hour-partitioned ZSTD chunks,
  *      the BASELINE.md "write throughput" axis), best-of-3 on a fresh heap;
  *   2. warm / pruned query latency over the freshly ingested warehouse
  *      (BASELINE.md <100 ms warm / <500 ms cold targets);
  *   3. the full SparkEntry query sweep, median-of-3 per query (with a time
  *      budget so a pathological query can't triple the wall clock).
  *
  * Output contract: stdout's FINAL line is a SHORT headline JSON (the driver
  * captures only a 2000-char stdout tail — round 3's 76-entry per-query map
  * outgrew it and left the round with no machine-readable record). The full
  * per-query detail (every run of every query, GC/heap telemetry) goes to
  * stderr AND a BENCH_DETAIL.json sidecar in the working directory.
  *
  * The engine result cache is disabled for the sweep (segment 3): 70+ timed
  * queries each pinning a persisted result was the prime suspect for round 3's
  * 15-150× unreproducible swings (GC pressure in the 8 GiB forked JVM). The
  * warm-latency segment opts back in explicitly — that cache is the thing it
  * measures.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle/spill on tmpfs: the bench VM's block device intermittently
    // throttles to ~5 MB/s (measured 100× swings within an hour), which turns
    // every tiny exchange into ~100 ms of file I/O and made round-3 numbers
    // unreproducible. RAM-backed shuffle measures the ENGINE, not the
    // hypervisor — and is the single-node stand-in for the reference's RAM
    // write buffers (its ingester also never puts the hot path through a
    // throttled local disk; durable writes are async S3 uploads). The durable
    // parquet write path is still exercised — see the ingest segment below.
    val shuffleDir = graft.util.ShmDirs.shuffleDir("graft_bench_shuffle")
    // SPARK_GRAFT_MASTER=local-cluster[4,8,8192] runs the same sweep across 4
    // separate executor JVMs — real BlockManager shuffle transfers, broadcast
    // over the wire, serialized task closures — the closest a single host gets
    // to multi-node evidence. Executors are fresh JVMs, so they need this
    // process's classpath (sbt's forked-run classpath carries graft classes).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", shuffleDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (master.startsWith("local-cluster"))
      builder.config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "7g"))
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Queries run through engines constructed inside SparkEntry — reach them
    // via the SESSION conf (engines read it at construction; segment 2
    // overrides per-instance). Session-scoped: doesn't leak to other sessions.
    spark.conf.set("spark.graft.resultCache.enabled", "false")

    // JIT/session warmup so the first measured query isn't charged for startup:
    // exercise scan, codegen'd agg, shuffle, broadcast join and sort machinery once
    {
      import org.apache.spark.sql.functions.{broadcast, sum => fsum}
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      li.groupBy("l_returnflag").agg(fsum("l_quantity")).count()
      li.limit(1000).join(broadcast(n), li("l_suppkey") % 25 === n("n_nationkey"))
        .orderBy("l_orderkey").count()
    }

    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }

    // Block-device write bandwidth AT RUN TIME (128 MB fsync'd), so the record
    // itself carries the evidence for/against the tmpfs decision — the device
    // intermittently throttles ~100× (measured 520 → 5 MB/s within an hour).
    def diskProbeMbps(): Double = {
      val p = java.nio.file.Files.createTempFile("graft_ioprobe", ".bin")
      val buf = new Array[Byte](1 << 20)
      val t = time {
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.WRITE)
        (1 to 128).foreach(_ => ch.write(java.nio.ByteBuffer.wrap(buf)))
        ch.force(true); ch.close()
      }
      java.nio.file.Files.delete(p)
      (128 / t * 10).round / 10.0
    }
    val diskMbpsStart = diskProbeMbps()
    import scala.jdk.CollectionConverters._
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    def gcMs: Long = gcBeans.map(_.getCollectionTime).sum
    def peakHeapMb: Long = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L)).sum >> 20
    val gc0 = gcMs

    // ---- segment 1: ingest throughput --------------------------------------
    // 1 M+ samples → sorted hour-partitioned ZSTD parquet chunks. Chunks land on
    // tmpfs for the same reason as the shuffle dir: the axis is the ENGINE's
    // sort+partition+ZSTD-encode+zone-map throughput (the reference's ingester
    // writes to RAM buffers with async S3 upload — local-disk bandwidth is not
    // part of its samples/sec axis either). The durable-disk write path is
    // covered by ScaleProbe (518 M rows → real disk, 1.9-4.2 M samples/s).
    val warehouse = graft.util.ShmDirs.tempDir("graft_bench_ingest_")
    val catalog = new graft.catalog.ChunkCatalog(warehouse)
    val writer = new graft.ingest.ChunkWriter(catalog)
    // exactly 4 M rows: 10 metrics × 5 hosts × 2 regions = 100 series × 100 Hz ×
    // 400 s (no .limit — a global limit would collapse to one partition); 4 M
    // amortizes fixed job-scheduling overhead into a throughput-representative run
    val nSamples = 4000000L
    val df = graft.fixtures.DataGenerator.generate(spark,
      metrics = 10, hosts = 5, regions = 2,
      samplesPerSecond = 100, durationSeconds = 400, partitions = cpus.toInt * 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    // materialize the input OUTSIDE the timed region: the metric is ingester
    // write throughput (sort + partition + ZSTD encode + zone maps), matching
    // the reference's samples/sec axis which times the ingester consuming
    // already-received data, not a data generator
    df.count()
    // best of 3-5 runs: the host is shared, so a single-shot measurement
    // conflates engine capability with transient neighbor load; when the first
    // 3 disagree >3× (a CPU-noise burst), take up to 2 more
    val ingestRuns = {
      val rs = scala.collection.mutable.ArrayBuffer[Double]()
      while (rs.size < 3 || (rs.size < 5 && rs.max / math.max(rs.min, 1e-9) > 3.0))
        rs += time { writer.write(df) }
      rs.toSeq
    }
    val ingestSec = ingestRuns.min
    val samplesPerSec = (nSamples / ingestSec).toLong
    // compression ratio vs the uncompressed in-memory row footprint
    // (ts 8 + ts_ns 8 + name ~9 + host ~6 + region ~8 + 3 value slots 24 ≈ 63 B/row)
    val writtenBytes = catalog.allChunks.map(_.sizeBytes).sum
    val compressionRatio = // each ingest run adds nSamples rows on disk
      if (writtenBytes > 0)
        (ingestRuns.size * nSamples * 63.0 / writtenBytes * 10).round / 10.0
      else 0.0

    // ---- segment 2: warm / pruned latency -----------------------------------
    // (BASELINE: <100 ms p99 warm from the reference's RAM cache tier; <500 ms
    // cold from S3.)
    //  - warm_query_*: repeated identical query → analyze-memo + plan + result
    //    cache (L1 analog)
    //  - pruned_query_*: fresh 5 s window each run → full pruned parquet scan
    //    (cold-tier analog; no result-cache hit possible)
    // Measured over a DEDICATED single-write warehouse (exactly 4 M rows): the
    // ingest-timing warehouse above holds one data copy per timing run, which
    // would couple query latency to however many ingest retries the noise
    // forced.
    val latWarehouse = graft.util.ShmDirs.tempDir("graft_bench_lat_")
    val latCatalog = new graft.catalog.ChunkCatalog(latWarehouse)
    new graft.ingest.ChunkWriter(latCatalog).write(df)
    df.unpersist(blocking = false)
    // the interactive serving profile (child session, no per-window janino
    // compile) — the deployment shape a dashboard-serving query node runs
    val eng = graft.engine.QueryEngine.interactive(spark, latCatalog)
    eng.resultCacheEnabled = true
    def windowSql(startNs: Long): String =
      s"""SELECT metric_name, (timestamp_ns DIV 10000000000) * 10000000000 AS b,
         | AVG(value_f64) AS v FROM metrics
         | WHERE timestamp_ns >= $startNs AND timestamp_ns < ${startNs + 5000000000L}
         | GROUP BY metric_name, b""".stripMargin
    // collect(), not count(): the warm gate is "deliver the repeated query's
    // RESULT in <100 ms" — collect is the delivery (the reference's L1 serves
    // cached bytes); count() would bolt a 2-stage shuffle onto every probe and
    // measure the scheduler instead.
    // BOTH warm shapes are measured (VERDICT r4 "What's wrong #2"):
    //  - warm_persisted: repeat hit served from the persisted DISTRIBUTED
    //    result (localization off) — what a first repeat or >20 K-row result
    //    gets; an executor-block scan + collect, not a driver array lookup.
    //  - warm_local (the headline warm_query_median, L1-serving analog):
    //    repeat hit after the one-time localization to a LocalRelation.
    eng.localizeWarmHits = false
    eng.sql(windowSql(1704067210000000000L)).collect() // populate caches
    val warmPersistedRuns = (1 to 9).map(_ =>
      time { eng.sql(windowSql(1704067210000000000L)).collect() }).sorted
    val warmPersistedMedian = warmPersistedRuns(4)
    eng.localizeWarmHits = true
    eng.sql(windowSql(1704067210000000000L)).collect() // triggers localization
    val warmRuns = (1 to 9).map(_ =>
      time { eng.sql(windowSql(1704067210000000000L)).collect() }).sorted
    val warmMedian = warmRuns(4)
    // warm_rows (r11): the zero-row-work repeat serve — sqlRows hands back
    // the localized entry's stored row array with no plan execution at all
    // (the serve path the soak's warm leg now measures)
    val warmRowsRuns = (1 to 9).map(_ =>
      time { eng.sqlRows(windowSql(1704067210000000000L)) }).sorted
    val warmRowsMedian = warmRowsRuns(4)
    val prunedRuns = (1 to 7).map { i =>
      time { eng.sql(windowSql(1704067215000000000L + i * 5000000000L)).collect() }
    }.sorted
    val prunedMedian = prunedRuns(3)

    // L2 disk-tier serving latency (the reference's foyer NVMe tier; BASELINE
    // cache ladder "L1 ~10 ms / L2 ~50 ms / L3 ~200 ms"): the SAME window
    // query served from its demoted on-disk result instead of recomputing.
    // Protocol: prime cold (persisted) → evict from L1 (demotes; awaited once)
    // → each further cycle evicts again (the file is already valid, eviction
    // is synchronous) and times the L2-hit serve.
    val l2Median = {
      val l2Dir = graft.util.ShmDirs.tempDir("graft_bench_l2_")
      val engL2 = new graft.engine.QueryEngine(eng.spark, latCatalog,
        graft.engine.QueryEngine.QueryLimits(l2CacheDir = Some(l2Dir.toString)))
      val qa = windowSql(1704067260000000000L)
      engL2.sql(qa).collect() // cold: computed + persisted
      val d0 = graft.engine.Telemetry.l2Demotions.sum()
      engL2.evictL1(qa) // async demote of the persisted result
      val deadline = System.currentTimeMillis() + 30000
      while (graft.engine.Telemetry.l2Demotions.sum() <= d0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      val runs = (1 to 7).map { _ =>
        engL2.evictL1(qa) // file already demoted: eviction is synchronous
        time { engL2.sql(qa).collect() }
      }.sorted
      scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(l2Dir.toFile))
      runs(3)
    }

    // ---- segment 3: full query sweep, median-of-3 ---------------------------
    val medians = scala.collection.mutable.LinkedHashMap[String, Double]()
    val detail = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    // optional comma-separated filter (scale probes sweep a curated subset)
    val onlyQueries = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => onlyQueries.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val runs = scala.collection.mutable.ArrayBuffer[Double]()
      var spent = 0.0
      // n ≥ 3 ALWAYS (r11 VERDICT #3: an n=1 "median" is not a median — one
      // GC-debted or I/O-throttled run owned 35% of the r11 headline total).
      // The 25 s spent budget gates only the EXTRA runs beyond 3: if the 3
      // disagree wildly (>3× spread — the hypervisor's I/O throttle bursts),
      // take up to 2 more so one bad sample can't own the median.
      def spreadWild = runs.size >= 3 && runs.max / math.max(runs.min, 1e-9) > 3.0
      // q_join_broadcast pinned at 5 runs (VERDICT r4 #8): its r4 median was
      // inflated by one noisy run; 5 samples keep one burst from owning it
      val minRuns = if (name == "q_join_broadcast") 5 else 3
      while (runs.size < minRuns ||
          (spreadWild && runs.size < 5 && spent < 25.0)) {
        val t = time {
          try fn(spark, sfDir).count()
          catch { case scala.util.control.NonFatal(e) => System.err.println(s"[bench] $name: ${e.getMessage}") }
        }
        runs += t; spent += t
      }
      detail(name) = runs.toSeq
      medians(name) = runs.sorted.apply(runs.size / 2)
    }

    // ---- segment 4: 10× leg — per-query medians for the slow cohort ---------
    // At sf0.1 the host's ~30 ms noise floor swamps plan differences on the
    // heavier queries (r7's two "regressions" were unreadable there). The
    // ≥0.3 s cohort — selected from THIS run's sf0.1 medians, so the set
    // tracks the code — re-runs on the 10× fixture where a plan change moves
    // seconds, not milliseconds. Skipped (empty map) if the tmpfs fixture was
    // evicted; regenerate via graft.ScaleGen + scripts/scale_events.py.
    //
    // r10 protocol (closes r9 VERDICT "Next round #1"): the leg runs in a
    // DEDICATED forked JVM ([[BenchX10]]) — fresh heap, not this process's
    // post-sweep GC debt — with n ≥ 5 runs per query in fixed alphabetical
    // order, median + IQR published, and a host-calibration ingest probe
    // recorded alongside so round-over-round comparison can refuse
    // non-record-class hosts. Falls back to the old inline loop only if the
    // fork cannot start (classpath-less embedding).
    val x10Dir = sys.env.getOrElse("SPARK_GRAFT_X10_DIR", "/dev/shm/graft_scale10")
    val x10Medians = scala.collection.mutable.LinkedHashMap[String, Double]()
    val x10Detail = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val x10N = scala.collection.mutable.LinkedHashMap[String, Int]()
    val x10Iqr = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    var x10CalSps = 0L
    var x10Mode = "skipped"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(x10Dir, "lineitem.parquet")) &&
        !sys.env.contains("SPARK_GRAFT_SKIP_X10")) {
      val cohort = medians.toSeq.filter(_._2 >= 0.3).sortBy(-_._2).take(12)
        .map(_._1).sorted
      System.err.println(s"[bench] 10x leg over ${cohort.size} queries: ${cohort.mkString(",")}")
      val forked =
        try {
          val outFile = java.nio.file.Files.createTempFile("graft_x10_", ".txt")
          val childLog = java.nio.file.Files.createTempFile("graft_x10_", ".log")
          val javaBin = java.nio.file.Paths.get(
            System.getProperty("java.home"), "bin", "java").toString
          val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
            "java.io", "java.net", "java.nio", "java.util",
            "java.util.concurrent", "java.util.concurrent.atomic",
            "sun.nio.ch", "sun.nio.cs", "sun.security.action",
            "sun.util.calendar")
            .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
          val cmd = Seq(javaBin,
            s"-Xmx${sys.env.getOrElse("GRAFT_X10_XMX", "16g")}") ++ opens ++ Seq(
            "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-cp", System.getProperty("java.class.path"),
            "graft.BenchX10", x10Dir, outFile.toString, cohort.mkString(","))
          val pb = new ProcessBuilder(cmd: _*)
          // child stdout MUST NOT reach this process's stdout (the final
          // headline line is the driver contract); stderr passes through
          pb.redirectOutput(childLog.toFile)
          pb.redirectError(ProcessBuilder.Redirect.INHERIT)
          val proc = pb.start()
          val done = proc.waitFor(90, java.util.concurrent.TimeUnit.MINUTES)
          if (!done) { proc.destroyForcibly(); System.err.println("[bench] x10 fork timed out — partial results kept") }
          val childRc = if (done) proc.exitValue() else -1
          // line protocol: cal <sps> | q <name> <median> <n> <q1> <q3> runs...
          val lines = new String(java.nio.file.Files.readAllBytes(outFile),
            java.nio.charset.StandardCharsets.UTF_8).split("\n").map(_.trim)
          lines.foreach { l =>
            val p = l.split("\\s+")
            if (p.length >= 2 && p(0) == "cal") x10CalSps = p(1).toLong
            else if (p.length >= 7 && p(0) == "q") {
              x10Medians(p(1)) = p(2).toDouble
              x10N(p(1)) = p(3).toInt
              x10Iqr(p(1)) = (p(4).toDouble, p(5).toDouble)
              x10Detail(p(1)) = p.drop(6).map(_.toDouble).toSeq
            }
          }
          // a crashed/killed child must not masquerade as a clean record: the
          // mode string carries the truncation so the round diff can refuse it
          if (childRc != 0 || x10Medians.size < cohort.size) {
            System.err.println(s"[bench] x10 child rc=$childRc, " +
              s"${x10Medians.size}/${cohort.size} queries recorded")
            if (x10Medians.nonEmpty) x10Mode = "forked-jvm-partial"
          }
          x10Medians.nonEmpty
        } catch { case scala.util.control.NonFatal(e) =>
          // a throw AFTER some medians were parsed is a mixed fork+inline
          // cohort — label it partial, never inline-fallback (that label is
          // reserved for a fork that produced NOTHING; r11 ADVICE)
          if (x10Medians.nonEmpty) {
            System.err.println(s"[bench] x10 fork threw mid-stream (${e.getMessage}) — " +
              s"keeping ${x10Medians.size} parsed medians, mode=forked-jvm-partial")
            x10Mode = "forked-jvm-partial"
          } else {
            System.err.println(s"[bench] x10 fork failed (${e.getMessage}) — inline fallback")
          }
          x10Medians.nonEmpty
        }
      // a PARTIAL fork keeps its fresh-heap medians (r10 ADVICE: the old
      // else-arm overwrote forked-jvm-partial with inline-fallback, re-ran
      // the WHOLE cohort in this GC-debted JVM and discarded the fork's
      // results); inline fills only the missing queries, and the mode string
      // still says partial so the round diff can see the mixed provenance.
      // inline-fallback is reserved for a fork that produced nothing.
      if (forked && x10Mode != "forked-jvm-partial") x10Mode = "forked-jvm"
      else {
        if (!forked) x10Mode = "inline-fallback"
        cohort.filterNot(x10Medians.contains).foreach { name =>
          val fn = SparkEntry.queries(name)
          val runs = scala.collection.mutable.ArrayBuffer[Double]()
          var spent = 0.0
          def spreadWild = runs.size >= 3 && runs.max / math.max(runs.min, 1e-9) > 3.0
          // n ≥ 3 here too (r11 VERDICT #3) — the 60 s budget gates only extras
          while (runs.size < 3 ||
              (spreadWild && runs.size < 5 && spent < 60.0)) {
            val t = time {
              try fn(spark, x10Dir).count()
              catch { case scala.util.control.NonFatal(e) =>
                System.err.println(s"[bench] x10 $name: ${e.getMessage}") }
            }
            runs += t; spent += t
          }
          val s = runs.sorted
          x10Detail(name) = runs.toSeq
          x10Medians(name) = s(s.size / 2)
          x10N(name) = s.size
          x10Iqr(name) = (s(s.size / 4), s(math.min(s.size - 1, (3 * s.size) / 4)))
        }
      }
    } else System.err.println(s"[bench] 10x leg skipped ($x10Dir missing or disabled)")
    // worst relative IQR width across the cohort — the one-number spread
    // summary the headline carries (medians are only quotable when this is
    // small)
    val x10MaxRelIqr =
      if (x10Medians.isEmpty) 0.0
      else x10Medians.keys.map { k =>
        val (a, b) = x10Iqr(k); (b - a) / math.max(x10Medians(k), 1e-9)
      }.max

    val queriesTotal = medians.values.sum
    val total = queriesTotal + ingestSec + warmMedian + prunedMedian
    val gcTotalMs = gcMs - gc0
    // second probe AFTER the sweep: the record carries the worse of the two,
    // the audit-relevant number (was the device throttled at any point?)
    val diskMbpsEnd = diskProbeMbps()
    val diskMbps = math.min(diskMbpsStart, diskMbpsEnd)

    def f3(v: Double): String = f"$v%.3f"
    // ---- sidecar + stderr: the FULL record ----------------------------------
    val detailJson = {
      val q = detail.map { case (k, runs) =>
        "\"" + k + "\":{\"runs\":[" + runs.map(f3).mkString(",") +
          s"""],"median":${f3(medians(k))}}"""
      }.mkString("{", ",", "}")
      s"""{"sf":"$sfDir","cpus":$cpus,
         |"ingest_runs_sec":[${ingestRuns.map(f3).mkString(",")}],
         |"samples_per_sec":$samplesPerSec,"compression_ratio":$compressionRatio,
         |"warm_runs_sec":[${warmRuns.map(f3).mkString(",")}],
         |"warm_persisted_runs_sec":[${warmPersistedRuns.map(f3).mkString(",")}],
         |"disk_mbps_start":$diskMbpsStart,"disk_mbps_end":$diskMbpsEnd,
         |"pruned_runs_sec":[${prunedRuns.map(f3).mkString(",")}],
         |"l2_query_median_sec":${f3(l2Median)},
         |"gc_time_ms":$gcTotalMs,"peak_heap_mb":$peakHeapMb,
         |"queries_total_sec":${f3(queriesTotal)},"n_queries":${medians.size},
         |"x10_dir":"$x10Dir","x10_mode":"$x10Mode","x10_cal_sps":$x10CalSps,
         |"x10_max_rel_iqr":${f3(x10MaxRelIqr)},
         |"x10_queries":${x10Detail.map { case (k, runs) =>
           val (q1, q3) = x10Iqr(k)
           "\"" + k + "\":{\"runs\":[" + runs.map(f3).mkString(",") +
             s"""],"median":${f3(x10Medians(k))},"n":${x10N(k)},""" +
             s""""iqr":[${f3(q1)},${f3(q3)}]}"""
         }.mkString("{", ",", "}")},
         |"queries":$q}""".stripMargin.replace("\n", "")
    }
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (detailJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case scala.util.control.NonFatal(e) => System.err.println(s"[bench] sidecar write failed: $e") }
    System.err.println(detailJson)

    // ---- final stdout line: SHORT headline (driver tail-captures 2000 chars) --
    val headlineSet = Seq("q_agg_groupby", "q_join_broadcast", "q_window_running",
      "q_engine_prune_sql", "q_promql_range_rate", "q_doc_minhash_neardup",
      "q_dedup_incremental", "q_emb_ivf_indexed")
    val hq = headlineSet.flatMap(k => medians.get(k).map(v => "\"" + k + "\":" + f3(v)))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$hq,""" +
      s""""queries_total_sec":${f3(queriesTotal)},"n_queries":${medians.size},""" +
      s""""samples_per_sec":$samplesPerSec,"ingest_sec":${f3(ingestSec)},""" +
      s""""compression_ratio":$compressionRatio,""" +
      s""""warm_query_median":${f3(warmMedian)},"warm_query_min":${f3(warmRuns.head)},""" +
      s""""warm_local":${f3(warmMedian)},"warm_persisted":${f3(warmPersistedMedian)},""" +
      s""""warm_rows":${f3(warmRowsMedian)},""" +
      s""""l2_query_median":${f3(l2Median)},""" +
      s""""disk_mbps":$diskMbps,""" +
      s""""pruned_query_median":${f3(prunedMedian)},"pruned_query_min":${f3(prunedRuns.head)},""" +
      s""""gc_time_ms":$gcTotalMs,"peak_heap_mb":$peakHeapMb,""" +
      // 10× leg: slow-cohort medians, diffable round-over-round (≤12 entries
      // at 2 decimals keeps the headline under the driver's 2000-char tail);
      // per-query runs/n/IQR live in BENCH_DETAIL.json — the headline carries
      // the protocol line (mode, run floor, host calibration, worst spread)
      s""""x10":${x10Medians.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
        .mkString("{", ",", "}")},""" +
      s""""x10_protocol":{"mode":"$x10Mode","n_min":${if (x10N.isEmpty) 0 else x10N.values.min},""" +
      s""""cal_sps":$x10CalSps,"max_rel_iqr":${f3(x10MaxRelIqr)}},""" +
      s""""detail":"BENCH_DETAIL.json","sf":"$sfDir"}""")
    spark.stop()
    // tmpfs hygiene: the per-run warehouses are ~100 MB each and /dev/shm is
    // shared with the scale fixtures — leaked dirs from 10 bench runs were
    // found squatting 1 GB of the fixture budget (r9)
    Seq(warehouse, latWarehouse).foreach(d =>
      scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)))
  }
}
