package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: decompose ingest-write and warm-query cost. */
object BenchMicro2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", "/dev/shm/graft_bench_shuffle")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }

    val warehouse = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_probe_")
    val catalog = new graft.catalog.ChunkCatalog(warehouse)
    val df = graft.fixtures.DataGenerator.generate(spark,
      metrics = 10, hosts = 5, regions = 2,
      samplesPerSecond = 100, durationSeconds = 400, partitions = cpus.toInt * 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    println(s"[probe] materialize: ${time { df.count() }}")

    // decomposed write = what ChunkWriter.write does
    import org.apache.spark.sql.functions._
    val partCols = Seq("year", "month", "day", "hour")
    (1 to 3).foreach { run =>
      val batchDir = warehouse.resolve(s"default/data/batch=probe$run")
      val stamped = df
        .withColumn("year", year(col("timestamp")))
        .withColumn("month", month(col("timestamp")))
        .withColumn("day", dayofmonth(col("timestamp")))
        .withColumn("hour", hour(col("timestamp")))
      var metas: Seq[graft.catalog.ChunkMeta] = Nil
      val t1 = time { metas = graft.ingest.ChunkStats.computePartitionedFromDf(
        stamped, batchDir.toString, partCols) }
      val minTs = metas.map(_.minTimestampNs).min
      val maxTs = metas.map(_.maxTimestampNs).max
      val par = cpus.toInt
      val sliceNs = math.max(1L, (maxTs - minTs) / (par * 16L) + 1L)
      val t2 = time {
        stamped
          .withColumn("__slice", expr(s"timestamp_ns div $sliceNs"))
          .repartition((partCols :+ "__slice").map(col): _*)
          .sortWithinPartitions((partCols :+ "timestamp_ns").map(col): _*)
          .drop("__slice")
          .write
          .partitionBy(partCols: _*)
          .option("compression", "zstd")
          .parquet(batchDir.toString)
      }
      val t3 = time {
        metas.foreach(m => graft.ingest.ChunkStats.dirSize(java.nio.file.Paths.get(m.path)))
      }
      println(f"[probe] run $run: statsPass=$t1%.2f writePass=$t2%.2f dirSize=$t3%.2f")
    }

    // warm path decomposition over the real writer output
    val writer = new graft.ingest.ChunkWriter(catalog)
    println(s"[probe] writer.write: ${time { writer.write(df) }}")
    df.unpersist(blocking = false)
    val eng = new graft.engine.QueryEngine(spark, catalog)
    eng.resultCacheEnabled = true
    val q = """SELECT metric_name, (timestamp_ns DIV 10000000000) * 10000000000 AS b,
              | AVG(value_f64) AS v FROM metrics
              | WHERE timestamp_ns >= 1704067210000000000 AND timestamp_ns < 1704067215000000000
              | GROUP BY metric_name, b""".stripMargin
    println(s"[probe] first sql+count: ${time { eng.sql(q).count() }}")
    (1 to 5).foreach { i =>
      var dfq: org.apache.spark.sql.DataFrame = null
      val tSql = time { dfq = eng.sql(q) }
      val tCol = time { dfq.collect() }
      val tCount = time { dfq.count() }
      println(f"[probe] warm $i: sql=${tSql * 1000}%.1f ms collect=${tCol * 1000}%.1f ms count=${tCount * 1000}%.1f ms")
    }
    // fresh-window (pruned/cold) decomposition: plan+codegen vs execute
    (1 to 6).foreach { i =>
      val start = 1704067215000000000L + i * 5000000000L
      val qq = s"""SELECT metric_name, (timestamp_ns DIV 10000000000) * 10000000000 AS b,
                  | AVG(value_f64) AS v FROM metrics
                  | WHERE timestamp_ns >= $start AND timestamp_ns < ${start + 5000000000L}
                  | GROUP BY metric_name, b""".stripMargin
      var dfq: org.apache.spark.sql.DataFrame = null
      val tSql = time { dfq = eng.sql(qq) }
      val tPlan = time { dfq.queryExecution.executedPlan }
      val tCol = time { dfq.collect() }
      println(f"[probe] pruned $i: sql=${tSql * 1000}%.1f ms physplan=${tPlan * 1000}%.1f ms collect=${tCol * 1000}%.1f ms")
    }
    // same fresh-window loop with AQE off: how much of the latency is AQE?
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    (11 to 16).foreach { i =>
      val start = 1704067215000000000L + i * 5000000000L
      val qq = s"""SELECT metric_name, (timestamp_ns DIV 10000000000) * 10000000000 AS b,
                  | AVG(value_f64) AS v FROM metrics
                  | WHERE timestamp_ns >= $start AND timestamp_ns < ${start + 5000000000L}
                  | GROUP BY metric_name, b""".stripMargin
      var dfq: org.apache.spark.sql.DataFrame = null
      val tSql = time { dfq = eng.sql(qq) }
      val tCol = time { dfq.collect() }
      println(f"[probe] prunedNoAqe $i: sql=${tSql * 1000}%.1f ms collect=${tCol * 1000}%.1f ms")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // serving profile: whole-stage codegen OFF (vectorized parquet read stays;
    // only the janino compile of the agg pipeline is skipped)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    (21 to 26).foreach { i =>
      val start = 1704067215000000000L + i * 5000000000L
      val qq = s"""SELECT metric_name, (timestamp_ns DIV 10000000000) * 10000000000 AS b,
                  | AVG(value_f64) AS v FROM metrics
                  | WHERE timestamp_ns >= $start AND timestamp_ns < ${start + 5000000000L}
                  | GROUP BY metric_name, b""".stripMargin
      var dfq: org.apache.spark.sql.DataFrame = null
      val tSql = time { dfq = eng.sql(qq) }
      val tCol = time { dfq.collect() }
      println(f"[probe] prunedNoWscg $i: sql=${tSql * 1000}%.1f ms collect=${tCol * 1000}%.1f ms")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // pure LocalRelation count baseline: the floor any cached-result serve can hit
    locally {
      import spark.implicits._
      val rows = (1 to 500).map(i => (i.toLong, s"m$i", i * 1.0))
      val local = spark.createDataFrame(rows).toDF("a", "b", "c")
      (1 to 5).foreach { i =>
        val t = time { local.count() }
        println(f"[probe] localrel count $i: ${t * 1000}%.1f ms")
      }
      // raw empty-job floor: scheduler+task overhead with zero work
      (1 to 3).foreach { i =>
        val t = time { spark.sparkContext.parallelize(1 to 32, 32).count() }
        println(f"[probe] raw 32-task job $i: ${t * 1000}%.1f ms")
      }
    }
    // quick disk probe to flag host I/O noise during THIS run
    locally {
      val p = java.nio.file.Files.createTempFile("ioprobe", ".bin")
      val buf = new Array[Byte](1 << 20)
      val t = time {
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.WRITE)
        (1 to 128).foreach(_ => ch.write(java.nio.ByteBuffer.wrap(buf)))
        ch.force(true); ch.close()
      }
      java.nio.file.Files.delete(p)
      println(f"[probe] disk 128MB fsync: ${t}%.2f s (${128 / t}%.0f MB/s)")
    }
    spark.stop()
  }
}
