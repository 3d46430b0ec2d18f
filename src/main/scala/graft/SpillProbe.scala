package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

/** Beyond-memory evidence drive: run a HEAVY subset of the query surface on a
  * scale fixture under deliberately constrained executor heaps
  * (local-cluster with ~1 GB executors), so aggregations/sorts/joins actually
  * SPILL — and record (a) per-query memory/disk spill bytes from the task
  * metrics, (b) wall time, (c) the parquet outputs in Verify's layout so the
  * standard DuckDB scale checker proves the spilled runs hash-green.
  *
  * The sf0.1..100× records all fit comfortably in the sandbox's 128 GiB: this
  * probe is the missing memory dimension of the 100 TB posture — the claim is
  * not "fits in RAM" but "gracefully exceeds it".
  *
  * Usage:
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   sbt "runMain graft.SpillProbe <sfDir> <outDir> [q1,q2,...]"
  * Env: SPARK_GRAFT_MASTER (default local-cluster[4,4,1300]),
  *      SPARK_GRAFT_EXECUTOR_MEM (default 1200m),
  *      SPARK_GRAFT_SHUFFLE_PARTS (default 16 — few, fat partitions: the
  *      point is per-task working sets larger than the executor's share).
  */
object SpillProbe {

  private val defaultQueries = Seq(
    "q_doc_minhash_index_probe", // materialized LSH index build + probe
    "q_doc_minhash_neardup",     // one-shot shingle explosion + band join
    "q_doc_passage_remove",      // passage-level dedup transform
    "q_topk_group",              // naive window sort (map-side sort of the fact table)
    "q_sessionize",              // per-key window + running sum
    "q_dedup_incremental_bloom") // bloom build over the corpus

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val queries =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else defaultQueries
    require(sys.env.contains("SPARK_HOME") && sys.env.contains("SPARK_SCALA_VERSION"),
      "local-cluster mode needs SPARK_HOME=/opt/spark and SPARK_SCALA_VERSION=2.13")

    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[4,4,1300]")
    val execMem = sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "1200m")
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "16")
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-spill-probe")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executor.memory", execMem)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val memSpilled = new AtomicLong(0L)
    val diskSpilled = new AtomicLong(0L)
    val shuffleWritten = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
          shuffleWritten.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    val results = queries.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      val (m0, d0, s0) = (memSpilled.get(), diskSpilled.get(), shuffleWritten.get())
      val t0 = System.nanoTime()
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the last stage-completed events drain
      val r = (name, sec, memSpilled.get() - m0, diskSpilled.get() - d0,
        shuffleWritten.get() - s0)
      System.err.println(f"[spill] $name%-28s ${sec}%8.1f s  mem=${r._3 >> 20} MB  disk=${r._4 >> 20} MB")
      r
    }

    // oracle SQL for the checker (full map — the checker walks outDir entries)
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))

    val perQuery = results.map { case (n, sec, mem, disk, sw) =>
      s""""$n":{"sec":${math.round(sec * 10) / 10.0},"mem_spilled_mb":${mem >> 20},""" +
        s""""disk_spilled_mb":${disk >> 20},"shuffle_write_mb":${sw >> 20}}"""
    }.mkString(",")
    val json =
      s"""{"metric":"spill_probe","sf_dir":"$sfDir","master":"$master",""" +
      s""""executor_mem":"$execMem","shuffle_partitions":$shuffleParts,""" +
      s""""total_mem_spilled_mb":${memSpilled.get() >> 20},""" +
      s""""total_disk_spilled_mb":${diskSpilled.get() >> 20},""" +
      s""""queries":{$perQuery}}"""
    Files.write(Paths.get("SPILL_r07.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
