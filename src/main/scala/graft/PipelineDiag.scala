package graft

import org.apache.spark.sql.functions._

/** Throwaway probe: decompose q_pipeline_e2e cost at a scaled SF. */
object PipelineDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", "/dev/shm/graft_bench_shuffle")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t = System.nanoTime(); f
      println(f"[diag] $name: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    import graft.text.TextFunctions
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("raw count") { docs.count() }
    var src: org.apache.spark.sql.DataFrame = null
    time("nfc + localCheckpoint") {
      src = docs.select(col("doc_id"),
        graft.sources.DocumentSources.nfcNormalize(col("text")).as("text"))
        .localCheckpoint(true)
    }
    val flagged = src.select(
      col("doc_id") +: col("text") +: TextFunctions.gopherFlags(col("text")): _*)
    time("gopher flags count") { flagged.count() }
    val kept = flagged.filter(col("keep")).select("doc_id", "text")
    time("gopher filter count") { kept.count() }
    val fp = kept.withColumn("__fp", TextFunctions.fingerprint(col("text")))
    val keepers = fp.groupBy("__fp").agg(min("doc_id").as("__keeper"))
    val survivors = fp.join(keepers, "__fp")
      .filter(col("doc_id") === col("__keeper"))
      .select("doc_id", "text")
    time("dedup survivors count") { survivors.count() }
    time("packSequences count") {
      graft.pipeline.Pipeline.packSequences(survivors, "doc_id", "text", seqTokens = 512).count()
    }
    time("full query (as benched)") {
      val s2 = docs.select(col("doc_id"),
        graft.sources.DocumentSources.nfcNormalize(col("text")).as("text"))
        .localCheckpoint(true)
      val f2 = s2.select(
        col("doc_id") +: col("text") +: TextFunctions.gopherFlags(col("text")): _*)
      val k2 = f2.filter(col("keep")).select("doc_id", "text")
      val p2 = k2.withColumn("__fp", TextFunctions.fingerprint(col("text")))
      val kp2 = p2.groupBy("__fp").agg(min("doc_id").as("__keeper"))
      val sv2 = p2.join(kp2, "__fp").filter(col("doc_id") === col("__keeper"))
        .select("doc_id", "text")
      graft.pipeline.Pipeline.packSequences(sv2, "doc_id", "text", seqTokens = 512)
        .select("doc_id", "n_tok", "start_tok", "seq_first", "seq_last")
        .orderBy("doc_id").count()
    }
    spark.stop()
  }
}
