package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc micro profiler for operator sub-pipelines (manual use). */
object BenchMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Any): Unit = {
      val t = System.nanoTime()
      f
      println(f"[micro] $name: ${(System.nanoTime() - t) / 1e9}%.3f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    val withShingles = docs.select(col("doc_id"), col("text"))
      .withColumn("__sh", graft.dedup.Dedup.shingles(col("text"), 3))
      .withColumn("__sig", graft.dedup.Dedup.minhashSignature(col("__sh"), 32))
    time("shingles+sig count")(withShingles.count())
    val cached = withShingles.cache()
    time("cache materialize")(cached.count())
    val buckets = graft.dedup.Dedup.lshBuckets(cached, "doc_id", "__sig", 16, 2)
    time("buckets count")(buckets.count())
    val pruned = buckets
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "band_hash")))
      .filter(col("__n") <= 1000)
    val l = pruned.select(col("band"), col("band_hash"), col("doc_id").as("id_a"))
    val r = pruned.select(col("band"), col("band_hash"), col("doc_id").as("id_b"))
    val candidates = l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    time("candidates count")(candidates.count())
    time("full minhash pipeline")(
      graft.dedup.Dedup.minhashNearDupPairs(docs, threshold = 0.2,
        numHashes = 32, bands = 16).count())
    cached.unpersist()

    time("full minhash again (warm)")(
      graft.dedup.Dedup.minhashNearDupPairs(docs, threshold = 0.2,
        numHashes = 32, bands = 16).count())
    spark.stop()
  }
}
