package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed port of the reference's load generator
  * (src/bin/test_data_generator.rs:26-60): `metrics × hosts × regions` series with
  * sine / pseudo-random-walk / monotonic-counter value patterns.
  *
  * Fully distributed: one `spark.range` over sample indices, all columns derived by
  * codegen'd expressions — generating 10^9 samples is a single map-only job, no
  * driver-side loops (100 TB posture).
  */
object DataGenerator {

  def generate(spark: SparkSession,
               metrics: Int = 10,
               hosts: Int = 5,
               regions: Int = 3,
               samplesPerSecond: Int = 100,
               durationSeconds: Int = 60,
               startNs: Long = 1704067200L * 1000000000L,
               partitions: Int = 32): DataFrame = {
    val totalSamples = durationSeconds.toLong * samplesPerSecond
    val series = metrics.toLong * hosts * regions
    val stepNs = 1000000000L / samplesPerSecond

    spark.range(0, totalSamples * series, 1, partitions)
      .withColumn("sample_i", col("id") / series) // which sample tick
      .withColumn("series_i", col("id") % series)
      .withColumn("metric_i", (col("series_i") % metrics).cast("int"))
      .withColumn("host_i", ((col("series_i") / metrics) % hosts).cast("int"))
      .withColumn("region_i", ((col("series_i") / (metrics * hosts)) % regions).cast("int"))
      .withColumn("timestamp_ns", lit(startNs) + col("sample_i").cast("long") * stepNs)
      .withColumn("timestamp", timestamp_micros(expr("timestamp_ns div 1000")))
      .withColumn("metric_name", concat(lit("metric_"), col("metric_i")))
      .withColumn("host", concat(lit("host-"), col("host_i")))
      .withColumn("region", concat(lit("region-"), col("region_i")))
      // pattern by metric index: sine wave / pseudo-random walk (hash noise around a
      // slow sine drift — stateless stand-in for the reference's walk) / counter
      .withColumn("value_f64",
        when(col("metric_i") % 3 === 0,
          lit(50.0) + lit(50.0) * sin(col("sample_i") * lit(2 * math.Pi / 300.0)))
        .when(col("metric_i") % 3 === 1,
          lit(50.0) + lit(10.0) * sin(col("sample_i") * lit(2 * math.Pi / 3000.0)) +
            (pmod(xxhash64(col("id")), lit(1000)).cast("double") - 500.0) / 100.0)
        .otherwise(col("sample_i").cast("double") * 0.1 + col("series_i").cast("double")))
      .withColumn("value_i64", lit(null).cast("long"))
      .withColumn("value_u64", lit(null).cast("long"))
      .select("timestamp", "timestamp_ns", "metric_name", "host", "region",
        "value_f64", "value_i64", "value_u64")
  }
}
