package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.MetricSchema
import graft.catalog.{ChunkCatalog, ChunkMeta, ColumnStats}
import java.nio.file.{Files, Path, Paths}
import java.util.UUID

/** Ingest-side staging type — the union of what OTLP / Prometheus remote-write points
  * carry before explosion to label columns (reference MetricDataPoint,
  * src/api/ingest/otlp.rs:24-41). Timestamps are raw nanoseconds.
  */
final case class MetricPoint(
    timestampNs: Long,
    metricName: String,
    value: Double,
    labels: Map[String, String] = Map.empty)

/** A Prometheus-style sample where value routing between value_f64/value_i64/value_u64
  * has already been decided (reference convert_prom_to_arrow,
  * src/api/ingest/prometheus.rs:356-485).
  */
final case class RoutedPoint(
    timestampNs: Long,
    metricName: String,
    labels: Map[String, String],
    valueF64: Option[Double],
    valueI64: Option[Long],
    valueU64: Option[Long])

object Converters {

  /** OTLP AnyValue → String coercion (reference any_value_to_string,
    * src/api/ingest/otlp.rs:223-235): string/bool/int/double pass through; bytes are
    * base64; arrays/kvlists render as their debug-ish JSON.
    */
  def anyValueToString(v: Any): String = v match {
    case null => ""
    case s: String => s
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double => d.toString
    case f: Float => f.toString
    case bytes: Array[Byte] => java.util.Base64.getEncoder.encodeToString(bytes)
    case arr: Seq[_] => arr.map(anyValueToString).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => s"$k=${anyValueToString(x)}" }.mkString("{", ",", "}")
    case other => other.toString
  }

  /** Prometheus value-type routing (reference src/api/ingest/prometheus.rs:409-440):
    * integral non-negative & lossless → value_u64; integral negative → value_i64;
    * everything else (fractional, NaN, ±Inf) → value_f64.
    */
  def routeValue(v: Double): (Option[Double], Option[Long], Option[Long]) =
    if (v.isNaN || v.isInfinite || v != Math.floor(v) || Math.abs(v) >= 9.007199254740992e15)
      (Some(v), None, None)
    else if (v >= 0) (None, None, Some(v.toLong))
    else (None, Some(v.toLong), None)

  /** ms → ns like the remote-write path (prometheus.rs:452); `__name__` label becomes
    * metric_name; label columns sorted for schema determinism (prometheus.rs:382-396).
    */
  def promSample(tsMs: Long, labels: Map[String, String], value: Double): RoutedPoint = {
    val name = labels.getOrElse("__name__", "")
    val (f, i, u) = routeValue(value)
    RoutedPoint(tsMs * 1000000L, name, labels - "__name__", f, i, u)
  }

  /** OTLP Histogram/ExponentialHistogram/Summary points collapse to their `sum`
    * (falling back to `count` when sum is absent) — reference otlp.rs:133-173.
    */
  def histogramPoint(timestampNs: Long, metricName: String, sum: Option[Double],
                     count: Long, labels: Map[String, String]): MetricPoint =
    MetricPoint(timestampNs, metricName, sum.getOrElse(count.toDouble), labels)

  /** Union of label keys across a batch → one nullable string column per key, sorted
    * (reference data_points_to_arrow, otlp.rs:249-295 + prometheus.rs:382-396).
    * OTLP-shaped points: the single f64 value lands in value_f64.
    */
  def pointsToDf(spark: SparkSession, points: Seq[MetricPoint]): DataFrame = {
    val routed = points.map(p =>
      RoutedPoint(p.timestampNs, p.metricName, p.labels, Some(p.value), None, None))
    routedToDf(spark, routed)
  }

  def routedToDf(spark: SparkSession, points: Seq[RoutedPoint]): DataFrame = {
    val labelKeys = points.flatMap(_.labels.keys).distinct.sorted
    val schema = MetricSchema.build(labelKeys)
    val rows = points.map { p =>
      Row.fromSeq(
        Seq(java.time.Instant.ofEpochSecond(
              Math.floorDiv(p.timestampNs, 1000000000L),
              Math.floorMod(p.timestampNs, 1000000000L) / 1000L * 1000L),
            p.timestampNs, p.metricName) ++
        labelKeys.map(k => p.labels.get(k).orNull) ++
        Seq(p.valueF64.map(Double.box).orNull,
            p.valueI64.map(Long.box).orNull,
            p.valueU64.map(Long.box).orNull))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }
}

/** Writes a metrics DataFrame as sorted, ZSTD, hour-Hive-partitioned Parquet chunks and
  * registers them (with per-column zone maps) in the catalog — the Spark equivalent of
  * flush_batches → ParquetWriter → atomic_register_chunk (reference
  * src/ingester/mod.rs:632-714, src/ingester/parquet_writer.rs:16-89).
  *
  * One flush = ONE partitioned write job (every hour-chunk written in parallel, rows
  * time-sorted within each file) + ONE distributed stats agg grouped by hour (no
  * per-hour driver loop, no collect of data rows) — this is what keeps a 100 TB
  * backfill a two-job pipeline instead of thousands of sequential jobs.
  *
  * Layout divergence from the reference: partition values are unpadded ints
  * (`year=2024/month=1/...`) — Hive-style either way; Spark partition-type inference
  * round-trips ints losslessly where zero-padded strings would not.
  */
final class ChunkWriter(catalog: ChunkCatalog, tenant: String = "default") {

  private val partCols = Seq("year", "month", "day", "hour")

  def write(df: DataFrame): Seq[ChunkMeta] = {
    val spark = df.sparkSession
    val batchDir = catalog.root.resolve(s"$tenant/data/batch=${UUID.randomUUID()}")
    val stamped = df
      .withColumn("year", year(col("timestamp")))
      .withColumn("month", month(col("timestamp")))
      .withColumn("day", dayofmonth(col("timestamp")))
      .withColumn("hour", hour(col("timestamp")))
    // Range-partition on (hour cols, timestamp): a batch confined to one hour still
    // fans out across all shuffle partitions (disjoint, sorted time slices → several
    // sorted files per hour chunk) instead of serializing one hour = one task.
    stamped
      .repartitionByRange((partCols :+ MetricSchema.TimestampNsCol).map(col): _*)
      .sortWithinPartitions((partCols :+ MetricSchema.TimestampNsCol).map(col): _*)
      .write
      .partitionBy(partCols: _*)
      .option("compression", "zstd")
      .parquet(batchDir.toString)

    // Stats come from ONE agg over the in-memory batch (deterministic input), not a
    // re-read of the freshly written ZSTD files — saves a full decompress pass per
    // flush. File sizes are taken from the written tree.
    val metas = ChunkStats.computePartitionedFromDf(stamped, batchDir.toString, partCols)
    catalog.registerAll(metas)
    metas
  }
}

object ChunkStats {

  private def statFields(schema: StructType, exclude: Set[String]): Array[StructField] =
    schema.fields.filter { f =>
      !exclude.contains(f.name) &&
        (f.dataType == StringType || f.dataType == DoubleType || f.dataType == LongType)
    }

  private def statAggs(fields: Array[StructField]): Seq[org.apache.spark.sql.Column] =
    Seq(count(lit(1)).as("__rows")) ++ fields.flatMap { f =>
      Seq(min(col(f.name)).as(s"__min_${f.name}"),
          max(col(f.name)).as(s"__max_${f.name}"),
          sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"__nulls_${f.name}"))
    }

  private def rowToStats(r: Row, fields: Array[StructField]): (Long, Map[String, ColumnStats]) = {
    val rows = r.getAs[Long]("__rows")
    val stats = fields.flatMap { f =>
      val mn = r.getAs[Any](s"__min_${f.name}")
      val mx = r.getAs[Any](s"__max_${f.name}")
      val nulls = r.getAs[Long](s"__nulls_${f.name}") > 0
      (mn, mx) match {
        case (null, _) | (_, null) => None
        case (a: String, b: String) => Some(f.name -> ColumnStats.ofString(a, b, nulls))
        case (a: Long, b: Long) => Some(f.name -> ColumnStats.ofLong(a, b, nulls))
        case (a: Double, b: Double) => Some(f.name -> ColumnStats.ofDouble(a, b, nulls))
        case _ => None
      }
    }.toMap
    (rows, stats)
  }

  private def toMeta(path: String, rows: Long, stats: Map[String, ColumnStats],
                     level: Int): ChunkMeta = {
    val tsStats = stats.getOrElse(MetricSchema.TimestampNsCol, ColumnStats.ofLong(0L, 0L))
    ChunkMeta(
      path = path,
      minTimestampNs = tsStats.minLong.getOrElse(0L),
      maxTimestampNs = tsStats.maxLong.getOrElse(0L),
      rowCount = rows,
      sizeBytes = dirSize(Paths.get(path)),
      level = level,
      columnStats = stats)
  }

  /** One agg pass over a written chunk: min/max timestamp_ns, row count, per-label and
    * metric_name min/max + null flags (reference registers these as column_stats,
    * src/metadata/s3.rs:84-127, computed at flush src/ingester/mod.rs:632-714).
    */
  def compute(spark: SparkSession, path: String, schema: StructType): ChunkMeta =
    computeFromDf(spark.read.parquet(path), path)

  /** Stats agg over an arbitrary (deterministic) DataFrame, attributed to `path`. */
  def computeFromDf(df: org.apache.spark.sql.DataFrame, path: String): ChunkMeta = {
    val fields = statFields(df.schema, Set.empty)
    val aggs = statAggs(fields)
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val (rows, stats) = rowToStats(r, fields)
    toMeta(path, rows, stats, level = 0)
  }

  /** Grouped variant: ONE distributed agg over a whole hour-partitioned batch dir —
    * one output row (and one ChunkMeta) per hour partition.
    */
  def computePartitioned(spark: SparkSession, batchDir: String,
                         partCols: Seq[String]): Seq[ChunkMeta] =
    computePartitionedFromDf(spark.read.parquet(batchDir), batchDir, partCols)

  /** Same, but over an arbitrary (deterministic) DataFrame carrying the partition
    * columns — lets the writer agg the in-memory batch instead of re-reading what
    * it just compressed.
    */
  def computePartitionedFromDf(df: org.apache.spark.sql.DataFrame, batchDir: String,
                               partCols: Seq[String]): Seq[ChunkMeta] = {
    val fields = statFields(df.schema, partCols.toSet)
    val aggs = statAggs(fields)
    val grouped = df.groupBy(partCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    grouped.toSeq.map { r =>
      val path = batchDir + "/" + partCols.map(c => s"$c=${r.getAs[Any](c)}").mkString("/")
      val (rows, stats) = rowToStats(r, fields)
      toMeta(path, rows, stats, level = 0)
    }
  }

  def dirSize(p: Path): Long = {
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }
  }
}
