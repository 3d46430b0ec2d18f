package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.MetricSources

class SourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("toMetrics: timestamp column → ns + µs carriers, labels, f64 value") {
    val df = Seq(
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1704067200L, 123456000L)),
        "cpu", 0.5, "h1"))
      .toDF("t", "name", "v", "host")
    val m = MetricSources.toMetrics(df, col("t"), col("name"), col("v"),
      labels = Map("host" -> col("host")))
    val r = m.collect()(0)
    assert(r.getAs[Long]("timestamp_ns") == 1704067200123456000L)
    assert(r.getAs[String]("metric_name") == "cpu")
    assert(r.getAs[String]("host") == "h1")
    assert(r.getAs[Double]("value_f64") == 0.5)
    assert(r.isNullAt(r.fieldIndex("value_u64")))
    assert(m.schema.fieldNames.toSeq == Seq("timestamp", "timestamp_ns", "metric_name",
      "host", "value_f64", "value_i64", "value_u64"))
  }

  test("toMetrics: raw ns long timestamps pass through exactly (no double div)") {
    // ns value with sub-µs precision beyond 2^53 — double arithmetic would corrupt it
    val ns = 1704067200123456789L
    val df = Seq((ns, "m", 5.0)).toDF("t", "name", "v")
    val m = MetricSources.toMetrics(df, col("t"), col("name"), col("v"), routeValues = true)
    val r = m.collect()(0)
    assert(r.getAs[Long]("timestamp_ns") == ns)
    // µs carrier floor-truncates
    assert(r.getAs[java.sql.Timestamp]("timestamp").toInstant.getNano == 123456000)
    // integral ≥0 routes to u64
    assert(r.getAs[Long]("value_u64") == 5L)
    assert(r.isNullAt(r.fieldIndex("value_f64")))
  }

  test("toMetrics value routing matches the remote-write rules") {
    val df = Seq((1L, "m", -3.0), (2L, "m", 0.5), (3L, "m", 7.0))
      .toDF("t", "name", "v")
    val rows = MetricSources.toMetrics(df, col("t"), col("name"), col("v"),
      routeValues = true).orderBy("timestamp_ns").collect()
    assert(rows(0).getAs[Long]("value_i64") == -3L)
    assert(rows(1).getAs[Double]("value_f64") == 0.5)
    assert(rows(2).getAs[Long]("value_u64") == 7L)
  }

  test("fromCsv end-to-end into the engine") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src_")
    val csv = dir.resolve("in.csv")
    java.nio.file.Files.writeString(csv,
      "t,name,v,host\n1704067200,cpu,1.5,a\n1704067260,cpu,2.5,b\n")
    val raw = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(csv.toString)
    val m = MetricSources.toMetrics(raw,
      timestamp_seconds(col("t")), col("name"), col("v"),
      labels = Map("host" -> col("host")))
    val cat = new graft.catalog.ChunkCatalog(dir.resolve("wh"))
    new graft.ingest.ChunkWriter(cat).write(m)
    val eng = new graft.engine.QueryEngine(spark, cat)
    val got = eng.sql(
      """SELECT metric_name, COUNT(*) AS cnt, SUM(value_f64) AS s FROM metrics
        |WHERE timestamp_ns >= 1704067200000000000 AND timestamp_ns <= 1704067260000000000
        |GROUP BY metric_name""".stripMargin).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 2L && got(0).getDouble(2) == 4.0)
  }
}
