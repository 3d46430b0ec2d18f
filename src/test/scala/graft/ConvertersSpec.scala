package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Converters

/** Value routing + AnyValue coercion fixtures (FIXTURES.md F3/F4; reference
  * src/api/ingest/prometheus.rs:409-440, otlp.rs:223-235).
  */
class ConvertersSpec extends AnyFunSuite {

  test("prom value routing: u64 / i64 / f64") {
    assert(Converters.routeValue(5.0) == (None, None, Some(5L)))
    assert(Converters.routeValue(0.0) == (None, None, Some(0L)))
    assert(Converters.routeValue(-3.0) == (None, Some(-3L), None))
    assert(Converters.routeValue(0.5) == (Some(0.5), None, None))
    val (nan, _, _) = Converters.routeValue(Double.NaN)
    assert(nan.exists(_.isNaN))
    assert(Converters.routeValue(Double.PositiveInfinity)._1.contains(Double.PositiveInfinity))
    // beyond 2^53: kept as f64 to avoid silent precision loss
    assert(Converters.routeValue(1.5e16)._1.contains(1.5e16))
  }

  test("promSample: ms→ns, __name__ routing, label stripping") {
    val p = Converters.promSample(1000L, Map("__name__" -> "cpu", "host" -> "a"), 5.0)
    assert(p.timestampNs == 1000000000L)
    assert(p.metricName == "cpu")
    assert(p.labels == Map("host" -> "a"))
    assert(p.valueU64.contains(5L) && p.valueF64.isEmpty)
  }

  test("anyValueToString coercion") {
    assert(Converters.anyValueToString("x") == "x")
    assert(Converters.anyValueToString(true) == "true")
    assert(Converters.anyValueToString(42L) == "42")
    assert(Converters.anyValueToString(Array[Byte](1, 2)) ==
      java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2)))
    assert(Converters.anyValueToString(Seq(1, 2)) == "[1,2]")
    assert(Converters.anyValueToString(null) == "")
  }

  test("routedToDf: union label keys sorted, nullable; ns preserved") {
    val spark = SparkTestBase.spark
    val df = Converters.routedToDf(spark, Seq(
      Converters.promSample(1500L, Map("__name__" -> "m1", "host" -> "h1"), 1.5),
      Converters.promSample(2500L, Map("__name__" -> "m2", "zone" -> "z1"), 2.0)))
    assert(df.schema.fieldNames.toSeq ==
      Seq("timestamp", "timestamp_ns", "metric_name", "host", "zone",
        "value_f64", "value_i64", "value_u64"))
    val rows = df.orderBy("timestamp_ns").collect()
    assert(rows(0).getAs[Long]("timestamp_ns") == 1500000000L)
    assert(rows(0).getAs[String]("host") == "h1")
    assert(rows(0).getAs[Any]("zone") == null)
    assert(rows(0).getAs[Double]("value_f64") == 1.5)
    assert(rows(1).getAs[Long]("value_u64") == 2L)
    // timestamp column truncates to µs faithfully
    assert(rows(0).getAs[java.sql.Timestamp]("timestamp").getTime == 1500L)
  }
}
