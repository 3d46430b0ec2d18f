package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Operators

class OperatorsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("topKPerGroup equals the naive single-window formulation") {
    val df = (1 to 5000).map(i => (s"g${i % 3}", i * 37 % 1000, i)).toDF("g", "v", "id")
      .repartition(8)
    val order = Seq(col("v").desc, col("id"))
    val fast = Operators.topKPerGroup(df, Seq("g"), order, 5)
      .select("g", "v", "id", "rn").collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy(order: _*)
    val naive = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("g", "v", "id", "rn").collect().map(_.toSeq).toSet
    assert(fast == naive)
  }

  test("asOfJoin: most recent right row at-or-before left ts, per key") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, "c"), (3L, 50L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, 9.0), (1L, 150L, 15.0), (1L, 201L, 20.1), (2L, 150L, 99.0))
      .toDF("k", "ts", "v")
    val out = Operators.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("k", "ts").collect()
    // (1,100) → right@90; (1,200) → right@150; (2,150) → right@150 (inclusive);
    // (3,50) → no match
    assert(out.map(r => (r.getLong(0), r.getLong(1),
      Option(r.getAs[Any]("right_ts")), Option(r.getAs[Any]("right_v")))).toSeq == Seq(
      (1L, 100L, Some(90L), Some(9.0)),
      (1L, 200L, Some(150L), Some(15.0)),
      (2L, 150L, Some(150L), Some(99.0)),
      (3L, 50L, None, None)))
    // left payload columns survive
    assert(out.map(_.getAs[String]("tag")).toSeq == Seq("a", "b", "c", "d"))
  }

  test("asOfJoin with tolerance drops stale matches") {
    val left = Seq((1L, 1000L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 1.0)).toDF("k", "ts", "v")
    val strict = Operators.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("v"),
      toleranceNs = Some(100L)).collect()
    assert(strict(0).isNullAt(strict(0).fieldIndex("right_v")))
    val loose = Operators.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("v"),
      toleranceNs = Some(10000L)).collect()
    assert(loose(0).getAs[Double]("right_v") == 1.0)
  }
}
