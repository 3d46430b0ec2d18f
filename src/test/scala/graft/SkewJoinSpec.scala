package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** AQE is the engine's skew escape hatch for JOINS (salting covers the
  * aggregation side, `q_agg_salted`): this pins down that a pathologically hot
  * join key actually triggers runtime skew-splitting, so the claim in the
  * README/rangeJoin docs is load-bearing, not aspirational.
  */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def withConfs[T](kv: (String, String)*)(f: => T): T = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot-key partition of a shuffled join at runtime") {
    import spark.implicits._
    val r = withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB") {
      // 300k left rows, 5/6 of them on key 0; right side 1000 distinct keys
      val left = spark.range(0L, 300000L, 1L, 16)
        .select(when(col("id") % 6 =!= 0, lit(0L)).otherwise(col("id") % 1000L).as("k"),
          col("id").as("payload"))
      val right = spark.range(0L, 1000L).select(col("id").as("k"), (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // collect() (not count()) — count builds a separate QueryExecution, and
      // the skew-split decision lives in THIS dataset's finalized AQE plan
      val rows = joined.collect()
      assert(rows.length == 300000) // every left row matches exactly one right row
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.contains("skew=true"), plan)
      plan
    }
    assert(r.contains("skew=true"))
  }
}
