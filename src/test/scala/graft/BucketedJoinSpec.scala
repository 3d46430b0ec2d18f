package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Bucketing

class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("bucketed fact-to-fact join plans without a shuffle exchange") {
    import spark.implicits._
    val orders = (1L to 2000L).map(k => (k, k % 7, s"o$k")).toDF("key", "grp", "otag")
      .repartition(8)
    val items = (1L to 6000L).map(i => (i % 2000L + 1L, i, i * 1.5)).toDF("key", "item", "v")
      .repartition(8)
    Bucketing.writeBucketed(orders, "bspec_orders", Seq("key"), 8)
    Bucketing.writeBucketed(items, "bspec_items", Seq("key"), 8)
    try {
      val bo = spark.table("bspec_orders")
      val bi = spark.table("bspec_items")
      // force the join structure visible (no broadcast fallback)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
      val joined = bo.join(bi, "key")
        .groupBy("grp").agg(count(lit(1)).as("cnt"), round(sum("v"), 2).as("sv"))
      // co-located: the join itself needs no Exchange (the aggregation after it
      // may shuffle; check the join subplan)
      val joinOnly = bo.join(bi, "key").select(bo("key"), col("item"))
      assert(Bucketing.isShuffleFree(joinOnly), Bucketing.finalPlanString(joinOnly))
      // and results match the plain unbucketed join
      val got = joined.orderBy("grp").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val want = orders.join(items, "key")
        .groupBy("grp").agg(count(lit(1)).as("cnt"), round(sum("v"), 2).as("sv"))
        .orderBy("grp").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == want)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      Bucketing.dropTable(spark, "bspec_orders")
      Bucketing.dropTable(spark, "bspec_items")
    }
  }

  test("one bucketed side still saves its half of the shuffle") {
    import spark.implicits._
    val left = (1L to 1000L).map(k => (k, s"l$k")).toDF("key", "ltag").repartition(8)
    Bucketing.writeBucketed(left, "bspec_left", Seq("key"), 8)
    try {
      val bl = spark.table("bspec_left")
      val right = (1L to 3000L).map(i => (i % 1000L + 1L, i)).toDF("key", "item")
        .repartition(8)
      // disable broadcast so the shuffle structure is visible
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = bl.join(right, "key").select(bl("key"), col("item"))
        j.collect()
        val plan = Bucketing.finalPlanString(j)
        // exactly one Exchange (the unbucketed right side)
        val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        assert(nExchanges == 1, plan)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally Bucketing.dropTable(spark, "bspec_left")
  }
}
