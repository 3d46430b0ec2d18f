package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — the co-located-join layout for joins that repeat
  * at 100 TB. Writing both sides `bucketBy(n, key)` (Spark's hash-partitioned,
  * optionally sort-clustered table layout) lets every later equi-join on the
  * key plan as a zero-Exchange SortMergeJoin: each task reads bucket i of both
  * sides, and the shuffle that would normally dominate the join is paid ONCE at
  * write time instead of per query. The fact-to-fact analog of broadcasting
  * dims (which covers the small-side case, `q_join_broadcast`).
  *
  * Bucket counts must match (or divide) across join sides; pick n so each
  * bucket is a few hundred MB at target scale. BucketedJoinSpec asserts the
  * Exchange-free plan shape.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (parquet), replacing any existing
    * table of that name. `sortCols` default to the bucket columns so
    * SortMergeJoin can also skip its per-task sort.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** True iff the executed plan of `df` contains no shuffle exchange — the
    * property bucketing buys. (AQE wraps plans; string inspection of the final
    * executed plan is the stable way to see through it.)
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    df.collect() // finalize adaptive plan
    !finalPlanString(df).contains("Exchange hashpartitioning")
  }

  /** The final (post-AQE) physical plan text, without the "Initial Plan"
    * section AQE appends.
    */
  def finalPlanString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
}
