package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Whole-operator compositions the engine offers beyond single expressions. */
object Operators {

  /** Top-k rows per group, two-phase:
    *
    *  1. LOCAL prune — rank within (group, input-partition): the shuffle hashes on
    *     (group, pid) so it stays balanced across ALL cores even with 3 groups, and
    *     only ≤ k rows per (group, partition) survive;
    *  2. GLOBAL exact rank over the pruned set (tiny).
    *
    * A single `Window.partitionBy(group)` over the full input collapses onto
    * #groups tasks — with few groups that serializes the whole sort on a handful of
    * cores, which is exactly what breaks at 100 TB. Results are identical when
    * `order` is a total order (add tiebreak columns).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                   k: Int, rankCol: String = "rn"): DataFrame = {
    val localW = Window
      .partitionBy((groupCols.map(col) :+ spark_partition_id()): _*)
      .orderBy(order: _*)
    val pruned = df
      .withColumn("__rn_local", row_number().over(localW))
      .filter(col("__rn_local") <= k)
      .drop("__rn_local")
    val globalW = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    pruned
      .withColumn(rankCol, row_number().over(globalW))
      .filter(col(rankCol) <= k)
  }

  /** Skew-safe aggregation: two-phase groupBy with a salt on the hot key. Phase 1
    * partially aggregates on (key, salt) — a heavy-hitter key fans out over
    * `saltBuckets` reducers instead of melting one — phase 2 merges the partials.
    * Caller supplies mergeable partial/final agg pairs (sum/sum, count/sum,
    * min/min, max/max). AQE's skew handling covers joins; this covers the
    * aggregation side at 100 TB.
    */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
                      partial: Seq[(String, Column)],
                      finalAgg: Seq[(String, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted.groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    phase1.groupBy(keyCols.map(col): _*)
      .agg(finalAgg.head._2(col(finalAgg.head._1)).as(finalAgg.head._1),
        finalAgg.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }

  /** As-of join (time-series point-in-time lookup): for every left row, the single
    * most recent right row with `rightTs <= leftTs` (within `toleranceNs` when
    * given), matched on `keyCols`. Spark has no built-in; the union+last_value
    * formulation costs ONE shuffle on (key) — no range cross-join, no per-key
    * collect — and stays entirely in DataFrame land (SURVEY §7.3 preference (a):
    * compose built-ins before reaching for a custom SparkPlan).
    *
    * Right columns are emitted with a prefix (default "right_"); left rows with no
    * as-of match keep NULLs (left-outer semantics, like DuckDB ASOF LEFT JOIN).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               valueCols: Seq[String], prefix: String = "right_",
               toleranceNs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag and union: right rows carry the payload, left rows carry nulls
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(1).as("__is_left")) ++
        valueCols.map(c => col(c).as(s"__v_$c")) ++
        Seq(col(rightTs).as("__rts")): _*)
      .withColumn("__is_left", lit(0))
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__is_left")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")) ++
        Seq(lit(null).cast(right.schema(rightTs).dataType).as("__rts")) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == leftTs)
          .map(c => col(c).as(s"__l_$c")): _*)

    val unioned = taggedRight.unionByName(taggedLeft, allowMissingColumns = true)

    // within key: order by (ts, is_left) so a right row at the same ts sorts first
    // and is visible to the left row; carry the latest right payload forward
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__rts_c", last(col("__rts"), ignoreNulls = true).over(w))
      .withColumns(valueCols.map(c => s"__vc_$c" ->
        last(col(s"__v_$c"), ignoreNulls = true).over(w)).toMap)

    val matched = carried.filter(col("__is_left") === 1)
    val withTolerance = toleranceNs.fold(matched) { tol =>
      matched.withColumn("__in_tol",
        col("__rts_c").isNotNull && (col("__ts") - col("__rts_c") <= tol))
    }

    val base = withTolerance
      .withColumn("__keep", toleranceNs.fold(lit(true))(_ => col("__in_tol")))
    base.select(
      keyCols.map(col) ++
        Seq(col("__ts").as(leftTs)) ++
        leftCols.filterNot(c => keyCols.contains(c) || c == leftTs)
          .map(c => col(s"__l_$c").as(c)) ++
        Seq(when(col("__keep"), col("__rts_c")).as(s"$prefix$rightTs")) ++
        valueCols.map(c => when(col("__keep"), col(s"__vc_$c")).as(s"$prefix$c")): _*)
  }
}
