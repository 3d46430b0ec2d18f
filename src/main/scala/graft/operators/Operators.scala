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

  /** Gap-based sessionization: assign each row a per-key session index, where a
    * new session starts whenever the time since the key's previous row exceeds
    * `gap` (same unit as `tsCol`, typically µs). Classic lag→flag→running-sum:
    * one shuffle on the key, sessions never cross keys, and the per-key window
    * scales with key cardinality (150 users here; billions of users at 100 TB
    * partition just as evenly — no global sort anywhere).
    *
    * `tieBreak` columns make the within-key order total when timestamps can
    * collide — REQUIRED for deterministic session boundaries.
    */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String, gap: Long,
                 tieBreak: Seq[Column] = Nil,
                 sessionCol: String = "session_idx"): DataFrame = {
    val order = col(tsCol) +: tieBreak
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    df.withColumn("__new_session",
        when(prev.isNull || col(tsCol) - prev > gap, 1L).otherwise(0L))
      .withColumn(sessionCol, sum(col("__new_session")).over(run))
      .drop("__new_session")
  }

  /** Counter-reset-aware rate — a BEYOND-REFERENCE extension: the reference's
    * rate is (MAX-MIN)/range with no reset handling (prometheus_api.rs:964-1013,
    * ported faithfully as q_ts_rate). This is the true Prometheus semantics: per
    * series, sum consecutive deltas, and where the counter went DOWN (restart)
    * count the new value itself as the increase. No extrapolation (irate-style
    * raw-window rate).
    *
    * Emits per-series: n_samples, increase (sum of adjusted deltas), elapsed
    * (last−first ts, in `tsCol` units), rate = increase / elapsed_seconds.
    * Series with <2 samples are dropped (no defined rate). One shuffle on the
    * series key; the window never leaves the key partition.
    */
  def counterRate(df: DataFrame, seriesCols: Seq[String], tsCol: String,
                  valCol: String, tsUnitPerSecond: Long = 1000000L,
                  tieBreak: Seq[Column] = Nil): DataFrame = {
    val order = col(tsCol) +: tieBreak
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(order: _*)
    val prevV = lag(col(valCol), 1).over(w)
    val delta = col(valCol) - prevV
    // reset (value dropped) → the counter restarted: increase = new value
    val adj = when(prevV.isNull, lit(null))
      .when(delta < 0, col(valCol)).otherwise(delta)
    df.withColumn("__adj", adj)
      .groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).as("n_samples"),
        round(sum(col("__adj")), 2).as("increase"),
        (max(col(tsCol)) - min(col(tsCol))).as("elapsed"))
      .filter(col("n_samples") >= 2 && col("elapsed") > 0)
      .withColumn("rate",
        col("increase") / (col("elapsed").cast("double") / tsUnitPerSecond.toDouble))
  }

  /** Range (interval) join: match each point row to every interval row whose
    * half-open window `[startCol, endCol)` contains `pointTs`, optionally also
    * matching on equi-`keyCols`. Spark plans a raw `ts >= s AND ts < e` join as
    * BroadcastNestedLoopJoin (quadratic work unless one side is tiny) — this is
    * the bin-bucketed equi-join form that survives 100 TB:
    *
    *  - each point hashes to ONE bin (`ts div binSize`);
    *  - each interval is exploded to the bins it overlaps (`s div bin ..
    *    (e-1) div bin` — ≤ ⌈len/bin⌉+1 rows; pick `binSize` near the typical
    *    interval length so the blow-up factor is ~2);
    *  - a plain shuffled/broadcast equi-join on (keys, bin) + an exact residual
    *    containment filter. Because a point lives in exactly one bin, a
    *    (point, interval) pair meets at most once — no post-join dedup.
    *
    * Long/hot bins (every interval overlapping a popular bin lands in it) are
    * plain join skew, which AQE's skew-join splitting already handles —
    * unlike the nested-loop form, which has no such escape hatch.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointTs: String,
                startCol: String, endCol: String, binSize: Long,
                keyCols: Seq[String] = Nil): DataFrame = {
    require(binSize > 0, s"binSize must be positive: $binSize")
    val binned = points.withColumn("__bin", expr(s"`$pointTs` div ${binSize}L"))
    val exploded = intervals
      .filter(col(endCol) > col(startCol)) // empty interval matches nothing
      .withColumn("__bin",
        explode(sequence(expr(s"`$startCol` div ${binSize}L"),
          expr(s"(`$endCol` - 1) div ${binSize}L"))))
    binned.join(exploded, keyCols :+ "__bin")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bin")
  }

  /** Data-derived bin width for [[rangeJoin]]: the MEDIAN interval length
    * (approxQuantile — one streaming pass over the intervals side, the small
    * side of every realistic range join). Median, not mean: a few huge
    * intervals would drag the mean up and collapse every point into a handful
    * of bins (occupancy² candidate blow-up — the failure mode a hand-tuned
    * constant hits when data density drifts at scale); with the median,
    * typical intervals explode to ≤2 bins while rare long ones pay their own
    * proportional fan-out, which is linear mass, not quadratic pairing.
    */
  def autoBinSize(intervals: DataFrame, startCol: String, endCol: String,
                  relativeError: Double = 0.05): Long = {
    val med = intervals
      .select((col(endCol) - col(startCol)).cast("double").as("__len"))
      .filter(col("__len") > 0)
      .stat.approxQuantile("__len", Array(0.5), relativeError)
    if (med.isEmpty) 1L else math.max(1L, math.round(med(0)))
  }

  /** [[rangeJoin]] with the bin width derived from the interval-length
    * distribution — no hand-tuned knob to re-tune when the data grows 100×.
    *
    * `binStat` short-circuits the derivation pass with a PERSISTED statistic
    * (the catalog's table-stats map, written once at write/compact time via
    * [[deriveBinStat]]): the steady-state call then costs zero extra scans.
    * The stat is advisory — any positive bin width yields identical results
    * (only the explode factor / candidate count changes) — so a stale stat
    * can degrade performance but never correctness; the quantile pass runs
    * only when no stat was ever derived.
    */
  def rangeJoinAuto(points: DataFrame, intervals: DataFrame, pointTs: String,
                    startCol: String, endCol: String,
                    keyCols: Seq[String] = Nil,
                    binStat: Option[Long] = None): DataFrame =
    rangeJoin(points, intervals, pointTs, startCol, endCol,
      binStat.filter(_ > 0).getOrElse(autoBinSize(intervals, startCol, endCol)),
      keyCols)

  /** Derive the median-interval-length bin statistic and persist it in the
    * catalog's table-stats map under `statName` — the write/compact-time hook
    * whose value [[rangeJoinAuto]] consumes as `binStat` at query time.
    * Returns the derived width.
    */
  def deriveBinStat(catalog: graft.catalog.ChunkCatalog, statName: String,
                    intervals: DataFrame, startCol: String,
                    endCol: String): Long = {
    val bin = autoBinSize(intervals, startCol, endCol)
    catalog.setTableStat(statName, bin)
    bin
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
