package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Column zone-map stats: min/max as strings with a type tag, mirroring the reference's
  * ColumnStatistics (src/metadata/s3.rs:84-127). Values are stored as JSON scalars
  * (string / long / double) — we keep them as typed options.
  */
final case class ColumnStats(
    minString: Option[String] = None,
    maxString: Option[String] = None,
    minLong: Option[Long] = None,
    maxLong: Option[Long] = None,
    minDouble: Option[Double] = None,
    maxDouble: Option[Double] = None,
    hasNulls: Boolean = false)

object ColumnStats {
  def ofString(min: String, max: String, hasNulls: Boolean = false): ColumnStats =
    ColumnStats(minString = Some(min), maxString = Some(max), hasNulls = hasNulls)
  def ofLong(min: Long, max: Long, hasNulls: Boolean = false): ColumnStats =
    ColumnStats(minLong = Some(min), maxLong = Some(max), hasNulls = hasNulls)
  def ofDouble(min: Double, max: Double, hasNulls: Boolean = false): ColumnStats =
    ColumnStats(minDouble = Some(min), maxDouble = Some(max), hasNulls = hasNulls)
}

/** Extended chunk metadata, mirroring ChunkMetadataExtended
  * (reference src/ingester/mod.rs:834-842 + src/metadata/s3.rs:84-127):
  * base fields + per-column zone maps + compaction level + optional shard id.
  * Timestamps are raw nanoseconds (the reference's unit).
  */
final case class ChunkMeta(
    path: String,
    minTimestampNs: Long,
    maxTimestampNs: Long,
    rowCount: Long,
    sizeBytes: Long,
    level: Int = 0,
    shardId: Option[String] = None,
    columnStats: Map[String, ColumnStats] = Map.empty,
    schemaDdl: Option[String] = None,
    // Level-0 flush provenance of a REWRITTEN chunk (compaction merge, shard-split
    // half): the original flush paths whose rows this chunk now carries,
    // flattened transitively so it always names L0 flushes. Empty for original
    // flushes. Lets a live tail (LiveMerge.CatalogTail) tell which flushes a
    // rewrite subsumed, so a flush that was compacted away between polls is
    // still delivered exactly once. Bounded: compaction groups within an hour
    // partition, so a chunk's provenance is that partition's flush count.
    sourcePaths: Seq[String] = Nil) {

  def overlaps(startNs: Long, endNs: Long): Boolean =
    minTimestampNs <= endNs && maxTimestampNs >= startNs
}

/** A materialized mergeable rollup registered in the catalog (the engine-side
  * completion of the reference's configured-but-unimplemented
  * `downsample_after_days`, src/compactor/mod.rs:70-91): a parquet table of
  * (time_bucket, metric_name, labels..., sum/min/max/sample_count/value_count)
  * at `resolutionSeconds`, covering raw timestamps in
  * [minBucketNs, maxCoveredNsExclusive). QueryEngine routes bucketed
  * aggregates whose step is a whole multiple of the resolution (and whose
  * range/columns the rollup covers) to this table instead of raw chunks.
  * Consistency invariant: registering any NEW raw chunk overlapping the
  * covered range drops the rollup (write-invalidation) — rewrites of existing
  * rows (compaction, splits, promotion) keep it, they move rows, not data.
  */
final case class RollupMeta(
    path: String,
    resolutionSeconds: Long,
    labelCols: Seq[String],
    minBucketNs: Long,
    maxCoveredNsExclusive: Long,
    rowCount: Long,
    // chunks with maxTimestampNs < buildCutoffNs are folded in — the boundary
    // an incremental extension merges FROM. MaxValue = "built over everything"
    // (the whole-warehouse rollup, and records persisted before this field).
    buildCutoffNs: Long = Long.MaxValue,
    // Set when a chunk rewrite (compaction/split) merged rows from BOTH sides
    // of buildCutoffNs into one chunk: the "newly aged since buildCutoffNs"
    // timestamp predicate can no longer distinguish already-rolled rows from
    // new ones, so the next coverage extension must be a FULL rebuild over all
    // aged chunks (incremental merge would double-count the rolled side).
    // Serving stays exact — rewrites move rows, not data — only the
    // incremental-extension shortcut is poisoned.
    staleForExtension: Boolean = false)

/** The unified catalog document: {version, chunks, time_index} — reference
  * src/metadata/s3.rs:104-116. time_index buckets chunks by hour of minTimestamp.
  *
  * Persistence is a single JSON file committed by atomic rename (single-writer Spark
  * driver stands in for the reference's ETag compare-and-swap, s3.rs:181-339). Reads
  * go through a TTL cache (reference uses 60 s, s3.rs:427-450).
  */
final class ChunkCatalog(val root: Path, cacheTtlMs: Long = 60000L) {

  import ChunkCatalog._

  private val catalogFile = root.resolve("catalog.json")
  @volatile private var cache: Option[(Long, CatalogState)] = None
  private val lock = new Object

  Files.createDirectories(root)

  // --- reads ---------------------------------------------------------------

  def state: CatalogState = {
    val now = System.currentTimeMillis()
    cache match {
      case Some((ts, st)) if now - ts < cacheTtlMs => st
      case _ =>
        val st = load()
        cache = Some((now, st))
        st
    }
  }

  def allChunks: Seq[ChunkMeta] = state.chunks.values.toSeq.sortBy(_.path)

  /** Hour-bucket range scan + [min,max] overlap — the "eliminates 99%+ of data" time
    * pruning (reference src/metadata/s3.rs:1083-1103).
    */
  def chunksInRange(startNs: Long, endNs: Long): Seq[ChunkMeta] = {
    val st = state
    val startBucket = hourBucket(startNs)
    val endBucket = hourBucket(endNs)
    val candidatePaths = st.timeIndex
      .range(startBucket, endBucket + 1)
      .valuesIterator.flatten.toSet
    candidatePaths.toSeq.sorted
      .flatMap(st.chunks.get)
      .filter(_.overlaps(startNs, endNs))
  }

  /** True if any shard split is in a phase requiring query-time dedup
    * (reference has_active_split, src/metadata/client.rs:182-188).
    */
  def hasActiveSplit: Boolean = state.activeSplits.nonEmpty

  // --- writes (all single-writer, atomic-rename committed) -----------------

  def register(chunk: ChunkMeta): Unit = registerAll(Seq(chunk))

  def registerAll(chunks: Seq[ChunkMeta]): Unit = mutate { st =>
    val added = chunks.foldLeft(st) { (s, c) =>
      s.copy(chunks = s.chunks + (c.path -> c), timeIndex = addToIndex(s.timeIndex, c))
    }
    // Write-invalidation: NEW raw data overlapping a rollup's covered range
    // makes it stale — drop it (re-materialize later). Chunk REWRITES
    // (compaction/split/promotion) go through replaceChunks and keep rollups.
    // The range checked extends to buildCutoffNs, not just the coverage end: a
    // late-arriving chunk landing in the gap [maxCoveredNsExclusive,
    // buildCutoffNs) is already "aged" by the extension's timestamp predicate
    // (maxTs < buildCutoffNs) so it would NEVER be picked up as newly aged —
    // when coverage later advances past it, the rollup would silently
    // undercount those buckets. Dropping forces a full rebuild that sees it.
    added.copy(rollups = added.rollups.filterNot(r =>
      chunks.exists(c =>
        c.minTimestampNs < math.max(r.maxCoveredNsExclusive, r.buildCutoffNs) &&
        c.maxTimestampNs >= r.minBucketNs)))
  }

  def rollups: Seq[RollupMeta] = state.rollups

  /** Register a materialized rollup (replaces any previous one at the same path). */
  def registerRollup(r: RollupMeta): Unit = mutate { st =>
    st.copy(rollups = st.rollups.filterNot(_.path == r.path) :+ r)
  }

  def dropRollup(path: String): Unit = mutate { st =>
    st.copy(rollups = st.rollups.filterNot(_.path == path))
  }

  /** Chunk-map + time-index with `removed` pruned — shared by the rewrite and
    * delete paths so the index semantics cannot silently diverge.
    */
  private def pruneChunks(st: CatalogState, removed: Set[String]) =
    (st.chunks -- removed,
      st.timeIndex.map { case (k, v) => k -> v.filterNot(removed.contains) }
        .filter(_._2.nonEmpty))

  /** Atomically remove source chunks and add the compacted chunk — mirrors the
    * reference's single-CAS compaction swap (src/metadata/s3.rs:1277-1332).
    */
  def replaceChunks(removePaths: Seq[String], add: Seq[ChunkMeta]): Unit = mutate { st =>
    val removed = removePaths.toSet
    // Rewrites keep rollups (rows move, data doesn't) — but they can poison
    // the INCREMENTAL extension, which classifies chunks purely by
    // `maxTimestampNs` against the rollup's buildCutoffNs boundary:
    //  (b) a merge folding an already-rolled chunk (maxTs < cutoff) into an
    //      output with maxTs >= cutoff makes the rolled rows look "newly
    //      aged" when the output later ages → double-counted sums;
    //  (a) a rewrite moving never-rolled rows (source maxTs >= cutoff) into
    //      an output with maxTs < cutoff makes them look already-rolled →
    //      silently missing when coverage advances (e.g. splitting a live
    //      chunk below the cutoff).
    // Flag such rollups stale-for-extension: serving stays exact, but the
    // next coverage extension must be a full rebuild over all aged chunks.
    // The test is conservative (chunk bounds, not row provenance); a false
    // positive costs one full rebuild, never correctness.
    val removedMetas = st.chunks.view.filterKeys(removed).values.toList
    val patchedRollups = st.rollups.map { r =>
      val cut = r.buildCutoffNs
      def stale: Boolean = {
        val (rolledSrc, unrolledSrc) = removedMetas.partition(_.maxTimestampNs < cut)
        (unrolledSrc.nonEmpty && add.exists(_.maxTimestampNs < cut)) ||
          (rolledSrc.nonEmpty && add.exists(_.maxTimestampNs >= cut))
      }
      if (cut != Long.MaxValue && !r.staleForExtension && stale)
        r.copy(staleForExtension = true)
      else r
    }
    val (keptChunks, prunedIndex) = pruneChunks(st, removed)
    val withAdds = add.foldLeft((keptChunks, prunedIndex)) { case ((cs, ti), c) =>
      (cs + (c.path -> c), addToIndex(ti, c))
    }
    st.copy(chunks = withAdds._1, timeIndex = withAdds._2, rollups = patchedRollups)
  }

  /** Remove chunks (retention/GC path). Unlike compaction/split rewrites this
    * DELETES rows, so any rollup whose coverage overlaps a removed chunk is
    * dropped — it would otherwise keep serving the deleted data.
    */
  def remove(paths: Seq[String]): Unit = mutate { st =>
    // ONE atomic swap, and the removed metas come from the freshly-loaded
    // state INSIDE the lock — reading the TTL-cached snapshot outside it
    // could miss a chunk another writer registered, leaving a rollup serving
    // deleted rows; and a crash between two separate mutations must not
    // strand the catalog with chunks gone but the overlapping rollup kept.
    val removed = paths.toSet
    val removedMetas = st.chunks.view.filterKeys(removed).values.toList
    val (keptChunks, prunedIndex) = pruneChunks(st, removed)
    st.copy(chunks = keptChunks, timeIndex = prunedIndex,
      rollups = st.rollups.filterNot(r =>
        removedMetas.exists(c => c.minTimestampNs < r.maxCoveredNsExclusive &&
          c.maxTimestampNs >= r.minBucketNs)))
  }

  def setActiveSplits(splits: Seq[String]): Unit = mutate(_.copy(activeSplits = splits.toList))

  /** Named numeric table statistics (e.g. the range-join median interval
    * length, derived once at write/compact time instead of per-query — see
    * Operators.rangeJoinAuto). Stats are advisory: a stale value can only
    * change performance, never results, so writes are cheap overwrite.
    */
  def setTableStat(name: String, value: Long): Unit = mutate { st =>
    st.copy(tableStats = st.tableStats + (name -> value))
  }

  def tableStat(name: String): Option[Long] = state.tableStats.get(name)

  /** Deletions deferred by a grace period (reference 5 min GC grace,
    * src/compactor/mod.rs:816-918). Entries are (path, deletableAfterMs).
    */
  def deferDelete(paths: Seq[String], nowMs: Long, graceMs: Long = 300000L): Unit =
    mutate { st =>
      st.copy(pendingDeletes = st.pendingDeletes ++ paths.map(p => p -> (nowMs + graceMs)))
    }

  /** Physically delete files whose grace period elapsed; returns deleted paths. */
  def gc(nowMs: Long): Seq[String] = lock.synchronized {
    val st = load()
    val (ripe, keep) = st.pendingDeletes.partition(_._2 <= nowMs)
    ripe.foreach { case (p, _) =>
      val f = Paths.get(p)
      if (Files.exists(f)) Files.delete(f)
    }
    persist(st.copy(pendingDeletes = keep))
    ripe.map(_._1)
  }

  private def mutate(f: CatalogState => CatalogState): Unit = lock.synchronized {
    persist(f(load()))
  }

  private def persist(st: CatalogState): Unit = {
    val tmp = root.resolve(s"catalog.json.tmp.${Thread.currentThread().getId}")
    Files.write(tmp, render(st).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, catalogFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    cache = Some((System.currentTimeMillis(), st))
  }

  private def load(): CatalogState =
    if (Files.exists(catalogFile))
      parse(new String(Files.readAllBytes(catalogFile), StandardCharsets.UTF_8))
    else CatalogState.empty

  def invalidateCache(): Unit = cache = None
}

object ChunkCatalog {

  final case class CatalogState(
      version: Long,
      chunks: Map[String, ChunkMeta],
      timeIndex: scala.collection.immutable.TreeMap[Long, List[String]],
      activeSplits: List[String],
      pendingDeletes: List[(String, Long)],
      rollups: List[RollupMeta] = Nil,
      tableStats: Map[String, Long] = Map.empty)

  object CatalogState {
    val empty: CatalogState = CatalogState(1L, Map.empty,
      scala.collection.immutable.TreeMap.empty, Nil, Nil)
  }

  /** Hour bucket of an ns timestamp (reference src/metadata/s3.rs:341-344). */
  def hourBucket(tsNs: Long): Long = Math.floorDiv(tsNs, 3600L * 1000000000L)

  /** Union schema of a chunk set from catalog-held DDL — None when any chunk
    * lacks a stored schema or two chunks disagree on a column's type (caller
    * falls back to mergeSchema footer inference). Field order: first seen.
    * Keeping the schema in metadata lets every read skip the distributed
    * parquet-footer inference job, the same way the reference serves schema
    * from its metadata store rather than from S3 object footers.
    */
  def mergedSchema(chunks: Seq[ChunkMeta]): Option[org.apache.spark.sql.types.StructType] = {
    import org.apache.spark.sql.types.{StructField, StructType}
    if (chunks.isEmpty || chunks.exists(_.schemaDdl.isEmpty)) return None
    try {
      val fields = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
      chunks.foreach { c =>
        StructType.fromDDL(c.schemaDdl.get).fields.foreach { f =>
          fields.get(f.name) match {
            case None => fields(f.name) = f.copy(nullable = true)
            case Some(prev) if prev.dataType != f.dataType => return None
            case _ => ()
          }
        }
      }
      Some(StructType(fields.values.toSeq))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def addToIndex(idx: scala.collection.immutable.TreeMap[Long, List[String]],
                         c: ChunkMeta): scala.collection.immutable.TreeMap[Long, List[String]] = {
    // A chunk spanning multiple hours is indexed under every bucket it touches,
    // so a range scan over buckets never misses it.
    val buckets = hourBucket(c.minTimestampNs) to hourBucket(c.maxTimestampNs)
    buckets.foldLeft(idx) { (i, b) =>
      val cur = i.getOrElse(b, Nil)
      if (cur.contains(c.path)) i else i.updated(b, c.path :: cur)
    }
  }

  // --- JSON (json4s ships with Spark) --------------------------------------

  private def statsToJson(s: ColumnStats): JObject = {
    def v(str: Option[String], l: Option[Long], d: Option[Double]): JValue =
      str.map(JString(_): JValue)
        .orElse(l.map(JLong(_): JValue))
        .orElse(d.map(JDouble(_): JValue))
        .getOrElse(JNull)
    JObject(
      "min" -> v(s.minString, s.minLong, s.minDouble),
      "max" -> v(s.maxString, s.maxLong, s.maxDouble),
      "has_nulls" -> JBool(s.hasNulls))
  }

  private def chunkToJson(c: ChunkMeta): JObject = JObject(
    "path" -> JString(c.path),
    "min_timestamp" -> JLong(c.minTimestampNs),
    "max_timestamp" -> JLong(c.maxTimestampNs),
    "row_count" -> JLong(c.rowCount),
    "size_bytes" -> JLong(c.sizeBytes),
    "level" -> JInt(c.level),
    "shard_id" -> c.shardId.map(JString(_): JValue).getOrElse(JNull),
    "schema_ddl" -> c.schemaDdl.map(JString(_): JValue).getOrElse(JNull),
    "source_paths" -> JArray(c.sourcePaths.map(JString(_): JValue).toList),
    "column_stats" -> JObject(c.columnStats.toList.sortBy(_._1).map {
      case (k, v) => k -> (statsToJson(v): JValue)
    }))

  def render(st: CatalogState): String = {
    val doc = JObject(
      "version" -> JLong(st.version),
      "chunks" -> JObject(st.chunks.toList.sortBy(_._1).map {
        case (k, v) => k -> (chunkToJson(v): JValue)
      }),
      "time_index" -> JObject(st.timeIndex.toList.map {
        case (k, v) => k.toString -> (JArray(v.sorted.map(JString(_): JValue)): JValue)
      }),
      "active_splits" -> JArray(st.activeSplits.map(JString(_): JValue)),
      "pending_deletes" -> JArray(st.pendingDeletes.map { case (p, t) =>
        JObject("path" -> JString(p), "after" -> JLong(t)): JValue
      }),
      "rollups" -> JArray(st.rollups.map(r => JObject(
        "path" -> JString(r.path),
        "resolution_seconds" -> JLong(r.resolutionSeconds),
        "label_cols" -> JArray(r.labelCols.map(JString(_): JValue).toList),
        "min_bucket" -> JLong(r.minBucketNs),
        "max_covered_exclusive" -> JLong(r.maxCoveredNsExclusive),
        "row_count" -> JLong(r.rowCount),
        "build_cutoff" -> JLong(r.buildCutoffNs),
        "stale_extension" -> JBool(r.staleForExtension)): JValue)),
      "table_stats" -> JObject(st.tableStats.toList.sortBy(_._1).map {
        case (k, v) => k -> (JLong(v): JValue)
      }))
    JsonMethods.pretty(JsonMethods.render(doc))
  }

  private def statsFromJson(j: JValue): ColumnStats = {
    def typed(v: JValue): (Option[String], Option[Long], Option[Double]) = v match {
      case JString(s) => (Some(s), None, None)
      case JLong(l) => (None, Some(l), None)
      case JInt(i) => (None, Some(i.toLong), None)
      case JDouble(d) => (None, None, Some(d))
      case JDecimal(d) => (None, None, Some(d.toDouble))
      case _ => (None, None, None)
    }
    val (mins, minl, mind) = typed(j \ "min")
    val (maxs, maxl, maxd) = typed(j \ "max")
    val nulls = (j \ "has_nulls") match { case JBool(b) => b; case _ => false }
    ColumnStats(mins, maxs, minl, maxl, mind, maxd, nulls)
  }

  private def long(j: JValue): Long = j match {
    case JLong(l) => l
    case JInt(i) => i.toLong
    case JDouble(d) => d.toLong
    case _ => 0L
  }

  def parse(json: String): CatalogState = {
    val doc = JsonMethods.parse(json)
    val chunks = (doc \ "chunks") match {
      case JObject(fields) => fields.map { case (path, j) =>
        val stats = (j \ "column_stats") match {
          case JObject(sf) => sf.map { case (k, v) => k -> statsFromJson(v) }.toMap
          case _ => Map.empty[String, ColumnStats]
        }
        path -> ChunkMeta(
          path = path,
          minTimestampNs = long(j \ "min_timestamp"),
          maxTimestampNs = long(j \ "max_timestamp"),
          rowCount = long(j \ "row_count"),
          sizeBytes = long(j \ "size_bytes"),
          level = long(j \ "level").toInt,
          shardId = (j \ "shard_id") match { case JString(s) => Some(s); case _ => None },
          columnStats = stats,
          schemaDdl = (j \ "schema_ddl") match { case JString(s) => Some(s); case _ => None },
          sourcePaths = (j \ "source_paths") match {
            case JArray(a) => a.collect { case JString(s) => s }
            case _ => Nil // catalogs written before provenance existed
          })
      }.toMap
      case _ => Map.empty[String, ChunkMeta]
    }
    val timeIndex = (doc \ "time_index") match {
      case JObject(fields) =>
        scala.collection.immutable.TreeMap.from(fields.map { case (k, v) =>
          k.toLong -> (v match {
            case JArray(a) => a.collect { case JString(s) => s }
            case _ => Nil
          })
        })
      case _ => scala.collection.immutable.TreeMap.empty[Long, List[String]]
    }
    val splits = (doc \ "active_splits") match {
      case JArray(a) => a.collect { case JString(s) => s }
      case _ => Nil
    }
    val pending = (doc \ "pending_deletes") match {
      case JArray(a) => a.collect { case o: JObject =>
        ((o \ "path") match { case JString(s) => s; case _ => "" }) -> long(o \ "after")
      }
      case _ => Nil
    }
    val rollups = (doc \ "rollups") match {
      case JArray(a) => a.collect { case o: JObject =>
        RollupMeta(
          path = (o \ "path") match { case JString(s) => s; case _ => "" },
          resolutionSeconds = long(o \ "resolution_seconds"),
          labelCols = (o \ "label_cols") match {
            case JArray(ls) => ls.collect { case JString(s) => s }
            case _ => Nil
          },
          minBucketNs = long(o \ "min_bucket"),
          maxCoveredNsExclusive = long(o \ "max_covered_exclusive"),
          rowCount = long(o \ "row_count"),
          buildCutoffNs = (o \ "build_cutoff") match {
            case JNothing | JNull => Long.MaxValue // pre-field records
            case v => long(v)
          },
          staleForExtension = (o \ "stale_extension") match {
            case JBool(b) => b
            case _ => false // pre-field records
          })
      }
      case _ => Nil
    }
    val tableStats = (doc \ "table_stats") match {
      case JObject(fields) => fields.map { case (k, v) => k -> long(v) }.toMap
      case _ => Map.empty[String, Long]
    }
    CatalogState(long(doc \ "version"), chunks, timeIndex, splits, pending, rollups,
      tableStats)
  }
}
