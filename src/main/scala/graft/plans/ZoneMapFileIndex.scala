package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import graft.catalog.ChunkCatalog
import graft.prune.PredicateExtraction

/** Catalog-zone-map pruning INSIDE the DataSource (SURVEY §7.3 preference (c):
  * a custom Spark integration only where built-ins can't express it).
  *
  * Spark's FileSourceStrategy hands every scan's `dataFilters` to its
  * FileIndex; this implementation converts them to the engine's TimeRange +
  * ColumnPredicates (the same extraction the reference runs in
  * src/query/engine.rs:368-487) and lists ONLY the chunk files whose catalog
  * zone maps might match. Effect: ANY DataFrame/SQL plan over the table —
  * including joins and subqueries Catalyst builds — skips non-matching chunks
  * at PLANNING time, before a single parquet footer is opened; Parquet
  * row-group stats then re-prune inside the surviving files (the reference's
  * two-tier metadata-then-parquet scheme, README.md:288-290).
  *
  * Semantics note: the engine's default last-1-hour window (applied when a
  * query has NO time predicate) is a QUERY-level rule and stays in
  * QueryEngine.sql; a filter-less scan here correctly sees all chunks.
  *
  * Driver-side only, O(#chunks) metadata — the data path is untouched.
  */
final class ZoneMapFileIndex(
    spark: SparkSession,
    catalog: ChunkCatalog,
    dataSchema: StructType) extends FileIndex {

  /** Last listFiles pruning decision — observability for tests/telemetry. */
  @volatile var lastSelectedPaths: Seq[String] = Nil

  override def rootPaths: Seq[HPath] = Seq(new HPath(catalog.root.toUri))

  override def partitionSchema: StructType = StructType(Nil)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val chunks = catalog.allChunks
    val selected =
      if (dataFilters.isEmpty) chunks
      else {
        // nowNs only matters for the default-window fallback, which extraction
        // applies when NO bound is found — irrelevant here because a scan with
        // no usable time filter must see every chunk. Detect that case by
        // comparing against the sentinel default range.
        val nowNs = Long.MaxValue / 2
        val (range, preds) = PredicateExtraction.extractFromExpression(
          dataFilters.reduce(org.apache.spark.sql.catalyst.expressions.And), nowNs)
        val isDefaultWindow =
          range == graft.prune.TimeRange(nowNs - PredicateExtraction.DefaultWindowNs, nowNs)
        val timed =
          if (isDefaultWindow) chunks
          else chunks.filter(_.overlaps(range.startNs, range.endNs))
        timed.filter(c => preds.forall(_.keepChunk(c)))
      }
    lastSelectedPaths = selected.map(_.path)
    selected.map { c =>
      PartitionDirectory(InternalRow.empty, listChunkFiles(c.path).toArray)
    }
  }

  // FileStatus listings cached per chunk dir — chunk files are immutable
  // (rewrites create NEW paths; old ones go through grace-period GC).
  private val fileCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[FileStatus]]()

  private def listChunkFiles(dir: String): Seq[FileStatus] =
    fileCache.computeIfAbsent(dir, d => {
      val p = java.nio.file.Paths.get(d)
      if (!java.nio.file.Files.exists(p)) Array.empty
      else {
        val s = java.nio.file.Files.walk(p)
        try s.filter(f => java.nio.file.Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet"))
          .map[FileStatus] { f =>
            new FileStatus(java.nio.file.Files.size(f), false, 1, 134217728L,
              java.nio.file.Files.getLastModifiedTime(f).toMillis,
              new HPath(f.toUri))
          }
          .toArray(n => new Array[FileStatus](n))
        finally s.close()
      }
    }).toSeq

  override def inputFiles: Array[String] =
    catalog.allChunks.flatMap(c => listChunkFiles(c.path).map(_.getPath.toString)).toArray

  override def refresh(): Unit = {
    fileCache.clear()
    catalog.invalidateCache()
  }

  override def sizeInBytes: Long = catalog.allChunks.map(_.sizeBytes).sum

  override def metadataOpsTimeNs: Option[Long] = None
}

object ZoneMapFileIndex {

  /** A DataFrame over the catalog's chunk set whose scans self-prune by zone
    * maps. Schema from the catalog when every chunk carries one, else inferred.
    */
  def table(spark: SparkSession, catalog: ChunkCatalog): org.apache.spark.sql.DataFrame = {
    val chunks = catalog.allChunks
    val schema = ChunkCatalog.mergedSchema(chunks).getOrElse {
      if (chunks.isEmpty) graft.schema.MetricSchema.default
      else spark.read.option("mergeSchema", "true").parquet(chunks.map(_.path): _*).schema
    }
    val index = new ZoneMapFileIndex(spark, catalog, schema)
    org.apache.spark.sql.GraftBridge.fileIndexTable(spark, index, schema)
  }
}
