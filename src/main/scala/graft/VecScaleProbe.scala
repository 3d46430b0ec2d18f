package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for similarity search: 1 M clustered 64-dim vectors, exact
  * brute-force ground truth for a query panel, then IVF and LSH ANN recall@10
  * + throughput. Clusters make ANN meaningful (uniform random vectors have no
  * neighbors to find).
  */
object VecScaleProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toLong else 1000000L
    val dim = 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[vecs] $name: ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }

    // 200 clusters; component = cluster center ± 5% deterministic noise
    val corpus = spark.range(0L, nVecs, 1L, 64)
      .withColumn("cluster", col("id") % 200)
      .withColumn("embedding", expr(
        s"""transform(sequence(1, $dim), j -> cast(
           |  (pmod(xxhash64(cluster, j), 2000) / 1000.0 - 1.0)
           |  + (pmod(xxhash64(id, j), 100) / 1000.0 - 0.05) as float))""".stripMargin))
      .select(col("id").as("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("generate corpus")(corpus.count())
    println(s"[vecs] corpus: $nVecs vectors, dim $dim, 200 clusters")

    val queries = corpus.filter(col("vec_id") % (nVecs / 16) === 7)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val nq = queries.count()
    println(s"[vecs] query panel: $nq vectors")

    val k = 10
    // materialize INSIDE the timed region — these plans are lazy
    val truth = time("brute force (exact)") {
      val t = graft.sim.Similarity.bruteForceTopK(corpus, queries, k)
        .select("query_id", "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      t.count(); t
    }

    def recall(name: String, ann: org.apache.spark.sql.DataFrame): Unit = {
      val hits = ann.select("query_id", "vec_id").join(truth, Seq("query_id", "vec_id")).count()
      println(f"[vecs] $name recall@$k: ${hits.toDouble / (nq * k)}%.3f ($hits/${nq * k})")
    }

    val ivf = time("IVF ANN (256 cells, probe 16)") {
      val d = graft.sim.Similarity.ivfTopK(corpus, queries, k, nCentroids = 256, nProbe = 16)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      d.count(); d
    }
    recall("IVF", ivf)

    val lsh = time("LSH ANN (12 planes x 6 tables)") {
      val d = graft.sim.Similarity.lshTopK(corpus, queries, k, numPlanes = 12, tables = 6)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      d.count(); d
    }
    recall("LSH", lsh)

    // materialized IVF: the build is the one-time write-path cost; the query
    // then reads ONLY probed cell partitions — at 100 TB this is the difference
    // between scanning the corpus per query and reading nProbe/nCentroids of it
    val idxRoot = java.nio.file.Files.createTempDirectory("vec_ivf_idx_").toString
    time("IVF index build (256 cells, one-time)") {
      graft.sim.IvfIndex.build(corpus, idxRoot, nCentroids = 256)
    }
    val ivfIdx = time("IVF indexed query (probe 16, pruned read)") {
      val d = graft.sim.IvfIndex.topK(spark, idxRoot, queries, k, nProbe = 16)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      d.count(); d
    }
    recall("IVF-indexed", ivfIdx)

    // bulk re-scoring leg: ≥10⁵ queries through the DISTRIBUTED probe — the
    // driver never materializes the panel (only the ≤ nCentroids probed-cell
    // union); per-query work is identical to the driver path
    val bulkQueries = corpus.filter(col("vec_id") % 8 === 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val nBulk = bulkQueries.count()
    val bulkRows = time(s"IVF indexed BULK probe ($nBulk queries, probe 16)") {
      graft.sim.IvfIndex.topKBulk(spark, idxRoot, bulkQueries, k, nProbe = 16).count()
    }
    println(f"[vecs] bulk probe: $nBulk queries -> $bulkRows result rows " +
      f"(${bulkRows.toDouble / nBulk}%.1f rows/query; " +
      (if (bulkRows == nBulk * k) "OK" else "SUSPECT") + ")")

    val filesRead = graft.sim.IvfIndex
      .probedScan(spark, idxRoot, Seq(0)).select(input_file_name()).distinct().count()
    val filesAll = spark.read.parquet(s"$idxRoot/data")
      .select(input_file_name()).distinct().count()
    println(s"[vecs] pruned read: cell 0 touches $filesRead of $filesAll index files")

    // SemDeDup at scale: 1024 Voronoi cells bound the pair join to Σ cell² —
    // report the actual candidate-pair count vs the n²/2 a naive all-pairs
    // would cost. The generated corpus has ~200 true clusters with
    // within-cluster cosine ≈ 0.9975, so threshold 0.995 should collapse each
    // cell to a handful of survivors (min-id keep).
    val semKept = time("semanticDedup (1024 cells, thr 0.995)") {
      graft.sim.Similarity.semanticDedup(corpus, threshold = 0.995, nClusters = 1024)
        .filter(col("kept")).count()
    }
    println(f"[vecs] semdedup: kept $semKept of $nVecs " +
      f"(${semKept * 100.0 / nVecs}%.2f%% — expected ≲ #occupied cells; " +
      (if (semKept >= 200 && semKept < nVecs / 10) "OK" else "SUSPECT") + ")")

    // Mega-cluster skew: 90% of the corpus in ONE tight cluster. Uncapped,
    // that cell's pair join is (0.9n)²/2 — at n=200k that is 1.6e10 pairs and
    // effectively never finishes; with maxCellCompare the cell costs
    // 0.9n × cap. The cluster is near-identical so min-id keep should
    // collapse it to ~1 survivor either way — the cap changes COST, not the
    // planted-duplicate answer.
    val nSkew = math.max(nVecs / 5, 10000L)
    val skew = spark.range(nSkew).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        when(col("id") % 10 =!= 0, // 90%: one tight cluster around a fixed point
          (lit(5.0f) + (d.cast("float") / 100f) +
            (pmod(hash(col("vec_id"), d), lit(1000)).cast("float") / 2e6f)).cast("float"))
          .otherwise( // 10%: spread out
            (pmod(hash(col("vec_id") * 31 + 7, d), lit(2000)).cast("float") / 100f - 10f)
              .cast("float"))).as("embedding"))
    val skewKept = time(s"semanticDedup skew guard (n=$nSkew, 90% one cluster, cap=512)") {
      graft.sim.Similarity.semanticDedup(skew, threshold = 0.999, nClusters = 64,
          maxCellCompare = 512)
        .filter(col("kept")).count()
    }
    println(f"[vecs] semdedup skew: kept $skewKept of $nSkew " +
      f"(mega-cluster collapsed: ${if (skewKept < nSkew / 5) "OK" else "SUSPECT"})")
    spark.stop()
  }
}
