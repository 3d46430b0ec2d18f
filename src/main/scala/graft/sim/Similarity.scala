package graft.sim

import graft.util.Checkpoints.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (Array[Float]).
  *
  *  - Brute-force cosine top-k: the exact baseline. Queries are broadcast (small
  *    side), the corpus streams — one map-side pass + a per-query top-k
  *    (TakeOrderedAndProject-shaped), no O(n²) shuffle.
  *  - LSH (random signed hyperplanes): the 100 TB scale path — deterministic
  *    hyperplanes derived from xxhash64, bucket join on signatures, exact re-rank
  *    within buckets only. Multi-probe via several independent signature tables
  *    raises recall without touching the whole corpus.
  *
  * Dot products use `zip_with` + `aggregate` over array columns in doubles —
  * sequential left-to-right summation, bit-identical to a single-threaded loop,
  * which keeps results oracle-comparable.
  */
object Similarity {

  /** Σ a_i*b_i in doubles, sequential. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via a custom Catalyst expression (single imperative pass; the
    * zip_with+aggregate form is interpreted per row). Fold order matches the
    * compositional form bit-for-bit, so oracle comparisons are unaffected.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.HashExpressions.cosine_sim(a, b)

  /** Exact top-k by cosine for each query vector. `queries` must be small enough to
    * broadcast (it is hinted); corpus-side work is one scan.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     queryIdCol: String = "query_id",
                     queryVecCol: String = "query_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine", cosine(col(vecCol), col(queryVecCol)))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  // ---- LSH: random signed hyperplanes --------------------------------------

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a value in [-1, 1) derived from xxhash64 — no RNG state, reproducible across
    * runs and cluster layouts.
    */
  private def planeComponent(p: Int, i: Column): Column =
    (xxhash64(lit(p), i).cast("double") / lit(Long.MaxValue.toDouble))

  /** `numPlanes`-bit signature: bit p = sign(v · r_p) — custom expression, one
    * imperative pass per row.
    */
  def hyperplaneSignature(vec: Column, numPlanes: Int = 16, seed: Int = 0): Column =
    graft.functions.HashExpressions.hyperplane_sig(vec, numPlanes, seed)

  /** ANN top-k: candidates = corpus vectors sharing a signature with the query in ANY
    * of `tables` independent hyperplane tables (multi-probe), re-ranked exactly.
    * Recall < 1 by construction; raise `tables` / lower `numPlanes` to trade cost for
    * recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numPlanes: Int = 12, tables: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              queryIdCol: String = "query_id", queryVecCol: String = "query_vec"): DataFrame = {
    val sigTables = (0 until tables).map { t =>
      corpus.select(col(idCol), col(vecCol),
        hyperplaneSignature(col(vecCol), numPlanes, t).as("sig"), lit(t).as("tbl"))
    }.reduce(_ unionAll _)
    val qTables = (0 until tables).map { t =>
      queries.select(col(queryIdCol), col(queryVecCol),
        hyperplaneSignature(col(queryVecCol), numPlanes, t).as("sig"), lit(t).as("tbl"))
    }.reduce(_ unionAll _)
    val candidates = sigTables.join(broadcast(qTables), Seq("tbl", "sig"))
      .select(col(queryIdCol), col(queryVecCol), col(idCol), col(vecCol))
      .distinct()
    val w = Window.partitionBy(queryIdCol).orderBy(col("cosine").desc, col(idCol))
    candidates
      .withColumn("cosine", cosine(col(vecCol), col(queryVecCol)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nCentroids` Voronoi cells
    * around deterministically-chosen centroid vectors (every `n/nCentroids`-th
    * corpus vector by id — reproducible, no RNG); a query probes only its `nProbe`
    * nearest cells and re-ranks exactly inside them.
    *
    * Scale shape: centroids are tiny and broadcast twice (corpus assignment, query
    * probe); the corpus is scanned once to assign cells (in production the
    * assignment would be materialized/bucketed so queries touch only probed cells —
    * cell assignment is the write-path cost, probing is the read-path cost).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              queryIdCol: String = "query_id", queryVecCol: String = "query_vec"): DataFrame = {
    // deterministic centroid sample WITHOUT a global window (a partition-less
    // row_number() would serialize the whole corpus through one task) and
    // WITHOUT a corpus.count() pre-action (an extra full scan per query): the
    // nCentroids smallest id-hashes — a uniform deterministic sample via one
    // distributed TakeOrdered, whatever the corpus size.
    val cents = corpus.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nCentroids)
      .collect()
    if (cents.isEmpty) // empty corpus: brute force is equally empty, right schema
      return bruteForceTopK(corpus, queries, k, idCol, vecCol, queryIdCol, queryVecCol)
    val centroids = queries.sparkSession.createDataFrame(
      java.util.Arrays.asList(cents: _*),
      org.apache.spark.sql.types.StructType(Seq(
        corpus.schema(idCol).copy(name = "__cid"),
        corpus.schema(vecCol).copy(name = "__cvec"))))

    def nearestCells(df: DataFrame, vec: String, keep: Int): DataFrame = {
      val ww = Window.partitionBy(df.columns.head).orderBy(col("__csim").desc, col("__cid"))
      df.crossJoin(broadcast(centroids))
        .withColumn("__csim", cosine(col(vec), col("__cvec")))
        .withColumn("__crank", row_number().over(ww))
        .filter(col("__crank") <= keep)
        .drop("__csim", "__cvec", "__crank")
    }

    // Corpus assignment is the hot side (|corpus| rows): a single imperative
    // nearest_centroid pass inside the scan — the crossJoin+window form would
    // shuffle |corpus|·nCentroids rows. Queries (tiny) keep the join form for
    // the top-nProbe cells.
    val cvecs: Array[Array[Double]] = cents.map(_.getSeq[Any](1).map {
      case f: Float => f.toDouble
      case d: Double => d
      case other => other.toString.toDouble
    }.toArray)
    // Decode centroid ids generically (idCol is caller-chosen: long, int,
    // string, ... — a hard getLong would throw on anything non-Long).
    val cidArr = array(cents.map(r => lit(r.get(0))): _*)
    val assigned = corpus.select(col(idCol), col(vecCol))
      .withColumn("__cid", element_at(cidArr,
        graft.functions.HashExpressions.nearest_centroid(col(vecCol), cvecs) + 1))
    val probed = nearestCells(queries.select(col(queryIdCol), col(queryVecCol)), queryVecCol, nProbe)
    val rerank = Window.partitionBy(queryIdCol).orderBy(col("cosine").desc, col(idCol))
    assigned.join(broadcast(probed), "__cid")
      .withColumn("cosine", cosine(col(vecCol), col(queryVecCol)))
      .withColumn("rank", row_number().over(rerank))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication"): semantic deduplication by clustering the
    * embedding space and dropping, within each cluster, every vector that has a
    * smaller-id neighbor with cosine ≥ `threshold` (deterministic min-id keep —
    * the same first-wins policy as the exact-dedup operators, so results are
    * reproducible across runs and engines).
    *
    * `nClusters = 1` degenerates to exact all-pairs over the whole corpus — the
    * oracle mode. At scale the pair join is confined to Voronoi cells around
    * deterministically-sampled centroids (same machinery as [[ivfTopK]]):
    * comparisons cost O(Σ cluster²), never O(n²) — which is the entire point of
    * SemDeDup. Cross-cluster near-dups are missed by construction (recall < 1),
    * traded for the cluster-local cost bound.
    *
    * Returns every input id with a `kept` flag (kept = no smaller-id neighbor
    * within threshold in its cluster).
    *
    * Skew guard (`maxCellCompare`): within a cell, the "earlier-id" side of the
    * pair join is capped to the cell's `maxCellCompare` smallest ids, so one
    * mega-cluster costs size×cap, never size² (the SemDeDup analog of the LSH
    * oversized-bucket guard in Dedup.minhashNearDupPairs). Cells at or under
    * the cap are EXACT — the cap side is then the whole cell — which is why
    * the nClusters=1 oracle result is unchanged. Over the cap, a vector is
    * dropped iff it has a near-neighbor among the cell's earliest `cap` ids:
    * under min-id keep those are precisely the likely survivors, so planted
    * duplicate mass is still caught; a dup pair hiding entirely among late
    * ids is the traded recall. The rank pass is a per-cell sort — O(n log n)
    * on the mega-cell where the unguarded join was O(n²).
    */
  def semanticDedup(embeddings: DataFrame, threshold: Double, nClusters: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    maxCellCompare: Int = 10000): DataFrame = {
    val slim = embeddings.select(col(idCol), col(vecCol))
    val withCell =
      if (nClusters <= 1) slim.withColumn("__cell", lit(0))
      else {
        // deterministic centroid sample — smallest nClusters id-hashes (one
        // distributed TakeOrdered; no RNG, no count() pre-action)
        val cents = slim.orderBy(xxhash64(col(idCol)), col(idCol))
          .limit(nClusters).collect()
        val cvecs: Array[Array[Double]] = cents.map(_.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
          case other => other.toString.toDouble
        }.toArray)
        slim.withColumn("__cell",
          graft.functions.HashExpressions.nearest_centroid(col(vecCol), cvecs))
      }
    val ranked = withCell.withColumn("__rk",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__cell"))
          .orderBy(col(idCol))))
    val a = ranked.filter(col("__rk") <= maxCellCompare)
      .select(col("__cell"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = withCell.select(col("__cell"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    // pair join keyed on the cell: shuffle partitions by cluster, pairs only
    // within a cluster; round-4 cosine so the threshold compare is
    // oracle-portable (float sum order can differ across engines at ulp scale)
    val dropped = a.join(b, "__cell")
      .filter(col("id_a") < col("id_b"))
      .withColumn("__cos", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("__cos") >= threshold)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("__dropped", lit(true))
    slim.select(col(idCol))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("__dropped").isNull.as("kept"))
  }

  /** Per-group centroid of an embedding column, long form `(group, pos, centroid_v,
    * n)` — the k-means update step / SemDeDup centroid refinement / per-class mean
    * embedding. posexplode + hash aggregation: partial (map-side) sums per
    * (group, dimension), one shuffle of |groups|·dim rows regardless of corpus
    * size. Values are µ-rounded so the result is comparable across engines
    * despite float summation order.
    */
  def labelCentroids(df: DataFrame, groupCol: String,
                     vecCol: String = "embedding"): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .groupBy(col(groupCol), col("pos").cast("long").as("pos"))
      // floor(x*1e5+0.5)/1e5, not round(x,5): round is HALF_UP away from zero
      // for negatives, which disagrees with the oracle's floor form
      .agg((floor(avg(col("__v").cast("double")) * lit(100000.0) + lit(0.5))
          / lit(100000.0)).as("centroid_v"),
        count(lit(1)).as("n"))

  /** Spherical k-means TRAINING (Lloyd's iterations with cosine assignment —
    * the algorithm that produces real IVF centroids and the cluster structure
    * SemDeDup / cluster-balanced sampling consume; until now centroids were
    * deterministic SAMPLES, never trained).
    *
    * Deterministic end to end, both engines:
    *  - init: the `k` smallest-id vectors, cluster = 0-based id rank;
    *  - assign: max-cosine centroid, ties to the LOWEST cluster index — the
    *    [[graft.functions.HashExpressions.NearestCentroid]] strict-`>` argmax,
    *    ONE imperative map-side pass inside the scan stage (the crossJoin +
    *    window argmax alternative shuffles |corpus|·k rows — that shape is
    *    exactly what the DuckDB oracle replays, which is the contrast the
    *    oracle exists to verify);
    *  - update: per-dimension mean of the assigned vectors, µ-rounded
    *    (floor(x·1e6+0.5)/1e6) so both engines feed bit-identical centroids
    *    into the next round — without the rounding, cross-engine low-bit sum
    *    drift compounds per iteration. Clusters that lose every point carry
    *    their previous centroid forward.
    *
    * Scale shape: each iteration is one linear corpus scan (map-side argmax)
    * + one (cluster,dim)-keyed aggregation; only k·dim means ever reach the
    * driver (they must — next round's assignment expression ships them).
    * Nothing is quadratic; iterations are a small constant.
    *
    * Output: (idCol, cluster: long, cosine: double@4dp) — final assignment
    * against the post-`iters` centroids, with the point→centroid cosine.
    */
  def kmeansTrain(embeddings: DataFrame, k: Int, iters: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val spark = embeddings.sparkSession
    val pts = embeddings.select(col(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val initRows = pts.orderBy(col(idCol)).limit(k).collect()
    require(initRows.length == k, s"k=$k exceeds corpus size ${initRows.length}")
    val cents = lloydRefine(pts, initRows.map(_.getSeq[Double](1).toArray), iters)
    import spark.implicits._
    val centDf = cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("cluster", "__cv")
    pts
      .withColumn("cluster", graft.functions.HashExpressions.nearest_centroid(col("__v"), cents))
      .join(broadcast(centDf), "cluster")
      .withColumn("cosine",
        floor(graft.functions.HashExpressions.cosine_sim(col("__v"), col("__cv")) * 1e4 + lit(0.5)) / 1e4)
      .select(col(idCol), col("cluster").cast("long").as("cluster"), col("cosine"))
  }

  /** The Lloyd iteration loop shared by [[kmeansTrain]] and
    * [[IvfIndex.build]]'s centroid refinement: assign map-side (max-cosine
    * argmax), update as µ-rounded per-dimension means, carry empty clusters
    * forward. `pts` must be (id, array<double>) with the vector at ordinal 1.
    */
  private[sim] def lloydRefine(pts: DataFrame, init: Array[Array[Double]],
                               iters: Int): Array[Array[Double]] = {
    val micro6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    var cents = init
    var it = 0
    while (it < iters) {
      val means = pts
        .withColumn("__c",
          graft.functions.HashExpressions.nearest_centroid(col(pts.columns(1)), cents))
        .select(col("__c"), posexplode(col(pts.columns(1))).as(Seq("__pos", "__x")))
        .groupBy("__c", "__pos").agg(avg("__x").as("__m"))
        .collect() // bounded: k·dim rows — the next round's expression needs them
      val next = cents.map(_.clone()) // empty clusters carry forward
      means.foreach { r => next(r.getInt(0))(r.getInt(1)) = micro6(r.getDouble(2)) }
      cents = next
      it += 1
    }
    cents
  }

  /** DuckDB oracle for [[kmeansTrain]]: the identical Lloyd loop unrolled as a
    * materialized-CTE chain (the bpeTrainOracleSql pattern) — per round one
    * |pts|·k grouped-cosine assignment (the shuffle-heavy shape the engine
    * side deliberately avoids) and one µ-rounded per-dimension mean with
    * empty-cluster carry-forward. MATERIALIZED is load-bearing: each round
    * reads the previous centroids twice, and inlined CTEs re-evaluate the
    * whole chain exponentially.
    */
  def kmeansOracleSql(k: Int, iters: Int, table: String = "embeddings",
                      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    def assignBody(prev: String): String =
      s"""SELECT $idCol, cluster, cos FROM (
         |  SELECT $idCol, cluster, cos,
         |    row_number() OVER (PARTITION BY $idCol ORDER BY cos DESC, cluster) AS rn
         |  FROM (
         |    SELECT p.$idCol, c.cluster,
         |      sum(p.val * c.cval) / (min(n.pn) * sqrt(sum(c.cval * c.cval))) AS cos
         |    FROM pts p JOIN $prev c ON c.pos = p.pos
         |    JOIN pnorm n ON n.$idCol = p.$idCol
         |    GROUP BY p.$idCol, c.cluster)) WHERE rn = 1""".stripMargin
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "c0" else s"c${i - 1}"
      s"""a$i AS MATERIALIZED (${assignBody(prev)}
         |),
         |c$i AS MATERIALIZED (
         |  SELECT a.cluster, p.pos, floor(avg(p.val) * 1e6 + 0.5) / 1e6 AS cval
         |  FROM a$i a JOIN pts p ON p.$idCol = a.$idCol
         |  GROUP BY a.cluster, p.pos
         |  UNION ALL
         |  SELECT cluster, pos, cval FROM $prev
         |  WHERE cluster NOT IN (SELECT DISTINCT cluster FROM a$i))""".stripMargin
    }
    val roundsSql = if (rounds.isEmpty) "" else rounds.mkString(",\n") + ","
    s"""WITH pts AS MATERIALIZED (
       |  SELECT $idCol, unnest(range(0, len($vecCol))) AS pos,
       |         CAST(unnest($vecCol) AS DOUBLE) AS val
       |  FROM $table),
       |pnorm AS MATERIALIZED (
       |  SELECT $idCol, sqrt(sum(val * val)) AS pn FROM pts GROUP BY $idCol),
       |init AS (
       |  SELECT $idCol, row_number() OVER (ORDER BY $idCol) - 1 AS cluster
       |  FROM (SELECT DISTINCT $idCol FROM pts ORDER BY $idCol LIMIT $k)),
       |c0 AS MATERIALIZED (
       |  SELECT i.cluster, p.pos, p.val AS cval
       |  FROM init i JOIN pts p ON p.$idCol = i.$idCol),
       |$roundsSql
       |final_assign AS (${assignBody(s"c$iters")})
       |SELECT $idCol, CAST(cluster AS BIGINT) AS cluster,
       |       floor(cos * 1e4 + 0.5) / 1e4 AS cosine
       |FROM final_assign ORDER BY $idCol""".stripMargin
  }

  /** Cluster-balanced deterministic sample over [[kmeansTrain]] assignments:
    * at most `perCluster` members per cluster, chosen by engine-portable
    * md5-of-id order (the q_doc_split_hash idiom — reproducible across runs,
    * engines, and partitionings; xxhash64 would be Spark-only). The curation
    * step trained clusters exist for: caps over-represented regions of the
    * embedding space instead of over-represented SOURCES (the per-source-cap
    * operator's blind spot). One window per cluster — a per-cluster sort of
    * cluster-sized groups, never a global sort.
    */
  def clusterBalancedSample(assignments: DataFrame, perCluster: Int,
                            idCol: String = "vec_id"): DataFrame = {
    val w = Window.partitionBy("cluster")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    assignments
      .withColumn("samp_rank", row_number().over(w).cast("long"))
      .filter(col("samp_rank") <= perCluster)
      .select(col(idCol), col("cluster"), col("samp_rank"))
  }

  /** DuckDB oracle for [[kmeansTrain]] ∘ [[clusterBalancedSample]]: the kmeans
    * CTE chain with the sampling window as the final select.
    */
  def kmeansSampleOracleSql(k: Int, iters: Int, perCluster: Int,
                            table: String = "embeddings", idCol: String = "vec_id",
                            vecCol: String = "embedding"): String = {
    val base = kmeansOracleSql(k, iters, table, idCol, vecCol)
    val marker = s"SELECT $idCol, CAST(cluster AS BIGINT) AS cluster"
    require(base.contains(marker), "kmeansOracleSql final-select shape changed")
    base.substring(0, base.indexOf(marker)) +
      s"""SELECT $idCol, cluster, samp_rank FROM (
         |  SELECT $idCol, CAST(cluster AS BIGINT) AS cluster,
         |    row_number() OVER (PARTITION BY cluster
         |      ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol) AS samp_rank
         |  FROM final_assign)
         |WHERE samp_rank <= $perCluster
         |ORDER BY cluster, samp_rank""".stripMargin
  }

  /** Embedding near-duplicate pairs: LSH-bucket self-join then exact cosine filter.
    * Same shuffle shape as MinHash-LSH dedup — proportional to collisions, not n².
    */
  def cosineNearDupPairs(embeddings: DataFrame,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         threshold: Double = 0.95,
                         numPlanes: Int = 12, tables: Int = 4): DataFrame = {
    val sigs = (0 until tables).map { t =>
      embeddings.select(col(idCol), col(vecCol),
        hyperplaneSignature(col(vecCol), numPlanes, t).as("sig"), lit(t).as("tbl"))
    }.reduce(_ unionAll _)
    val l = sigs.select(col("tbl"), col("sig"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val r = sigs.select(col("tbl"), col("sig"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    l.join(r, Seq("tbl", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "vec_a", "vec_b").distinct()
      .withColumn("cosine", round(cosine(col("vec_a"), col("vec_b")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998) — the
    * diversity re-ranker RAG retrieval and curation pipelines run over an ANN
    * candidate list: greedily pick argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s),
    * so near-duplicate candidates can't crowd the result. Query = the corpus
    * vector `queryId` (excluded from candidates).
    *
    * Determinism: rel and pairwise sims are µ6-quantized cosines; λ is
    * required binary-exact (0.5, 0.25, …) so each round's score is one exact
    * IEEE expression over quantized values — no further rounding needed; ties
    * break on id. The first pick's score is λ·rel (max over the empty
    * selected set is 0).
    *
    * Scale shape: the candidate pool is top-`pool` by cosine (TakeOrdered);
    * each greedy round is one bounded join (candidates × selected-so-far ≤
    * pool·k rows) + one 1-row argmax collect — the driver holds only the
    * picked ids, never the vectors. Output: (sel_rank, idCol, mmr_score).
    */
  def mmrSelect(corpus: DataFrame, queryId: Long, pool: Int, k: Int,
                lam: Double = 0.5, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && pool >= k, "need pool >= k >= 1")
    // r13 (VERDICT r12 #5): the greedy runs on the driver over pool + pool²
    // collected rows — bounded by the PARAMETER, but a caller passing a huge
    // pool would collect pool² pair rows to the driver (pool=50k → 2.5G rows).
    // Cap where the driver-side table stays comfortably in tens of MB; a
    // larger pool needs the per-pick Spark-job formulation instead.
    require(pool <= 2048,
      s"pool=$pool collects pool^2 pair rows to the driver — cap is 2048")
    val spark = corpus.sparkSession
    import spark.implicits._
    val micro = (c: Column) => floor(c * 1e6 + 0.5) / 1e6
    val q = corpus.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    val cand = corpus.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), col(vecCol), micro(cosine(col(vecCol), col("__qv"))).as("rel"))
      .orderBy(col("rel").desc, col(idCol)).limit(pool)
      .cutLineage()
    // pairwise sims among the pool (pool² bounded rows, computed once)
    val l = cand.select(col(idCol).as("__a"), col(vecCol).as("__va"))
    val r = cand.select(col(idCol).as("__b"), col(vecCol).as("__vb"))
    val pairs = l.join(r, col("__a") =!= col("__b"))
      .select(col("__a"), col("__b"), micro(cosine(col("__va"), col("__vb"))).as("__sim"))
    // r12 (guide §1.2): the greedy itself runs on the DRIVER over the two
    // collected tables — `pool` rows + pool·(pool−1) pairs, bounded by the
    // PARAMETER, never the corpus (the dsirSelect bucketRows discipline).
    // The old loop paid one Spark job (plan + schedule + collect) per pick.
    // Cosines/rels are the collected µ6-rounded values from the SAME
    // expressions as before, and the score arithmetic below is the identical
    // IEEE expression tree (λ·rel − (1−λ)·maxSim, ties by id) — bit-identical
    // picks (oracle-gated).
    val candRows = cand.select(col(idCol), col("rel")).collect()
      .map(r0 => (r0.getLong(0), r0.getDouble(1)))
    val simRows = pairs.collect()
      .map(r0 => ((r0.getLong(0), r0.getLong(1)), r0.getDouble(2)))
      .toMap
    val oneMinusLam = 1.0 - lam
    var selected = List.empty[(Long, Double)] // (id, score), pick order
    var round = 0
    while (round < k) {
      val sel = selected.map(_._1)
      val scored =
        if (sel.isEmpty) candRows.map { case (id, rel) => (id, lam * rel) }
        else candRows.filterNot(c => sel.contains(c._1)).flatMap { case (id, rel) =>
          // max over the selected set's pair sims — pairs exist for every
          // distinct (a, b) in the pool, so the flatMap never drops a cand
          val ms = sel.flatMap(s => simRows.get((id, s)))
          if (ms.isEmpty) None else Some((id, lam * rel - oneMinusLam * ms.max))
        }
      val pick = scored.minBy { case (id, score) => (-score, id) }
      selected = selected :+ pick
      round += 1
    }
    selected.zipWithIndex
      .map { case ((id, sc), i) => (i + 1L, id, sc) }
      .toDF("sel_rank", idCol, "mmr_score")
  }

  /** DuckDB oracle for [[mmrSelect]]: identical µ6 cosines and the identical
    * greedy unrolled as k materialized pick CTEs (each round's argmax joins
    * the union of the prior picks).
    */
  def mmrOracleSql(queryId: Long, pool: Int, k: Int, lam: Double = 0.5,
                   table: String = "embeddings", idCol: String = "vec_id",
                   vecCol: String = "embedding"): String = {
    def selUnion(r: Int) = (1 to r).map(i => s"SELECT $idCol FROM p$i").mkString(" UNION ALL ")
    val picks = (2 to k).map { r =>
      s"""p$r AS MATERIALIZED (
         |  SELECT c.$idCol, $lam * c.rel - ${1.0 - lam} * max(p.sim) AS score
         |  FROM cand c JOIN pairs p ON p.a = c.$idCol
         |  WHERE p.b IN (${selUnion(r - 1)})
         |    AND c.$idCol NOT IN (${selUnion(r - 1)})
         |  GROUP BY c.$idCol, c.rel
         |  ORDER BY score DESC, c.$idCol LIMIT 1)""".stripMargin
    }
    val out = (1 to k).map(r =>
      s"SELECT CAST($r AS BIGINT) AS sel_rank, $idCol, score AS mmr_score FROM p$r")
      .mkString("\nUNION ALL\n")
    s"""WITH pts AS MATERIALIZED (
       |  SELECT $idCol, unnest(range(0, len($vecCol))) AS pos,
       |         CAST(unnest($vecCol) AS DOUBLE) AS val FROM $table),
       |nrm AS MATERIALIZED (
       |  SELECT $idCol, sqrt(sum(val * val)) AS n FROM pts GROUP BY $idCol),
       |cand AS MATERIALIZED (
       |  SELECT c.$idCol,
       |    floor(sum(c.val * q.val) / (min(cn.n) * min(qn.n)) * 1e6 + 0.5) / 1e6 AS rel
       |  FROM pts c
       |  JOIN pts q ON q.$idCol = $queryId AND q.pos = c.pos
       |  JOIN nrm cn ON cn.$idCol = c.$idCol
       |  JOIN nrm qn ON qn.$idCol = $queryId
       |  WHERE c.$idCol <> $queryId
       |  GROUP BY c.$idCol
       |  ORDER BY rel DESC, c.$idCol LIMIT $pool),
       |pairs AS MATERIALIZED (
       |  SELECT a.$idCol AS a, b.$idCol AS b,
       |    floor(sum(pa.val * pb.val) / (min(na.n) * min(nb.n)) * 1e6 + 0.5) / 1e6 AS sim
       |  FROM cand a JOIN cand b ON a.$idCol <> b.$idCol
       |  JOIN pts pa ON pa.$idCol = a.$idCol
       |  JOIN pts pb ON pb.$idCol = b.$idCol AND pb.pos = pa.pos
       |  JOIN nrm na ON na.$idCol = a.$idCol
       |  JOIN nrm nb ON nb.$idCol = b.$idCol
       |  GROUP BY a.$idCol, b.$idCol),
       |p1 AS MATERIALIZED (
       |  SELECT $idCol, $lam * rel AS score FROM cand
       |  ORDER BY score DESC, $idCol LIMIT 1),
       |${picks.mkString(",\n")}
       |$out
       |ORDER BY sel_rank""".stripMargin
  }

  /** Deterministic ±1 Johnson-Lindenstrauss sign matrix [outDim][inDim]:
    * sign(j→i) = parity of the 60-bit md5 prefix of "j_i" — the same md5 the
    * portable-hash samplers use, so a SQL oracle regenerates the identical
    * matrix with string md5 alone (no RNG, no engine-private seed).
    */
  def rpSigns(inDim: Int, outDim: Int): Array[Array[Int]] =
    Array.tabulate(outDim) { i =>
      Array.tabulate(inDim) { j =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${j}_$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        if (java.lang.Long.parseLong(md.take(15), 16) % 2 == 0) 1 else -1
      }
    }

  /** Random projection (Achlioptas ±1 JL transform) to `outDim` dims — the
    * cheap dimensionality cut upstream of clustering/ANN when 64-768-dim
    * vectors are too fat to shuffle: inputs are quantized to integer MICRO
    * units and each output dim is an EXACT BIGINT signed sum (zip_with over
    * the literal sign row — order-independent, bit-identical in any engine).
    * Output: (idCol, rp_micro array<long>, rp array<double> = micro/1e6).
    * Map-side only — zero shuffle at any scale.
    */
  def rpProject(embeddings: DataFrame, outDim: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val inDim = embeddings.select(size(col(vecCol))).first().getInt(0)
    val signs = rpSigns(inDim, outDim)
    // NULL vectors are dropped, not projected to NULL: the SQL-oracle form
    // (unnest) emits no rows for them, and a null projection is useless to
    // every downstream consumer anyway
    val nonNull = embeddings.filter(col(vecCol).isNotNull)
    val qv = transform(col(vecCol), x => floor(x.cast("double") * 1e6 + 0.5).cast("long"))
    val micro = array(signs.map { row =>
      aggregate(zip_with(qv, lit(row), (x, s) => x * s.cast("long")),
        lit(0L), (acc, x) => acc + x)
    }.toIndexedSeq: _*)
    nonNull.select(col(idCol), micro.as("rp_micro"),
      transform(micro, x => x.cast("double") / 1e6).as("rp"))
  }

  /** DuckDB oracle for [[rpProject]] fingerprint form: identical md5-parity
    * signs, micro quantization, and exact signed sums; dims content-verified
    * via an ordered md5 over the micro values.
    */
  def rpOracleSql(outDim: Int, table: String = "embeddings",
                  idCol: String = "vec_id", vecCol: String = "embedding"): String =
    s"""WITH pts AS MATERIALIZED (
       |  SELECT $idCol, unnest(range(0, len($vecCol))) AS j,
       |    CAST(floor(CAST(unnest($vecCol) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS qv
       |  FROM $table),
       |signs AS MATERIALIZED (
       |  SELECT j, i,
       |    CASE WHEN ('0x' || substring(md5(j || '_' || i), 1, 15))::BIGINT % 2 = 0
       |         THEN 1 ELSE -1 END AS s
       |  FROM (SELECT DISTINCT j FROM pts), (SELECT unnest(range(0, $outDim)) AS i)),
       |proj AS (
       |  SELECT p.$idCol, g.i, sum(p.qv * g.s) AS sm
       |  FROM pts p JOIN signs g USING (j)
       |  GROUP BY p.$idCol, g.i)
       |SELECT $idCol,
       |  substring(md5(string_agg(sm, '|' ORDER BY i)), 1, 16) AS rp_hash,
       |  CAST(max(CASE WHEN i = 0 THEN sm END) AS DOUBLE) / 1e6 AS rp0,
       |  CAST(max(CASE WHEN i = 1 THEN sm END) AS DOUBLE) / 1e6 AS rp1
       |FROM proj GROUP BY $idCol ORDER BY $idCol""".stripMargin
}
