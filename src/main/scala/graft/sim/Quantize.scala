package graft.sim

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
}
