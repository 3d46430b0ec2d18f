package graft.streaming

import graft.util.Checkpoints.CheckpointOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the ingest-time guard of a training-data pipeline:
  * drop exact duplicates AS documents arrive, instead of re-running batch dedup
  * over the accumulated corpus.
  *
  *  - [[exactDedupStream]]: first occurrence per normalized-text fingerprint
  *    wins; `dropDuplicatesWithinWatermark` keys state on the fingerprint and
  *    EXPIRES it once the watermark passes — state is bounded by the dedup
  *    horizon, not corpus lifetime (the property that keeps this runnable
  *    forever; global-history dedup belongs to the batch path,
  *    [[graft.dedup.Dedup.incrementalExactDedup]]).
  *  - [[dedupAgainstCorpus]]: stream-static anti-join against the existing
  *    corpus fingerprint set (static side broadcast when small, re-read per
  *    micro-batch otherwise) — new docs that already exist in the warehouse
  *    never reach the sink.
  *
  * Both compose: `dedupAgainstCorpus(exactDedupStream(s, ...), fps)` gives
  * "new, unseen within the horizon, and not already ingested".
  */
object StreamingDedup {

  /** Exact within-stream dedup, first-wins per fingerprint inside the
    * `delay` watermark horizon. `eventTimeCol` must be a timestamp column.
    */
  def exactDedupStream(docs: DataFrame, textCol: String = "text",
                       eventTimeCol: String = "event_time",
                       delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__fp", graft.text.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Drop stream rows whose fingerprint exists in `corpusFingerprints` (one
    * column, any name — typically the persisted output of batch ingest).
    */
  def dedupAgainstCorpus(stream: DataFrame, corpusFingerprints: DataFrame,
                         textCol: String = "text"): DataFrame = {
    val seen = corpusFingerprints.toDF("__fp").distinct()
    stream
      .withColumn("__fp", graft.text.TextFunctions.fingerprint(col(textCol)))
      .join(seen, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Streaming NEAR-dup ingest — the end-to-end LLM-ingest shape the batch
    * pieces were built for (r8 directive #7): every micro-batch probes the
    * MATERIALIZED MinHash-LSH index ([[graft.dedup.MinHashIndex]]), near-dup
    * rows are dropped, and survivors are appended to BOTH the corpus table
    * and the index — so batch N+1 deduplicates against batch N's survivors
    * without ever re-LSHing the corpus.
    *
    * Drop contract (deterministic, pinned by the spec): a doc is dropped iff
    * it is a near-dup (Jaccard ≥ threshold) of an ALREADY-INDEXED corpus doc,
    * OR of a smaller-id doc in its own micro-batch (first-wins by id — same
    * rule at any batch boundary, which is what makes the stream output equal
    * the batch-incremental replay of the same splits). Note this is pairwise
    * against accepted docs, not the strict one-at-a-time chain: a doc dropped
    * for matching corpus does NOT shield its own within-batch near-dups.
    *
    * Replay-safe: foreachBatch is at-least-once, so the batch body anti-joins
    * accepted docs against corpus ids before the append, and the index's own
    * doc_id guard skips re-appends — a replayed micro-batch is a no-op.
    *
    * Scale shape: probe I/O is partition-pruned to the batch's band keys
    * (never a corpus scan); within-batch pairing is batch-sized LSH; the two
    * appends are batch-sized. State lives in the index files, not executor
    * memory — the streaming query itself is stateless.
    */
  def nearDupIngestStream(stream: DataFrame, indexRoot: String, corpusPath: String,
                          checkpointDir: String, threshold: Double = 0.7,
                          textCol: String = "text", idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        nearDupIngestBatch(b, indexRoot, corpusPath, threshold, textCol, idCol)
        ()
      }
      .start()

  /** One micro-batch of [[nearDupIngestStream]] — also the BATCH-incremental
    * reference path (call it per split to replay a stream's work exactly).
    * Returns the number of newly accepted (appended) docs.
    */
  def nearDupIngestBatch(batch: DataFrame, indexRoot: String, corpusPath: String,
                         threshold: Double = 0.7,
                         textCol: String = "text", idCol: String = "doc_id"): Long = {
    import graft.dedup.{Dedup, MinHashIndex}
    val spark = batch.sparkSession
    if (batch.isEmpty) return 0L
    val b = batch.cutLineage(true)
    val corpus = readCorpus(spark, corpusPath, b.schema)
    val dupVsCorpus = MinHashIndex
      .probe(spark, indexRoot, b, corpus, threshold, textCol, idCol)
      .select(col("batch_id").as(idCol)).distinct()
    val dupWithin = Dedup
      .minhashNearDupPairs(b, textCol, idCol, threshold = threshold)
      .select(col("id_b").as(idCol)).distinct() // (id_a < id_b) ⇒ first wins
    val accepted = b
      .join(dupVsCorpus, Seq(idCol), "left_anti")
      .join(dupWithin, Seq(idCol), "left_anti")
    // replay idempotence: a doc already appended by a previous (possibly
    // retried) run of this same micro-batch is skipped on both sinks
    val fresh = accepted
      .join(corpus.select(col(idCol)), Seq(idCol), "left_anti")
      .cutLineage(true)
    val n = fresh.count()
    if (n > 0) {
      fresh.write.mode("append").parquet(corpusPath)
      MinHashIndex.append(fresh, indexRoot, textCol, idCol)
    }
    n
  }

  /** Corpus read that tolerates the pre-first-batch state: an absent path is
    * an empty corpus (checked through the path's own Hadoop FS so s3a/hdfs
    * roots behave like local ones — the MinHashIndex.pruned discipline).
    */
  private def readCorpus(spark: org.apache.spark.sql.SparkSession,
                         corpusPath: String,
                         schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val hp = new org.apache.hadoop.fs.Path(corpusPath)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(hp)) spark.read.schema(schema).parquet(corpusPath)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
