package graft.streaming

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
}
