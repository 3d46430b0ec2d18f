package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media row: opaque bytes + typed metadata. The Spark-side plumbing (schema,
  * partitioning, batch shape) is real; the actual codec calls are STUBBED behind
  * deterministic fakes because image/audio libraries are not in this container —
  * each stub is clearly marked and isolated so a real decoder drops in per-function.
  */
final case class MediaRecord(
    media_id: Long,
    modality: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    mime_type: String,
    width: Int, // images/video: pixels; audio: 0
    height: Int,
    duration_ms: Long, // audio/video; images: 0
    sample_rate: Int) // audio; else 0

final case class MediaFeature(
    media_id: Long,
    modality: String,
    n_bytes: Long,
    checksum: Long,
    feature: Array[Float])

/** Multimodal-column operators. Binary payloads are first-class `binary` columns;
  * transforms run as `mapPartitions` over typed Datasets (the Scala analogue of
  * `mapInPandas`: one iterator of records per partition → vectorizable batch work),
  * so at 100 TB each partition decodes independently with zero shuffle.
  */
object Multimodal {

  /** ---- STUB ---- Real impl would decode the image bytes (JPEG/PNG) and return
    * pixel data. Deterministic fake: derives a pseudo-pixel buffer from a rolling
    * hash of the payload. Signature and batch shape are what a real decoder needs.
    */
  private def stubDecodeImage(payload: Array[Byte], w: Int, h: Int): Array[Float] = {
    var acc = 1125899906842597L
    var i = 0
    while (i < payload.length) { acc = acc * 31 + payload(i); i += 1 }
    Array.tabulate(8)(j => ((acc >>> (j * 8)) & 0xFF).toFloat / 255f)
  }

  /** ---- STUB ---- Real impl: resample audio + extract e.g. mel features. */
  private def stubAudioFeatures(payload: Array[Byte], sampleRate: Int): Array[Float] =
    stubDecodeImage(payload, 0, 0)

  /** ---- STUB ---- Real impl: sample `n` frames at uniform timestamps. */
  private def stubFrameSample(payload: Array[Byte], durationMs: Long, n: Int): Seq[Array[Float]] =
    (0 until n).map(i => stubDecodeImage(payload :+ i.toByte, 0, 0))

  /** Wrap a documents-like table into media records (payload = utf8 bytes) — the
    * deterministic stand-in corpus used by tests and the verify gate.
    */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      col("text").cast("binary").as("payload"),
      // byte length is METADATA, computed once at wrap/ingest time: stats-only
      // queries must never have to scan the payload bytes to learn their size
      octet_length(col("text").cast("binary")).cast("long").as("payload_bytes"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime_type"),
      lit(64).as("width"), lit(64).as("height"),
      (col("n_chars") * 10).as("duration_ms"),
      lit(16000).as("sample_rate"))

  /** Per-partition feature extraction: the distributed skeleton a real decoder
    * plugs into. Partition count is preserved. Records are processed in
    * `batchSize` groups — the explicit batch shape a vectorized decoder (or an
    * accelerator round-trip) needs, same contract as pandas-UDF Arrow batches:
    * a real impl decodes the whole group in one call instead of per-row.
    */
  def extractFeatures(media: Dataset[MediaRecord],
                      batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // ---- a real decoder processes `batch` as ONE vectorized call ----
        batch.map { m =>
          val feat = m.modality match {
            case "image" => stubDecodeImage(m.payload, m.width, m.height)
            case "audio" => stubAudioFeatures(m.payload, m.sample_rate)
            case _ => stubFrameSample(m.payload, m.duration_ms, 4).flatten.toArray
          }
          var crc = 0L
          var i = 0
          while (i < m.payload.length) { crc = crc * 31 + m.payload(i); i += 1 }
          MediaFeature(m.media_id, m.modality, m.payload.length.toLong, crc, feat)
        }
      }
    }
  }

  /** ---- STUB decode, REAL plumbing ---- Resize pass: payload → payload with
    * updated dimension metadata, batched like extractFeatures. A real impl
    * re-encodes pixels; the stub truncates/pads the byte budget
    * deterministically (w·h/8 bytes) so sizes behave like a real downscale.
    */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int,
                   batchSize: Int = 64): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          if (m.modality != "image") m
          else {
            val budget = math.max(1, w * h / 8)
            val resized =
              if (m.payload.length >= budget) m.payload.take(budget)
              else m.payload ++ Array.fill[Byte](budget - m.payload.length)(0)
            m.copy(payload = resized, width = w, height = h)
          }
        }
      }
    }
  }

  /** REAL logic (no codec needed): uniform frame-sample timestamps for a video
    * of `durationMs` — the schedule a real frame extractor seeks to. n points
    * at the centers of n equal sub-intervals (never 0 or durationMs exactly,
    * avoiding first/last-frame edge effects).
    */
  def frameTimestampsMs(durationMs: Long, n: Int): Seq[Long] = {
    require(n > 0, "need at least one frame")
    (0 until n).map(i => durationMs * (2 * i + 1) / (2 * n))
  }

  /** Metadata-only stats over a media table — pure column ops (no decode), the query
    * that should NEVER touch payload bytes at scale (column pruning keeps the scan to
    * the metadata columns; verify with .explain ReadSchema).
    */
  def mediaStats(media: DataFrame): DataFrame = {
    // prefer the payload_bytes metadata column: the aggregation then never
    // references the binary payload, so column pruning keeps it OUT of the
    // scan entirely (asserted by the ReadSchema spec) — at 100 TB this is a
    // stats query over longs, not a full read of every stored object
    val bytes =
      if (media.columns.contains("payload_bytes")) col("payload_bytes")
      else octet_length(col("payload")).cast("long")
    media.groupBy("modality", "mime_type")
      .agg(
        count(lit(1)).as("n"),
        sum(bytes).as("total_bytes"),
        round(avg(bytes), 4).as("avg_bytes"),
        max(col("duration_ms")).as("max_duration_ms"))
  }
}
