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
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime_type"),
      lit(64).as("width"), lit(64).as("height"),
      (col("n_chars") * 10).as("duration_ms"),
      lit(16000).as("sample_rate"))

  /** Per-partition feature extraction: the distributed skeleton a real decoder plugs
    * into. Partition count is preserved; each task handles an iterator batch.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
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

  /** Metadata-only stats over a media table — pure column ops (no decode), the query
    * that should NEVER touch payload bytes at scale (column pruning keeps the scan to
    * the metadata columns; verify with .explain ReadSchema).
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy("modality", "mime_type")
      .agg(
        count(lit(1)).as("n"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        round(avg(octet_length(col("payload"))), 4).as("avg_bytes"),
        max(col("duration_ms")).as("max_duration_ms"))
}
