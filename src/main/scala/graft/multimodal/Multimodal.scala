package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media row: opaque bytes + typed metadata. The Spark-side plumbing (schema,
  * partitioning, batch shape) is real. Image (PNG/JPEG), audio (WAV) AND video
  * (MJPEG-in-AVI, via [[AviMjpeg]]) decode are REAL — `javax.imageio` /
  * `javax.sound.sampled` plus a pure byte-walk RIFF parser, all JDK built-ins, no
  * external codec libraries. MP4/H.264 specifically has no JDK codec and routes to
  * the deterministic fallback (documented exclusion). Payloads that fail to decode
  * (corrupt objects are a fact of life in a 100 TB lake) fall back to a
  * deterministic content-hash feature with feature[0] = 0 marking the failure —
  * the pipeline never throws, mirroring production quarantine-not-crash handling.
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

  /** Deterministic content-hash feature — the fallback for undecodable payloads
    * (feature[0] = 0 marks it) and the frame stand-in for the video stub.
    */
  private def hashFeature(payload: Array[Byte]): Array[Float] = {
    var acc = 1125899906842597L
    var i = 0
    while (i < payload.length) { acc = acc * 31 + payload(i); i += 1 }
    val f = Array.tabulate(8)(j => ((acc >>> (j * 8)) & 0xFF).toFloat / 255f)
    f(0) = 0f // decoded flag: 0 = fallback
    f
  }

  /** REAL image decode via the JDK's built-in PNG/JPEG/GIF/BMP readers.
    * 8-float feature: [1, width, height, meanR, meanG, meanB, meanLuma, aspect] —
    * the per-image summary a dedup/quality pass keys on. None if the bytes
    * aren't a decodable image.
    */
  private[multimodal] def decodeImageFeatures(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var (r, g, b) = (0.0, 0.0, 0.0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
            x += 1
          }
          y += 1
        }
        val n = (w * h).toDouble
        val (mr, mg, mb) = (r / n / 255.0, g / n / 255.0, b / n / 255.0)
        val luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
        Some(Array(1f, w.toFloat, h.toFloat, mr.toFloat, mg.toFloat, mb.toFloat,
          luma.toFloat, (w.toDouble / h).toFloat))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL WAV decode via the JDK's javax.sound.sampled. 8-float feature:
    * [1, channels, sampleRate, nFrames, meanAmp, rms, peak, zeroCrossingRate]
    * over 16-bit PCM samples normalized to [-1, 1]. None if not decodable WAV.
    */
  private[multimodal] def decodeAudioFeatures(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) return None // 16-bit PCM only
        val bytes = in.readAllBytes()
        val big = fmt.isBigEndian
        val n = bytes.length / 2
        if (n == 0) return None
        var sum = 0.0; var sq = 0.0; var peak = 0.0; var crossings = 0
        var prevSign = 0
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i + (if (big) 1 else 0)) & 0xFF
          val hi = bytes(2 * i + (if (big) 0 else 1)).toInt
          val s = ((hi << 8) | lo) / 32768.0
          sum += s; sq += s * s
          if (math.abs(s) > peak) peak = math.abs(s)
          val sign = if (s > 0) 1 else if (s < 0) -1 else 0
          if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
          if (sign != 0) prevSign = sign
          i += 1
        }
        Some(Array(1f, fmt.getChannels.toFloat, fmt.getSampleRate,
          (n / fmt.getChannels).toFloat, (sum / n).toFloat,
          math.sqrt(sq / n).toFloat, peak.toFloat, (crossings.toDouble / n).toFloat))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL video decode for MJPEG-in-AVI (the JDK-decodable container — every frame
    * chunk is a complete JPEG): parse the RIFF tree, sample `n` frames at the
    * centers of n equal sub-intervals of the frame list (the [[frameTimestampsMs]]
    * schedule applied to frame indexes), decode each with ImageIO, and emit the
    * per-frame image features flattened (n × 8 floats). None unless the payload is
    * an AVI and ALL sampled frames decode — a half-readable file falls back to the
    * hash feature rather than yielding a variable-length vector. MP4/H.264 has no
    * JDK codec and is handled by the fallback path (documented in COVERAGE.md).
    */
  private[multimodal] def decodeVideoFeatures(payload: Array[Byte], n: Int): Option[Array[Float]] =
    AviMjpeg.parse(payload).flatMap { avi =>
      val total = avi.frameChunks.length
      val idxs = (0 until n).map(i => math.min((2 * i + 1) * total / (2 * n), total - 1))
      val perFrame = idxs.map { ix =>
        val (off, len) = avi.frameChunks(ix)
        decodeImageFeatures(java.util.Arrays.copyOfRange(payload, off, off + len))
      }
      if (perFrame.exists(_.isEmpty)) None
      else Some(perFrame.flatMap(_.get).toArray)
    }

  /** Fallback frame sampling for payloads with no decodable container (e.g. MP4 —
    * no JDK codec): one deterministic pseudo-frame hash feature per timestamp,
    * feature[0] = 0 marking the undecoded path.
    */
  private def stubFrameSample(payload: Array[Byte], durationMs: Long, n: Int): Seq[Array[Float]] =
    (0 until n).map(i => hashFeature(payload :+ i.toByte))

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
        // ---- the decoder processes `batch` as ONE vectorized group ----
        batch.map { m =>
          val feat = m.modality match {
            case "image" => decodeImageFeatures(m.payload).getOrElse(hashFeature(m.payload))
            case "audio" => decodeAudioFeatures(m.payload).getOrElse(hashFeature(m.payload))
            case _ => decodeVideoFeatures(m.payload, 4).getOrElse(
              stubFrameSample(m.payload, m.duration_ms, 4).flatten.toArray)
          }
          var crc = 0L
          var i = 0
          while (i < m.payload.length) { crc = crc * 31 + m.payload(i); i += 1 }
          MediaFeature(m.media_id, m.modality, m.payload.length.toLong, crc, feat)
        }
      }
    }
  }

  /** Resize pass: payload → payload with updated dimension metadata, batched like
    * extractFeatures. Decodable images are REALLY resized (bilinear scale via
    * Graphics2D, re-encoded as PNG — all JDK built-ins); undecodable payloads keep
    * the deterministic truncate/pad fallback (w·h/8 bytes) so the fake corpus
    * still behaves like a downscale without throwing.
    */
  def resizeImages(media: Dataset[MediaRecord], w: Int, h: Int,
                   batchSize: Int = 64): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          if (m.modality != "image") m
          else realResize(m.payload, w, h) match {
            case Some(png) => m.copy(payload = png, width = w, height = h)
            case None =>
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

  /** REAL resize: decode → bilinear scale → PNG re-encode, JDK-only. */
  private def realResize(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", buf)
        Some(buf.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

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
