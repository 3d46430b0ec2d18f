package graft.multimodal

import java.io.ByteArrayOutputStream

/** Minimal MJPEG-in-AVI container codec, JDK-only.
  *
  * AVI is a RIFF file: `RIFF(size,'AVI ')` wrapping LIST chunks — `hdrl` with the
  * `avih` main header (frame period, dimensions) and `movi` holding one `NNdc`
  * (compressed) or `NNdb` (uncompressed) chunk per frame. In the MJPEG flavor every
  * `dc` chunk is a complete baseline JPEG, which `javax.imageio` decodes natively —
  * so a pure byte-walk over the container is all that's needed to make video frame
  * sampling REAL without any external codec. MP4/H.264 stays out of scope (no JDK
  * codec exists); undecodable payloads fall back to the deterministic hash feature,
  * same quarantine-not-crash contract as the image/audio paths.
  *
  * Ref behavior anchor: the reference treats media payloads as opaque blobs and
  * defers decode to ingest-side tooling; this gives Spark-side frame sampling an
  * actually-decodable representative format.
  */
object AviMjpeg {

  /** Parsed video stream: dimensions + frame period + (offset,len) per frame chunk. */
  final case class AviVideo(
      width: Int,
      height: Int,
      microSecPerFrame: Long,
      frameChunks: Vector[(Int, Int)])

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the RIFF tree; collect avih dims and movi frame chunks. None if the
    * bytes are not an AVI or hold no frames. Bounds-checked throughout — this
    * parses untrusted lake bytes, so a truncated/hostile size field must end the
    * walk, never read past the buffer.
    */
  def parse(bytes: Array[Byte]): Option[AviVideo] = {
    if (bytes.length < 24 || fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ")
      return None
    var width = 0
    var height = 0
    var mspf = 0L
    val frames = Vector.newBuilder[(Int, Int)]

    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 8) return // RIFF nests ~3 deep; a cycle-bomb gets cut off
      var p = start
      var ok = true
      while (ok && p + 8 <= end) {
        val id = fourcc(bytes, p)
        val sz = u32(bytes, p + 4)
        val dataStart = p + 8
        if (sz < 0 || sz > Int.MaxValue - dataStart) ok = false // hostile size
        else {
          val dataEnd = math.min(dataStart + sz.toInt, end)
          if (id == "LIST" && dataEnd - dataStart >= 4)
            walk(dataStart + 4, dataEnd, depth + 1)
          else if (id == "avih" && dataEnd - dataStart >= 40) {
            mspf = u32(bytes, dataStart)
            width = u32(bytes, dataStart + 32).toInt
            height = u32(bytes, dataStart + 36).toInt
          } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.endsWith("dc") || id.endsWith("db")) && dataEnd > dataStart)
            frames += ((dataStart, dataEnd - dataStart))
          p = dataStart + sz.toInt + (sz.toInt & 1) // chunks pad to even
        }
      }
    }

    walk(12, math.min(bytes.length.toLong, 8L + u32(bytes, 4)).toInt, 0)
    val fs = frames.result()
    if (fs.isEmpty) None else Some(AviVideo(width, height, mspf, fs))
  }

  /** Pack JPEG frames into a minimal MJPEG AVI (hdrl + movi, no idx1 — players
    * and [[parse]] both handle index-less files). Used to build test corpora and
    * as the repack sink for frame-sampled video.
    */
  def writeMjpegAvi(jpegFrames: Seq[Array[Byte]], width: Int, height: Int, fps: Int): Array[Byte] = {
    require(jpegFrames.nonEmpty, "need at least one frame")
    require(fps > 0, "fps must be positive")

    def le32(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def cc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if ((body.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ le32(body.length.toLong) ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(typ) ++ body)

    val maxFrame = jpegFrames.map(_.length).max
    val avih = le32(1000000L / fps) ++ le32(maxFrame.toLong * fps) ++ le32(0) ++
      le32(0) ++ // dwFlags: no idx1 written, so AVIF_HASINDEX stays clear
      le32(jpegFrames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(maxFrame.toLong) ++
      le32(width.toLong) ++ le32(height.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = cc("vids") ++ cc("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) ++ le32(fps.toLong) ++ le32(0) ++ le32(jpegFrames.length.toLong) ++
      le32(maxFrame.toLong) ++ le32(0xFFFFFFFFL) ++ le32(0) ++
      Array.fill[Byte](8)(0) // rcFrame
    val strf = le32(40) ++ le32(width.toLong) ++ le32(height.toLong) ++
      Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++ // biPlanes=1, biBitCount=24
      cc("MJPG") ++ le32(width.toLong * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegFrames.iterator.map(f => chunk("00dc", f)).reduce(_ ++ _))

    val body = cc("AVI ") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream(body.length + 8)
    out.write(cc("RIFF")); out.write(le32(body.length.toLong)); out.write(body)
    out.toByteArray
  }
}
