package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled protobuf-wire parser for Prometheus remote-write `WriteRequest` —
  * the same approach as the reference, which parses the wire format directly
  * instead of depending on generated proto code
  * (src/api/ingest/prometheus.rs:82-354; message layout documented there):
  *
  *   WriteRequest { repeated TimeSeries timeseries = 1; }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  *   Label        { string name = 1; string value = 2; }
  *   Sample       { double value = 1; int64 timestamp = 2; }  // ms
  *
  * (Field numbers/wire types are the public Prometheus protocol.) Snappy framing is
  * transport-level and out of scope here; callers hand in the decompressed bytes.
  */
object PromWire {

  final case class TimeSeries(labels: Map[String, String], samples: Seq[(Long, Double)])

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (true) {
        require(pos < end, "truncated varint")
        val b = buf(pos)
        pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
        require(shift < 64, "varint too long")
      }
      result
    }
    def readTag(): (Int, Int) = {
      val key = readVarint()
      ((key >>> 3).toInt, (key & 0x7).toInt)
    }
    def readLengthDelimited(): Reader = {
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= end, "truncated length-delimited field")
      val r = new Reader(buf, pos, pos + len)
      pos += len
      r
    }
    def readString(): String = {
      val len = readVarint().toInt
      require(len >= 0 && pos + len <= end, "truncated string")
      val s = new String(buf, pos, len, "UTF-8")
      pos += len
      s
    }
    def readFixed64(): Long = {
      require(pos + 8 <= end, "truncated fixed64")
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      v
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => require(pos + 8 <= end); pos += 8
      case 2 =>
        val len = readVarint().toInt
        // len >= 0 guards a 64-bit varint truncating to a negative Int, which
        // would move pos BACKWARDS and loop forever on malformed bytes.
        require(len >= 0 && pos + len <= end, "truncated length-delimited field")
        pos += len
      case 5 => require(pos + 4 <= end); pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  def parseWriteRequest(bytes: Array[Byte]): Seq[TimeSeries] = {
    val r = new Reader(bytes, 0, bytes.length)
    val out = ArrayBuffer.empty[TimeSeries]
    while (r.hasMore) {
      val (field, wt) = r.readTag()
      if (field == 1 && wt == 2) out += parseTimeSeries(r.readLengthDelimited())
      else r.skip(wt)
    }
    out.toSeq
  }

  private def parseTimeSeries(r: Reader): TimeSeries = {
    val labels = Map.newBuilder[String, String]
    val samples = ArrayBuffer.empty[(Long, Double)]
    while (r.hasMore) {
      val (field, wt) = r.readTag()
      (field, wt) match {
        case (1, 2) => labels += parseLabel(r.readLengthDelimited())
        case (2, 2) => samples += parseSample(r.readLengthDelimited())
        case _ => r.skip(wt)
      }
    }
    TimeSeries(labels.result(), samples.toSeq)
  }

  private def parseLabel(r: Reader): (String, String) = {
    var name = ""
    var value = ""
    while (r.hasMore) {
      val (field, wt) = r.readTag()
      (field, wt) match {
        case (1, 2) => name = r.readString()
        case (2, 2) => value = r.readString()
        case _ => r.skip(wt)
      }
    }
    name -> value
  }

  private def parseSample(r: Reader): (Long, Double) = {
    var tsMs = 0L
    var value = 0.0
    while (r.hasMore) {
      val (field, wt) = r.readTag()
      (field, wt) match {
        case (1, 1) => value = java.lang.Double.longBitsToDouble(r.readFixed64())
        case (2, 0) => tsMs = r.readVarint()
        case _ => r.skip(wt)
      }
    }
    (tsMs, value)
  }

  /** Full remote-write ingest conversion: wire bytes → routed points (value-type
    * routing + ms→ns + __name__ handling via Converters.promSample).
    */
  def toRoutedPoints(bytes: Array[Byte]): Seq[RoutedPoint] =
    parseWriteRequest(bytes).flatMap { ts =>
      ts.samples.map { case (tsMs, v) => Converters.promSample(tsMs, ts.labels, v) }
    }
}
