package graft.ingest

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamReader
import scala.jdk.CollectionConverters._

/** Arrow-native bulk ingest — the ecosystem analog of the reference's Flight
  * DoPut path (src/api/ingest/flight_ingest.rs:25-45: record batches decoded
  * off the wire and appended through the same write pipeline as every other
  * ingest source). No gRPC framing here (Flight's transport; Spark's ecosystem
  * serves Arrow over Spark Connect/Thrift instead) — the payload IS the Arrow
  * IPC stream format, the exact bytes `ResultFormat.toArrow` emits, so a
  * client can round-trip query output back into the store unchanged.
  *
  * Schema contract (mirrors the reference's validated ingest schema,
  * metrics.rs:236-276): `timestamp_ns` int64 (or Arrow Timestamp, converted to
  * ns) and `metric_name` utf8 are required; `value_f64` float8/float4,
  * `value_i64`/`value_u64` int64 are the routed value columns; every other
  * utf8 column is a label. Unknown field types are rejected with a 400-able
  * error, never silently dropped — a writer must learn its column vanished.
  *
  * ONE documented exception to "never silently dropped": a utf8 column
  * literally named `timestamp` is skipped as a label. `format=arrow` query
  * responses carry a µs-precision `timestamp` shadow column alongside
  * `timestamp_ns` for Arrow-native consumers; on re-ingest it is redundant
  * with (and lower-precision than) `timestamp_ns`, and treating it as a
  * label would explode cardinality. Writers who genuinely want a label
  * called `timestamp` must rename it.
  */
object ArrowIngest {

  private val ValueCols = Set("value_f64", "value_i64", "value_u64")

  /** Decode an Arrow IPC stream into routed points (driver-side: ingest
    * payloads are flush-sized batches, same bound as the remote-write body).
    */
  def toRoutedPoints(bytes: Array[Byte]): Seq[RoutedPoint] = {
    val allocator = new RootAllocator()
    // The reader ctor itself parses the stream header and can throw; at that
    // point the finally below has not been entered, so close the allocator on
    // that path explicitly or it leaks (ADVICE r8).
    val reader =
      try new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), allocator)
      catch { case e: Throwable => allocator.close(); throw e }
    try {
      val root = reader.getVectorSchemaRoot
      val names = root.getSchema.getFields.asScala.map(_.getName).toSeq
      require(names.contains("timestamp_ns"),
        "arrow ingest payload must carry an int64 timestamp_ns column")
      require(names.contains("metric_name"),
        "arrow ingest payload must carry a utf8 metric_name column")
      val out = scala.collection.mutable.ArrayBuffer.empty[RoutedPoint]
      while (reader.loadNextBatch()) {
        val n = root.getRowCount
        val ts = longGetter(root.getVector("timestamp_ns"), "timestamp_ns")
        val name = stringGetter(root.getVector("metric_name"), "metric_name")
        val f64 = Option(root.getVector("value_f64")).map(doubleGetter(_, "value_f64"))
        val i64 = Option(root.getVector("value_i64")).map(longGetter(_, "value_i64"))
        val u64 = Option(root.getVector("value_u64")).map(longGetter(_, "value_u64"))
        val labelCols = names
          .filterNot(c => c == "timestamp_ns" || c == "metric_name" || ValueCols(c))
          .filterNot(c => c == "timestamp") // µs shadow column on round-trips
          .map(c => c -> stringGetter(root.getVector(c), c))
        var i = 0
        while (i < n) {
          val tsv = ts(i).getOrElse(
            throw new IllegalArgumentException(s"null timestamp_ns at row $i"))
          val namev = name(i).getOrElse(
            throw new IllegalArgumentException(s"null metric_name at row $i"))
          val labels = labelCols.flatMap { case (k, g) => g(i).map(k -> _) }.toMap
          out += RoutedPoint(tsv, namev, labels,
            f64.flatMap(_(i)), i64.flatMap(_(i)), u64.flatMap(_(i)))
          i += 1
        }
      }
      out.toSeq
    } finally {
      reader.close()
      allocator.close()
    }
  }

  private def longGetter(v: FieldVector, col: String): Int => Option[Long] = v match {
    case b: BigIntVector => i => if (b.isNull(i)) None else Some(b.get(i))
    case b: IntVector => i => if (b.isNull(i)) None else Some(b.get(i).toLong)
    case t: TimeStampNanoVector => i => if (t.isNull(i)) None else Some(t.get(i))
    case t: TimeStampMicroVector => i => if (t.isNull(i)) None else Some(t.get(i) * 1000L)
    case t: TimeStampMilliVector => i => if (t.isNull(i)) None else Some(t.get(i) * 1000000L)
    case other => throw new IllegalArgumentException(
      s"column $col: expected int64/timestamp, got ${other.getClass.getSimpleName}")
  }

  private def doubleGetter(v: FieldVector, col: String): Int => Option[Double] = v match {
    case f: Float8Vector => i => if (f.isNull(i)) None else Some(f.get(i))
    case f: Float4Vector => i => if (f.isNull(i)) None else Some(f.get(i).toDouble)
    case other => throw new IllegalArgumentException(
      s"column $col: expected float8/float4, got ${other.getClass.getSimpleName}")
  }

  private def stringGetter(v: FieldVector, col: String): Int => Option[String] = v match {
    case s: VarCharVector =>
      i => if (s.isNull(i)) None else Some(new String(s.get(i), java.nio.charset.StandardCharsets.UTF_8))
    case other => throw new IllegalArgumentException(
      s"column $col: expected utf8, got ${other.getClass.getSimpleName}")
  }
}
