package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDedup

/** Top-level (not spec-nested) so the encoder's codegen can reference it —
  * a class nested in a test instance makes Janino's generated code fall back
  * to the interpreted encoder with a logged CompileException (VERDICT r8 #4).
  */
case class StreamingDedupDoc(id: Long, ts_us: Long, text: String)

class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private type Doc = StreamingDedupDoc
  private def Doc(id: Long, ts_us: Long, text: String): StreamingDedupDoc =
    StreamingDedupDoc(id, ts_us, text)

  test("exactDedupStream: first occurrence wins within and across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val input = MemoryStream[Doc]
    val B = 10000L * 1000000L
    val deduped = StreamingDedup.exactDedupStream(
      input.toDF().withColumn("event_time", timestamp_micros(col("ts_us"))),
      delay = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    try {
      // in-batch dup (2 ≡ 1 after normalization) and a distinct doc
      input.addData(Doc(1L, B, "alpha  beta"), Doc(2L, B + 1, "ALPHA beta"),
        Doc(3L, B + 2, "gamma"))
      q.processAllAvailable()
      // cross-batch dup of 1, plus a new doc
      input.addData(Doc(4L, B + 3, "alpha beta"), Doc(5L, B + 4, "delta"))
      q.processAllAvailable()
      val ids = spark2.table("sdedup_out").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("dedupAgainstCorpus: rows already in the warehouse never reach the sink") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val corpusFps = Seq("seen text").toDF("t")
      .select(graft.text.TextFunctions.fingerprint(col("t")))
    val input = MemoryStream[Doc]
    val q = StreamingDedup.dedupAgainstCorpus(input.toDF(), corpusFps)
      .writeStream.format("memory").queryName("scorpus_out")
      .outputMode("append").start()
    try {
      input.addData(Doc(1L, 0L, "SEEN  text"), Doc(2L, 1L, "fresh text"))
      q.processAllAvailable()
      val ids = spark2.table("scorpus_out").select("id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(2L))
    } finally q.stop()
  }
}
