package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, OpenSession, SessionEvent}
import org.apache.spark.api.java.Optional

class StatefulSessionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val S = 1000000L // 1 second in µs

  test("onGroup: gap split emits the closed session; state carries the open one") {
    val st = TestGroupState.create[OpenSession](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(0L)), hasTimedOut = false)
    val out = StatefulSessions.onGroup(1L, Iterator(
      SessionEvent(1L, 0L, 1.0), SessionEvent(1L, 10 * S, 2.0),
      SessionEvent(1L, 500 * S, 3.0)), st, gapUs = 100 * S).toSeq
    assert(out == Seq(ClosedSession(1L, 0L, 10 * S, 2L, 3.0, "gap")))
    assert(st.get == OpenSession(500 * S, 500 * S, 1L, 3.0))
    // timeout scheduled just past last + gap
    assert(st.getTimeoutTimestampMs.get() == (500 * S) / 1000 + (100 * S) / 1000 + 1)
  }

  test("onGroup: out-of-order rows within a batch fold in sorted order") {
    val st = TestGroupState.create[OpenSession](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(0L)), hasTimedOut = false)
    // arrival order scrambled; sorted order has no gap
    val out = StatefulSessions.onGroup(1L, Iterator(
      SessionEvent(1L, 90 * S, 2.0), SessionEvent(1L, 0L, 1.0),
      SessionEvent(1L, 170 * S, 3.0)), st, gapUs = 100 * S).toSeq
    assert(out.isEmpty)
    assert(st.get == OpenSession(0L, 170 * S, 3L, 6.0))
  }

  test("onGroup: timeout invocation closes and removes state") {
    val st = TestGroupState.create[OpenSession](
      Optional.of(OpenSession(0L, 10 * S, 2L, 3.0)),
      GroupStateTimeout.EventTimeTimeout, 0L,
      Optional.of(java.lang.Long.valueOf(1000 * S / 1000)), hasTimedOut = true)
    val out = StatefulSessions.onGroup(7L, Iterator.empty, st, gapUs = 100 * S).toSeq
    assert(out == Seq(ClosedSession(7L, 0L, 10 * S, 2L, 3.0, "timeout")))
    assert(st.isRemoved)
  }

  test("streaming end-to-end: gap closes in-batch, watermark closes by timeout") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark2.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = StatefulSessions
      .sessionize(input.toDS(), gapUs = 100 * S, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sessions_out").outputMode("append")
      .start()
    // base offset: a row at event-time epoch 0 would sit exactly ON the initial
    // watermark and be discarded as late
    val B = 10000 * S
    try {
      // key 1: two close events then a 490 s gap → first session closes by gap.
      // key 2: one event, then silence → will close by timeout once the
      // watermark (driven by key 1's t=500 s event) passes 5 s + gap.
      input.addData(SessionEvent(1L, B, 1.0), SessionEvent(1L, B + 10 * S, 2.0),
        SessionEvent(2L, B + 5 * S, 5.0), SessionEvent(1L, B + 500 * S, 3.0))
      q.processAllAvailable()
      // advance the watermark to 700 s → key 1's open session (last 500 s,
      // timeout 600 s) times out too
      input.addData(SessionEvent(3L, B + 700 * S, 7.0))
      q.processAllAvailable()
      input.addData(SessionEvent(3L, B + 701 * S, 1.0))
      q.processAllAvailable()

      val rows = spark2.table("sessions_out").as[ClosedSession].collect().toSet
      assert(rows == Set(
        ClosedSession(1L, B, B + 10 * S, 2L, 3.0, "gap"),
        ClosedSession(2L, B + 5 * S, B + 5 * S, 1L, 5.0, "timeout"),
        ClosedSession(1L, B + 500 * S, B + 500 * S, 1L, 3.0, "timeout")))
      // key 3's session is still open — never emitted
      assert(!rows.exists(_.key == 3L))
    } finally q.stop()
  }
}
