package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom per-key state — the Structured
  * Streaming counterpart of [[graft.operators.Operators.sessionize]] (the batch
  * lag→flag→running-sum form needs the whole history; a stream needs bounded
  * state instead).
  *
  * EXTENSION beyond the reference (flagged per SURVEY.md §2.9 — the reference's
  * streaming layer merges historical+live phases and never aggregates): this is
  * the `flatMapGroupsWithState` pattern the brief's training-data pipelines
  * need for activity sessions over event streams.
  *
  * Semantics match the batch operator: a session closes when the key sees a gap
  * strictly greater than `gapUs`, OR when the event-time watermark passes the
  * session's last event + gap (timeout — the streaming-only "no more events can
  * arrive" close). State per key is ONE open session (constant size), so state
  * store growth is O(active keys), not O(events) — the property that keeps this
  * runnable forever at 100 TB/day.
  *
  * Late rows older than the watermark are dropped by the watermark itself;
  * rows late WITHIN the allowed lateness but older than the open session's last
  * event would create out-of-order sessions, so they are folded in sorted order
  * per micro-batch (cross-batch disorder inside the lateness window is resolved
  * by the watermark delay ≥ gap recommendation documented on `watermarkDelay`).
  */
object StatefulSessions {

  /** One event: a key, its event time in µs, and a value to aggregate. */
  final case class SessionEvent(key: Long, ts_us: Long, value: Double)

  /** The open session carried in the state store (constant-size per key). */
  final case class OpenSession(start_us: Long, last_us: Long, n: Long, sum: Double)

  /** A closed session. `closed_by` is "gap" (a later event opened the next
    * session) or "timeout" (watermark passed last event + gap).
    */
  final case class ClosedSession(key: Long, session_start_us: Long,
                                 session_end_us: Long, n_events: Long,
                                 sum_value: Double, closed_by: String)

  /** Sessionize a streaming Dataset of [[SessionEvent]].
    *
    * @param watermarkDelay allowed event lateness; choose ≥ the typical
    *                       cross-batch disorder (a delay shorter than `gapUs`
    *                       can time a session out just before a late in-gap
    *                       event would have extended it).
    */
  def sessionize(events: Dataset[SessionEvent], gapUs: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state) => onGroup(key, rows, state, gapUs)
      }
  }

  /** The per-key state transition, exposed for direct unit testing. */
  private[graft] def onGroup(key: Long, rows: Iterator[SessionEvent],
                                 state: GroupState[OpenSession],
                                 gapUs: Long): Iterator[ClosedSession] = {
    if (!rows.hasNext) {
      // timeout invocation: the watermark passed last_us + gap — no event can
      // extend this session any more (watermark delay permitting), close it
      val out = state.getOption.map(s =>
        ClosedSession(key, s.start_us, s.last_us, s.n, s.sum, "timeout")).iterator
      state.remove()
      return out
    }
    val sorted = rows.toArray.sortBy(e => (e.ts_us, e.value))
    val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var open: Option[OpenSession] = state.getOption
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us - s.last_us > gapUs =>
          closed += ClosedSession(key, s.start_us, s.last_us, s.n, s.sum, "gap")
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
        case Some(s) =>
          // fold in (also absorbs in-gap late rows: start_us may move back)
          open = Some(OpenSession(math.min(s.start_us, e.ts_us),
            math.max(s.last_us, e.ts_us), s.n + 1, s.sum + e.value))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      // close via timeout once the watermark passes last event + gap
      state.setTimeoutTimestamp(s.last_us / 1000L + gapUs / 1000L + 1L)
    }
    closed.iterator
  }

}
