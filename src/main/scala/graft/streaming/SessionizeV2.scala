package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap sessionization on the arbitrary-state v2 API with EVENT-TIME
  * TIMERS — the semantically complete form: an idle session closes when
  * the WATERMARK passes its end + gap, not only when a later event of
  * the same user happens to arrive ([[Sessionize]] keeps the v1
  * `flatMapGroupsWithState` variant, whose tail sessions stay open
  * forever on an idle key; its spec works around exactly that).
  *
  * Per key: one ValueState (open-session summary, O(1)) and one
  * event-time timer re-armed at `session_end + gap` on every update.
  * An in-batch event beyond the gap closes the session inline; the
  * timer handles the no-more-events case. State and timers are both
  * watermark-bounded — memory is O(active users) at any stream length.
  */
object SessionizeV2 {

  case class EventT(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(start: Long, last: Long, n: Long, totalCents: Long)
  case class ClosedSession(user_id: Long, session_start: Long, session_end: Long,
                           n_events: Long, total_value: Double, closed_by: String)

  class SessionProcessor(gapMicros: Long)
      extends StatefulProcessor[Long, EventT, ClosedSession] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    private def closed(user: Long, s: OpenSession, by: String) =
      ClosedSession(user, s.start, s.last, s.n, s.totalCents / 100.0, by)

    private def rearm(s: OpenSession): Unit = {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      // timers are epoch millis; round UP so the timer never fires
      // inside the still-open gap
      getHandle.registerTimer((s.last + gapMicros) / 1000L + 1L)
    }

    override def handleInputRows(user: Long, rows: Iterator[EventT],
                                 timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime * 1000L, e.value))
      val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
      var st = if (open.exists()) open.get() else null
      sorted.foreach { e =>
        val tMicros = e.ts.getTime * 1000L
        val cents = math.round(e.value * 100)
        if (st == null) st = OpenSession(tMicros, tMicros, 1L, cents)
        else if (tMicros - st.last > gapMicros) {
          out += closed(user, st, "gap")
          st = OpenSession(tMicros, tMicros, 1L, cents)
        } else st = OpenSession(st.start, math.max(st.last, tMicros), st.n + 1,
          st.totalCents + cents)
      }
      if (st != null) { open.update(st); rearm(st) }
      out.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (open.exists()) {
        val s = open.get()
        open.clear()
        Iterator.single(closed(user, s, "timeout"))
      } else Iterator.empty

    override def close(): Unit = ()
  }

  /** `events` must carry the watermark (`withWatermark("ts", …)` before
    * calling) — event-time timers fire off it.
    */
  def sessionize(spark: SparkSession, events: Dataset[EventT],
                 gapMicros: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMicros),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
