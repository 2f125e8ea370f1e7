package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{SessionizeV2, StreamQuota}
import graft.streaming.SessionizeV2.EventT

/** v2 sessionizer: gap-close inline, TIMER-close on watermark — the
  * idle-tail case the v1 flatMapGroupsWithState variant cannot emit.
  */
class SessionizeV2Spec extends SparkTestBase {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("gap closes inline; idle session closes by event-time timer") {
    val prev = StreamQuota.configure(spark)
    try {
      implicit val sc = spark.sqlContext
      val in = MemoryStream[EventT]
      val events = in.toDS().withWatermark("ts", "0 seconds").as[EventT]
      val q = SessionizeV2.sessionize(spark, events, gapMicros = 3600L * 1000000L)
        .writeStream.outputMode("append").format("memory")
        .queryName("sess_v2").start()

      // batch 1: user 1 has two events 10 min apart (one session)
      in.addData(EventT(1L, ts(1, 0), 1.0), EventT(1L, ts(1, 10), 2.0))
      q.processAllAvailable()
      // batch 2: a later user-1 event beyond the gap closes session 1
      // INLINE; user 2 appears
      in.addData(EventT(1L, ts(5, 0), 3.0), EventT(2L, ts(5, 0), 4.0))
      q.processAllAvailable()
      // batch 3: watermark jumps far ahead via user 3 — both open
      // sessions (user 1's second, user 2's only) close BY TIMER with
      // no further events of their own
      in.addData(EventT(3L, ts(20, 0), 5.0))
      q.processAllAvailable()
      q.stop()

      def micros(t: Timestamp): Long = t.getTime * 1000L
      val got = spark.table("sess_v2")
        .as[SessionizeV2.ClosedSession].collect()
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events,
          s.total_value, s.closed_by)).toSet
      assert(got === Set(
        (1L, micros(ts(1, 0)), micros(ts(1, 10)), 2L, 3.0, "gap"),
        (1L, micros(ts(5, 0)), micros(ts(5, 0)), 1L, 3.0, "timeout"),
        (2L, micros(ts(5, 0)), micros(ts(5, 0)), 1L, 4.0, "timeout")))
    } finally spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
  }
}
