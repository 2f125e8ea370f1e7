package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Late-data semantics of the watermarked windowed aggregation: with a
  * 1h watermark and 6h windows in APPEND mode, a window only emits once
  * the watermark passes its end, and an event arriving after that is
  * dropped rather than mutating the emitted result.
  */
class WatermarkSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(h: Int, m: Int = 0): Long =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00").getTime * 1000L

  test("append-mode windows close at the watermark; later events are dropped") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Double, String)]
    val events = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts") * 1000) // micros -> "nanos" for the shared transform

    val q = EventStream.windowedTotals(events)
      .writeStream.outputMode("append").format("memory")
      .queryName("wm_out").start()

    // batch 1: two events in the 00:00-06:00 window
    in.addData((1L, micro(1), 1L, "click", 1.0, "{}"),
      (2L, micro(2), 1L, "click", 2.0, "{}"))
    q.processAllAvailable()
    assert(spark.table("wm_out").count() === 0) // window still open

    // batch 2: event at 08:00 pushes the watermark to 07:00 > 06:00 ->
    // the first window closes and emits
    in.addData((3L, micro(8), 1L, "click", 4.0, "{}"))
    q.processAllAvailable()
    val closed = spark.table("wm_out")
      .select($"win_start", $"n", $"total").as[(Timestamp, Long, Double)].collect()
    assert(closed.toSeq === Seq((Timestamp.valueOf("2024-01-01 00:00:00"), 2L, 3.0)))

    // batch 3: a LATE event for the closed window (03:00 < watermark) is
    // dropped — no new or updated row for that window
    in.addData((4L, micro(3), 1L, "click", 100.0, "{}"))
    q.processAllAvailable()
    assert(spark.table("wm_out").count() === 1)
    q.stop()
  }
}
