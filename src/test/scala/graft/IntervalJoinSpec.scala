package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.IntervalJoin

/** Stream-stream interval join: matches land within the time bounds
  * across batches, non-matches (wrong key or outside the interval) are
  * excluded, and the streaming result equals the batch twin.
  */
class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("stream-stream interval join matches batch twin across batches") {
    implicit val sc = spark.sqlContext
    val pIn = MemoryStream[(Long, Timestamp, String)]
    val cIn = MemoryStream[(Long, Timestamp, String)]
    val purchases = pIn.toDF().toDF("user", "pts", "order_ref")
    val clicks = cIn.toDF().toDF("user", "cts", "page")

    val q = IntervalJoin.joinWithin(purchases, clicks, "user", "pts", "cts",
        before = "1 hour", after = "30 minutes", delay = "2 hours")
      .select($"user", $"order_ref", $"page")
      .writeStream.outputMode("append").format("memory")
      .queryName("ij_out").start()

    // batch 1: user 1 purchase at 10:00; clicks at 09:30 (in), 09:59 (in)
    pIn.addData((1L, ts(10), "o1"))
    cIn.addData((1L, ts(9, 30), "a"), (1L, ts(9, 59), "b"))
    q.processAllAvailable()
    // batch 2: late-but-within-watermark click at 10:20 (in, +30 min
    // side), click at 11:00 (out — past after-bound), user-2 click at
    // 10:00 (out — wrong key), user-2 purchase at 12:00 matching nothing
    cIn.addData((1L, ts(10, 20), "c"), (1L, ts(11), "d"), (2L, ts(10), "e"))
    pIn.addData((2L, ts(12), "o2"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ij_out")
      .as[(Long, String, String)].collect().toSet
    assert(got === Set((1L, "o1", "a"), (1L, "o1", "b"), (1L, "o1", "c")))

    val batch = IntervalJoin.joinWithinBatch(
        Seq((1L, ts(10), "o1"), (2L, ts(12), "o2")).toDF("user", "pts", "order_ref"),
        Seq((1L, ts(9, 30), "a"), (1L, ts(9, 59), "b"), (1L, ts(10, 20), "c"),
          (1L, ts(11), "d"), (2L, ts(10), "e")).toDF("user", "cts", "page"),
        "user", "pts", "cts", "1 hour", "30 minutes")
      .select($"user", $"order_ref", $"page")
      .as[(Long, String, String)].collect().toSet
    assert(batch === got)
  }

  test("physical plan is a stream-stream symmetric hash join with watermarks") {
    implicit val sc = spark.sqlContext
    val pIn = MemoryStream[(Long, Timestamp, String)]
    val cIn = MemoryStream[(Long, Timestamp, String)]
    val joined = IntervalJoin.joinWithin(
      pIn.toDF().toDF("user", "pts", "order_ref"),
      cIn.toDF().toDF("user", "cts", "page"),
      "user", "pts", "cts", "1 hour", "30 minutes", "2 hours")
    // analyzed plan must carry both event-time watermarks (state
    // eviction) and the range condition (match-window bounds)
    val plan = joined.queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"), plan.take(1500))
    assert(joined.isStreaming)
  }
}
