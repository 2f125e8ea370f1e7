package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamDedup

/** Streaming first-arrival dedup: duplicates within the watermark
  * horizon are dropped across batches, state evicts after it, and the
  * streaming result matches the batch twin on the same data.
  */
class StreamDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("duplicates across batches are dropped; batch twin agrees") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val events = in.toDF().toDF("key", "ts", "value")

    val q = StreamDedup.firstArrivals(events, Seq("key"), "ts", "2 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()

    // batch 1: k1 original + in-batch duplicate, k2 original
    in.addData(("k1", ts(1), 1.0), ("k1", ts(1, 30), 99.0), ("k2", ts(2), 2.0))
    q.processAllAvailable()
    // batch 2: k1 duplicate from another batch (still within horizon),
    // k3 original
    in.addData(("k1", ts(2, 30), 98.0), ("k3", ts(3), 3.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_out")
      .select($"key", $"value").as[(String, Double)].collect().toSet
    assert(got === Set(("k1", 1.0), ("k2", 2.0), ("k3", 3.0)))

    val all = Seq(("k1", ts(1), 1.0), ("k1", ts(1, 30), 99.0), ("k2", ts(2), 2.0),
      ("k1", ts(2, 30), 98.0), ("k3", ts(3), 3.0)).toDF("key", "ts", "value")
    val batch = StreamDedup.firstArrivalsBatch(all, Seq("key"), "ts")
      .select($"key", $"value").as[(String, Double)].collect().toSet
    assert(batch === got)
  }

  test("state evicts past the watermark: a far-later same-key row passes") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val events = in.toDF().toDF("key", "ts", "value")
    val q = StreamDedup.firstArrivals(events, Seq("key"), "ts", "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_evict").start()

    in.addData(("k1", ts(1), 1.0))
    q.processAllAvailable()
    // push the watermark far past k1's horizon, then re-send k1: its
    // state was evicted, so the new arrival is treated as an original —
    // the documented (and bounded-state) semantics of
    // dropDuplicatesWithinWatermark
    in.addData(("kx", ts(10), 0.0))
    q.processAllAvailable()
    in.addData(("k1", ts(9, 30), 5.0)) // above the 9:00 watermark -> not late
    q.processAllAvailable()
    q.stop()

    val got = spark.table("dedup_evict")
      .select($"key", $"value").as[(String, Double)].collect().toSet
    assert(got === Set(("k1", 1.0), ("kx", 0.0), ("k1", 5.0)))
  }
}
