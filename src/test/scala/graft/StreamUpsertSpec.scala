package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.io.{DocumentSink, MemDocStore}
import graft.streaming.StreamUpsert

/** Continuous upsert into the V2 document store: within-batch
  * collisions keep the newest row, cross-batch arrivals update in
  * place, absent keys persist, and the final state equals a batch
  * last-per-key upsert over the full event history.
  */
class StreamUpsertSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("micro-batch upserts converge to the batch last-per-key state") {
    implicit val sc = spark.sqlContext
    val coll = "upsert_spec"
    MemDocStore.drop(coll)
    val in = MemoryStream[(String, Timestamp, Double)]
    val stream = in.toDF().toDF("key", "ts", "value")

    val q = StreamUpsert.run(stream, coll, "key", "ts")
    // batch 1: k1 twice in one batch (newest wins), k2 once
    in.addData(("k1", ts(1), 1.0), ("k1", ts(2), 2.0), ("k2", ts(1), 10.0))
    q.processAllAvailable()
    // batch 2: k1 updated again, k3 created; k2 untouched
    in.addData(("k1", ts(3), 3.0), ("k3", ts(1), 30.0))
    q.processAllAvailable()
    q.stop()

    val got = DocumentSink.pullFrom(spark, MemDocStore.Format,
        Map("collection" -> coll))
      .select($"key", $"value").as[(String, Double)].collect().toSet
    assert(got === Set(("k1", 3.0), ("k2", 10.0), ("k3", 30.0)))

    // batch twin over the full history
    val all = Seq(("k1", ts(1), 1.0), ("k1", ts(2), 2.0), ("k2", ts(1), 10.0),
      ("k1", ts(3), 3.0), ("k3", ts(1), 30.0)).toDF("key", "ts", "value")
    val twin = all.groupBy($"key")
      .agg(max_by($"value", struct($"ts", $"key")).as("value"))
      .as[(String, Double)].collect().toSet
    assert(twin === got)
    MemDocStore.drop(coll)
  }
}
