package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.Sketches
import graft.io.MemDocStore
import graft.streaming.StreamSketch

/** Streaming Count-Min: batched maintenance must equal the one-shot
  * sketch over the full stream (counter cells are a commutative
  * monoid — batching adds NO approximation), and lookups through the
  * maintained sketch keep the one-sided error.
  */
class StreamSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("batched sketch == one-shot sketch over the concatenated stream") {
    implicit val sc = spark.sqlContext
    val coll = "cm_spec"
    MemDocStore.drop(coll)
    val in = MemoryStream[String]
    val q = StreamSketch.run(in.toDF().toDF("tok"), coll, "tok", d = 3, w = 32)
    val b1 = Seq("a", "b", "a", "c")
    val b2 = Seq("a", "d", "d")
    val b3 = Seq("e")
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    in.addData(b3); q.processAllAvailable()
    q.stop()

    val got = StreamSketch.counters(spark, coll)
      .as[(Int, Long, Long)].collect().toSet
    val oneShot = Sketches.countMinCounters(
        (b1 ++ b2 ++ b3).toDF("tok"), "tok", d = 3, w = 32)
      .as[(Int, Long, Long)].collect().toSet
    assert(got === oneShot)

    // lookups through the maintained sketch: estimate >= exact, and
    // for skew-free tiny input the top key is exact
    val exact = (b1 ++ b2 ++ b3).groupBy(identity).map { case (k, v) => k -> v.size }
    val est = Sketches.countMinLookup(StreamSketch.counters(spark, coll),
        exact.keys.toSeq.toDF("tok"), "tok", d = 3, w = 32)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) => assert(est(k) >= n, s"under-count for $k") }
    MemDocStore.drop(coll)
  }

  test("batched grouped-HLL registers == one-shot build; replay is idempotent") {
    implicit val sc = spark.sqlContext
    val coll = "hll_spec"
    MemDocStore.drop(coll)
    val in = MemoryStream[(String, Long)]
    val q = StreamSketch.runHll(in.toDF().toDF("grp", "uid"), coll,
      "grp", "uid", p = 4)
    val b1 = Seq(("x", 1L), ("x", 2L), ("y", 1L))
    val b2 = Seq(("x", 2L), ("y", 7L), ("y", 9L))
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    // replaying an already-seen batch must not change the registers
    in.addData(b1); q.processAllAvailable()
    q.stop()

    val got = StreamSketch.counters(spark, coll)
      .as[(String, Long, Long)].collect().toSet
    val oneShot = Sketches.hllRegistersBy(
        (b1 ++ b2).toDF("grp", "uid"), Seq("grp"), "uid", p = 4)
      .as[(String, Long, Long)].collect().toSet
    assert(got === oneShot,
      s"batched+replayed registers drift from one-shot: got=$got oneShot=$oneShot")
    MemDocStore.drop(coll)
  }

  test("batched Bloom bits == one-shot build; replay is idempotent; no false negatives") {
    implicit val sc = spark.sqlContext
    val coll = "bloom_spec"
    MemDocStore.drop(coll)
    val in = MemoryStream[String]
    val q = StreamSketch.runBloom(in.toDF().toDF("key"), coll, "key",
      m = 256, k = 3)
    val b1 = Seq("alpha", "beta", "gamma")
    val b2 = Seq("delta", "beta")
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable()
    // replaying an already-seen batch must not change the bit set
    in.addData(b1); q.processAllAvailable()
    q.stop()

    val got = StreamSketch.counters(spark, coll)
      .as[Long].collect().toSet
    val oneShot = Sketches.bloomBits((b1 ++ b2).toDF("key"), "key",
        m = 256, k = 3)
      .as[Long].collect().toSet
    assert(got === oneShot,
      s"batched+replayed bits drift from one-shot: got=$got oneShot=$oneShot")
    // the maintained filter screens with no false negatives
    val screen = Sketches.bloomScreen((b1 ++ b2).toDF("key"),
        (b1 ++ b2 ++ Seq("zeta")).toDF("key"), "key", m = 256, k = 3)
      .as[(String, Boolean)].collect().toMap
    (b1 ++ b2).foreach(k => assert(screen(k), s"false negative for $k"))
    MemDocStore.drop(coll)
  }
}
