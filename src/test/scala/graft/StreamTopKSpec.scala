package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StreamQuota, StreamTopK}

/** transformWithState MapState leaderboard: per-key top-k item counts
  * maintained across batches; the latest snapshot (highest keyTotal per
  * key) must equal the batch groupBy-count top-k over the same rows.
  */
class StreamTopKSpec extends SparkTestBase {
  import spark.implicits._

  test("latest snapshot equals the batch top-k, ties break item asc, state survives batches") {
    val prev = StreamQuota.configure(spark)
    try {
      implicit val sc = spark.sqlContext
      val in = MemoryStream[(String, String)]
      val q = StreamTopK.topKPerKey(in.toDS(), k = 2)
        .writeStream.outputMode("append").format("memory")
        .queryName("topk_out").start()

      in.addData(("s1", "x"), ("s1", "y"), ("s1", "x"), ("s2", "a"))
      q.processAllAvailable()
      // batch 2 flips s1's leader and introduces a tie on s2
      in.addData(("s1", "y"), ("s1", "y"), ("s2", "b"))
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("topk_out").as[StreamTopK.TopItem].collect()
      val latest = rows.groupBy(_.key).map { case (key, rs) =>
        val tmax = rs.map(_.keyTotal).max
        key -> rs.filter(_.keyTotal == tmax).sortBy(r => (-r.cnt, r.item))
          .map(r => (r.item, r.cnt)).toSeq
      }
      // s1: x=2, y=3 -> top-2 is (y,3),(x,2); s2: a=1, b=1 tie -> item asc
      assert(latest("s1") === Seq(("y", 3L), ("x", 2L)))
      assert(latest("s2") === Seq(("a", 1L), ("b", 1L)))
      // batch-1 snapshot for s1 was (x,2),(y,1) at keyTotal=3 — still
      // present, distinguishable by the generation tag
      val gen1 = rows.filter(r => r.key == "s1" && r.keyTotal == 3L)
        .sortBy(r => (-r.cnt, r.item)).map(r => (r.item, r.cnt)).toSeq
      assert(gen1 === Seq(("x", 2L), ("y", 1L)))
    } finally spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
  }
}
