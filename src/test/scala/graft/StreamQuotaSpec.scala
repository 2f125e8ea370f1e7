package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamQuota

/** transformWithState admission quota: at most n rows per key across
  * batches, arrival order, counter state only.
  */
class StreamQuotaSpec extends SparkTestBase {
  import spark.implicits._

  test("admits first n per key across batches; later batches keep counting") {
    val prev = StreamQuota.configure(spark)
    try {
      implicit val sc = spark.sqlContext
      val in = MemoryStream[(String, Long)]
      val q = StreamQuota.admitFirstN(in.toDS(), (r: (String, Long)) => r._1, n = 2)
        .writeStream.outputMode("append").format("memory")
        .queryName("quota_out").start()

      in.addData(("a", 1L), ("a", 2L), ("a", 3L), ("b", 1L))
      q.processAllAvailable()
      in.addData(("a", 4L), ("b", 2L), ("b", 3L), ("c", 1L))
      q.processAllAvailable()
      q.stop()

      val got = spark.table("quota_out").as[(String, Long)].collect().toSet
      // a: quota exhausted in batch 1; b: one slot left for batch 2;
      // c: fresh key
      assert(got === Set(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L), ("c", 1L)))
    } finally spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
  }
}
