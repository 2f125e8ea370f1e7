package graft

import org.apache.spark.sql.functions._
import graft.ext.Exec

/** Execution-posture contracts: the conditional parallelism floor
  * (widen must NOT insert an Exchange when scan parallelism already
  * meets the target — at 100 TB an unconditional repartition is a full
  * extra pass over the corpus at the head of every ext operator) and
  * the reliable-checkpoint seam (one conf key flips every iterative
  * operator from executor-local blocks to fault-tolerant checkpoint
  * files, bit-identical results).
  */
class ExecSpec extends SparkTestBase {

  test("widen is the identity when partitions already meet the target") {
    val target = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 10000).toDF("id").repartition(target)
    assert(Exec.widen(df) eq df,
      "widen inserted a plan node on an already-parallel input")
    val wider = spark.range(0, 10000).toDF("id").repartition(target * 2)
    assert(Exec.widen(wider) eq wider,
      "widen must never REDUCE parallelism either")
  }

  test("widen raises a single-partition input to the session parallelism") {
    val df = spark.range(0, 1000).toDF("id").coalesce(1)
    val w = Exec.widen(df)
    assert(w ne df)
    assert(w.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("checkpointEager reliable path: identical results, files on disk") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // a chain long enough to need several pointer-jumping rounds, plus
    // a separate pair and isolated singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L))
      .toDF("id_a", "id_b")
    val ids = spark.range(1, 11).select(col("id").as("doc_id"))
    def run(): Array[(Long, Long)] = {
      graft.ext.Dedup.duplicateComponents(pairs, ids, "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    }
    val local = run()
    spark.conf.set(Exec.CheckpointDirKey, dir)
    try {
      val reliable = run()
      assert(reliable.sameElements(local),
        "reliable-checkpoint path changed the component labels")
      assert(spark.sparkContext.getCheckpointDir.isDefined,
        "conf key did not install a checkpoint dir on the context")
      // the reliable path must actually write checkpoint files
      def anyFile(p: java.io.File): Boolean =
        p.isFile || Option(p.listFiles).exists(_.exists(anyFile))
      assert(anyFile(new java.io.File(dir)),
        s"no checkpoint files materialized under $dir")
    } finally spark.conf.unset(Exec.CheckpointDirKey)
  }
}
