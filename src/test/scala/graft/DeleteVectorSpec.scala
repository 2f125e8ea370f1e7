package graft

import org.apache.spark.sql.functions._
import graft.io.Versioned

/** Merge-on-read deletion vectors: a delete appends keys to the DV
  * sidecar and touches ZERO data files; reads anti-join the vectors and
  * serve exactly the minus-deleted rows; re-deletes and batch replays
  * are content no-ops; a purge folds the vectors into a rewrite of only
  * the delete-carrying partitions and empties the sidecar.
  */
class DeleteVectorSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(n: Int) = spark.range(n.toLong).select(
    $"id", ($"id" % 6).cast("long").as("m"), ($"id" * 3).as("v"))

  private def partFiles(root: String): Map[String, Seq[(String, Long, Long)]] =
    Option(new java.io.File(root).listFiles()).map(_.toSeq)
      .getOrElse(Seq.empty)
      .filter(_.isDirectory)
      .map(d => d.getName -> Option(d.listFiles()).map(_.toSeq)
        .getOrElse(Seq.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1))
      .toMap

  test("deletes touch zero data files; merge-on-read serves minus-deleted; accumulation and replay; purge folds and clears") {
    val dir = graft.core.Scratch.dir("dv_lane")
    val df = mk(6000)
    val root = Versioned.writePartitionedFull(df, dir, "dv_data", Seq("m"))
    val before = partFiles(root)

    def del(pred: org.apache.spark.sql.Column) =
      df.filter(pred).select($"m", $"id")
    def expect(pred: org.apache.spark.sql.Column) =
      df.filter(!pred).orderBy($"id").collect().toSeq
    def served() = Versioned.readMergeOnRead(spark, dir, "dv_data",
      "m", "id").select($"id", $"m", $"v").orderBy($"id").collect().toSeq

    // batch 1: scattered deletes in months 1 and 4
    val p1 = $"id" % 7 === 0 && ($"m" === 1L || $"m" === 4L)
    Versioned.appendDeleteVectors(spark, dir, "dv_data", "m", "id",
      del(p1).localCheckpoint(true))
    assert(partFiles(root) == before,
      "a deletion-vector append modified a data file")
    assert(served() == expect(p1))

    // batch 2 accumulates; replaying batch 1 is a content no-op
    val p2 = $"id" % 11 === 0 && $"m" === 1L
    Versioned.appendDeleteVectors(spark, dir, "dv_data", "m", "id",
      del(p2).localCheckpoint(true))
    Versioned.appendDeleteVectors(spark, dir, "dv_data", "m", "id",
      del(p1).localCheckpoint(true))
    assert(partFiles(root) == before)
    val both = p1 || p2
    assert(served() == expect(both))
    val dvRows = Versioned.readPartitioned(spark, dir,
      Versioned.dvPrefix("dv_data")).count()
    assert(dvRows == df.filter(both).count(),
      "replayed delete batches must not duplicate vector rows")

    // purge: months 1 and 4 rewritten minus-deleted, others untouched,
    // vectors cleared, serving unchanged, plain reads now equal too
    val purged = Versioned.purgeDeleteVectors(spark, dir, "dv_data",
      "m", "id")
    assert(purged.map(_.toString).toSet == Set("1", "4"))
    val after = partFiles(root)
    for (p <- Seq("m=0", "m=2", "m=3", "m=5"))
      assert(after(p) == before(p), s"purge rewrote untouched $p")
    assert(after("m=1") != before("m=1"), "purge must rewrite m=1")
    assert(served() == expect(both))
    assert(Versioned.readPartitioned(spark, dir, "dv_data")
      .orderBy($"id").select($"id", $"m", $"v").collect().toSeq ==
      expect(both), "post-purge plain read must equal minus-deleted")
    assert(partFiles(Versioned.partitionedRoot(dir,
      Versioned.dvPrefix("dv_data"))).values.forall(_.isEmpty),
      "purge must clear the folded vectors")
    // replayed purge: nothing left to fold
    assert(Versioned.purgeDeleteVectors(spark, dir, "dv_data", "m",
      "id").isEmpty)
  }
}
