package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.io.Versioned
import graft.streaming.StreamLakeSink

/** Streaming publish into the generation-pinned snapshot lane:
  * micro-batches converge to the batch keyed-replacement state, a
  * replayed batch no-ops, a crashed publish is invisible and its replay
  * completes, and every committed epoch stays readable as a
  * time-travel snapshot until GC'd.
  */
class StreamLakeSpec extends SparkTestBase {
  import spark.implicits._

  private def served(dir: String) =
    Versioned.readSnapshotPartitions(spark, dir, "slk_root", "slk_data",
        "m", None)
      .select($"k", $"m", $"v").as[(Long, Long, Long)].collect().toSet

  test("micro-batches commit exactly-once; keyed replacement; crash replay; per-epoch time travel") {
    implicit val sc = spark.sqlContext
    val dir = graft.core.Scratch.dir("stream_lake")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("slk_root__")).foreach(_.delete()))
    val in = MemoryStream[(Long, Long, Long)]
    val stream = in.toDF().toDF("k", "m", "v")

    val q = StreamLakeSink.run(stream, dir, "slk_root", "slk_data",
      "m", "k")
    // batch 0: keys 1-4 across months 0/1
    in.addData((1L, 0L, 10L), (2L, 0L, 20L), (3L, 1L, 30L), (4L, 1L, 40L))
    q.processAllAvailable()
    val epoch0 = served(dir)
    assert(epoch0 == Set((1L, 0L, 10L), (2L, 0L, 20L), (3L, 1L, 30L),
      (4L, 1L, 40L)))
    // batch 1: k2 re-emitted with a new value (replacement, month 0
    // rewritten), k5 lands in a new month 2; month 1 untouched
    in.addData((2L, 0L, 21L), (5L, 2L, 50L))
    q.processAllAvailable()
    q.stop()
    val epoch1 = served(dir)
    assert(epoch1 == Set((1L, 0L, 10L), (2L, 0L, 21L), (3L, 1L, 30L),
      (4L, 1L, 40L), (5L, 2L, 50L)),
      "keyed replacement must replace, not duplicate")
    val tags = Versioned.manifestTags(dir, "slk_root")
    assert(tags.size == 2)

    // per-epoch TIME TRAVEL: batch 0's snapshot is still readable
    val t0 = Versioned.readSnapshotPartitionsAt(spark, dir, "slk_root",
        StreamLakeSink.batchTag(0L), "slk_data", "m", None)
      .select($"k", $"m", $"v").as[(Long, Long, Long)].collect().toSet
    assert(t0 == epoch0, "epoch-0 time travel diverged")

    // REPLAY of a committed batch (recovery re-runs the last batch):
    // short-circuits, nothing changes
    val batch1 = Seq((2L, 0L, 21L), (5L, 2L, 50L)).toDF("k", "m", "v")
    assert(!StreamLakeSink.commitBatch(spark, dir, "slk_root",
      "slk_data", "m", "k", batch1, 1L))
    assert(served(dir) == epoch1)
    assert(Versioned.manifestTags(dir, "slk_root").size == 2)

    // CRASH: batch 2's generations written, manifest never committed —
    // readers stay on epoch 1; the replayed commitBatch completes
    val batch2 = Seq((3L, 1L, 31L), (6L, 0L, 60L)).toDF("k", "m", "v")
    val pins1 = Versioned.snapshotPins(dir, "slk_root", "slk_data")
    Versioned.writeSnapshotPartitions(
      Versioned.readSnapshotAt(spark, dir, "slk_data", "m", pins1,
          Some(Seq(0L, 1L)))
        .join(batch2.select($"k").distinct(), Seq("k"), "left_anti")
        .unionByName(batch2).localCheckpoint(true),
      dir, "slk_data", "m", StreamLakeSink.batchTag(2L))
    assert(served(dir) == epoch1,
      "a crashed batch publish leaked before its manifest commit")
    assert(StreamLakeSink.commitBatch(spark, dir, "slk_root", "slk_data",
      "m", "k", batch2, 2L))
    assert(served(dir) == Set((1L, 0L, 10L), (2L, 0L, 21L), (3L, 1L, 31L),
      (4L, 1L, 40L), (5L, 2L, 50L), (6L, 0L, 60L)))

    // GC to keep-last-2: epoch 0 leaves the catalog, 1 and 2 survive
    Versioned.gcThroughManifest(dir, "slk_root", keepLast = 2)
    Versioned.gcSnapshotGenerations(dir, "slk_root", "slk_data",
      keepLast = 2)
    intercept[IllegalArgumentException] {
      Versioned.readSnapshotPartitionsAt(spark, dir, "slk_root",
        StreamLakeSink.batchTag(0L), "slk_data", "m", None)
    }
    val t1 = Versioned.readSnapshotPartitionsAt(spark, dir, "slk_root",
        StreamLakeSink.batchTag(1L), "slk_data", "m", None)
      .select($"k", $"m", $"v").as[(Long, Long, Long)].collect().toSet
    assert(t1 == epoch1, "a retained epoch broke after GC")

    // an ANCIENT batch replayed long after its successors committed
    // (a zombie recovery) must short-circuit on the monotone-tag rule
    // — not clobber the lake with stale data
    val current = served(dir)
    val zombie = Seq((1L, 0L, 10L), (2L, 0L, 20L)).toDF("k", "m", "v")
    assert(!StreamLakeSink.commitBatch(spark, dir, "slk_root",
      "slk_data", "m", "k", zombie, 0L),
      "a zombie batch replay must not publish")
    assert(served(dir) == current,
      "a zombie batch replay changed the served state")
  }

  test("epochs maintain the skipping sidecars in the same commit; a maintenance tag on the manifest never drops a batch") {
    import graft.io.FileStats
    implicit val sc = spark.sqlContext
    val dir = graft.core.Scratch.dir("stream_lake_side")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("sls_root__")).foreach(_.delete()))
    val in = MemoryStream[(Long, Long, Long)]
    val stream = in.toDF().toDF("k", "m", "v")

    def fullFiltered(lo: Long, hi: Long) =
      Versioned.readSnapshotPartitions(spark, dir, "sls_root",
          "sls_data", "m", None)
        .filter($"v" >= lo && $"v" <= hi)
        .select($"k", $"m", $"v").as[(Long, Long, Long)].collect().toSet
    def skipFiltered(lo: Long, hi: Long) =
      FileStats.readSkippingSnapshot(spark, dir, "sls_root", "sls_data",
          "m", "v", Some(lo), Some(hi))
        .select($"k", $"m", $"v").as[(Long, Long, Long)].collect().toSet
    def statsExact(): Unit = {
      // the sidecar's part directory values ("0", "1") re-infer as int
      // on read-back; normalize to string for the twin compare
      val got = FileStats.statsOnlyAggSnapshot(spark, dir, "sls_root",
          "sls_data")
        .withColumn("part", $"part".cast("string"))
        .orderBy($"part").collect().toSeq
      val want = Versioned.readSnapshotPartitions(spark, dir, "sls_root",
          "sls_data", "m", None)
        .groupBy($"m".cast("string").as("part"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count($"v")).as("n_nulls"),
          min($"v").as("min_v"), max($"v").as("max_v"))
        .orderBy($"part").collect().toSeq
      assert(got == want, "stats-only aggregate drifted from the data")
    }

    val q = StreamLakeSink.run(stream, dir, "sls_root", "sls_data",
      "m", "k", zoneStat = Some("v"),
      bloomKey = Some(("k", 1000L, 10000L)))
    in.addData((1L, 0L, 10L), (2L, 0L, 20L), (3L, 1L, 30L))
    q.processAllAvailable()
    assert(skipFiltered(15L, 35L) == fullFiltered(15L, 35L))
    assert(skipFiltered(15L, 35L) == Set((2L, 0L, 20L), (3L, 1L, 30L)))
    statsExact()

    // epoch 2 replaces k2 and opens month 2: the touched months'
    // sidecar generations ride the same commit — a stale sidecar here
    // would prune through month 0's OLD v=20 zone and lose the v=21 row
    in.addData((2L, 0L, 21L), (5L, 2L, 50L))
    q.processAllAvailable()
    q.stop()
    assert(skipFiltered(15L, 35L) == fullFiltered(15L, 35L))
    assert(skipFiltered(15L, 35L) == Set((2L, 0L, 21L), (3L, 1L, 30L)))
    statsExact()
    // point lookup through the pinned bloom sidecar
    val hit = FileStats.readBloomSkippingSnapshot(spark, dir, "sls_root",
        "sls_data", "m", "k", 2L)
      .select($"k", $"m", $"v").as[(Long, Long, Long)].collect().toSet
    assert(hit == Set((2L, 0L, 21L)),
      "bloom lookup served a stale or duplicated key")

    // MAINTENANCE commit between batches (compaction's no-op re-commit
    // at a non-batch tag sorting ABOVE the last batch tag): the next
    // batch must still publish — comparing against non-batch tags was
    // the silent-drop hazard
    val maintTag = StreamLakeSink.batchTag(1L).stripSuffix("_strm") + "_zmaint"
    Versioned.commitManifest(dir, "sls_root", maintTag,
      Versioned.latestManifest(dir, "sls_root").get._2)
    assert(maintTag > StreamLakeSink.batchTag(1L) &&
      maintTag < StreamLakeSink.batchTag(2L), "fixture tag ordering broke")
    val batch2 = Seq((6L, 1L, 60L)).toDF("k", "m", "v")
    assert(StreamLakeSink.commitBatch(spark, dir, "sls_root", "sls_data",
      "m", "k", batch2, 2L, zoneStat = Some("v"),
      bloomKey = Some(("k", 1000L, 10000L))),
      "a maintenance tag on the manifest silently dropped a batch")
    assert(skipFiltered(55L, 65L) == Set((6L, 1L, 60L)))
    statsExact()
    // and a genuine replay of batch 2 still short-circuits
    assert(!StreamLakeSink.commitBatch(spark, dir, "sls_root", "sls_data",
      "m", "k", batch2, 2L, zoneStat = Some("v"),
      bloomKey = Some(("k", 1000L, 10000L))))

    // RESTART AMNESIA: batch 3 commits with NO sidecar arguments — the
    // specs pinned in the manifest keep the sidecars maintained, so a
    // restarted stream cannot silently strand them
    val batch3 = Seq((7L, 2L, 70L)).toDF("k", "m", "v")
    assert(StreamLakeSink.commitBatch(spark, dir, "sls_root", "sls_data",
      "m", "k", batch3, 3L))
    assert(skipFiltered(65L, 75L) == Set((7L, 2L, 70L)),
      "a spec-less restart stranded the zone sidecar")
    statsExact()
    assert(FileStats.readBloomSkippingSnapshot(spark, dir, "sls_root",
        "sls_data", "m", "k", 7L)
      .select($"k", $"m", $"v").as[(Long, Long, Long)].collect().toSet ==
      Set((7L, 2L, 70L)), "a spec-less restart stranded the bloom sidecar")
  }

  test("a batch commit carries the WHOLE shared manifest forward: other roots' pins, pinned delete batches, multi sidecars") {
    import graft.io.FileStats
    val dir = graft.core.Scratch.dir("stream_lake_share")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("slh_root__")).foreach(_.delete()))

    // batch 0 establishes the sink's root on the manifest, WITH a
    // multi-column sidecar (spec pins with the epoch)
    val batch0 = Seq((1L, 0L, 10L, 100L), (2L, 0L, 20L, 200L),
      (3L, 1L, 30L, 300L)).toDF("k", "m", "v", "w")
    assert(StreamLakeSink.commitBatch(spark, dir, "slh_root", "slh_data",
      "m", "k", batch0, 0L, zoneMultiCols = Some(Seq("v", "w"))))
    // through the FACADE (after the pinned delete batch below lands,
    // the raw readSkippingMultiSnapshot rightly refuses DV-dirty roots;
    // readTable composes the multi sidecar with the DV anti-join)
    val boxRead = () => graft.io.LakeTable.readTable(spark, dir,
        "slh_data", "m", manifestPrefix = Some("slh_root"),
        ranges = Seq(("v", Some(15L), Some(35L)),
          ("w", Some(150L), Some(250L))))
      .select($"k", $"m", $"v", $"w")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(boxRead() == Set((2L, 0L, 20L, 200L)))

    // a SECOND root and a PINNED DELETE BATCH land on the same
    // manifest between epochs (maintenance tags sort between batch 0
    // and batch 1)
    val otherTag = StreamLakeSink.batchTag(0L).stripSuffix("_strm") + "_zother"
    val oP = Versioned.writeSnapshotFull(
      Seq((100L, 0L), (200L, 1L)).toDF("x", "m"), dir, "slh_other", "m",
      otherTag)
    Versioned.commitManifest(dir, "slh_root", otherTag,
      Versioned.latestManifest(dir, "slh_root").get._2 ++
        oP.map(v => Versioned.snapshotPinKey("slh_other", v) -> otherTag))
    val dvTag = StreamLakeSink.batchTag(0L).stripSuffix("_strm") + "_zzdel"
    Versioned.commitSnapshotDeleteVectors(spark, dir, "slh_root",
      "slh_data", "m", "k", Seq((0L, 1L)).toDF("m", "k"), dvTag)
    def servedMinusDeleted() =
      Versioned.readSnapshotMergeOnRead(spark, dir, "slh_root",
          "slh_data", "m", "k")
        .select($"k", $"m", $"v", $"w")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(servedMinusDeleted() ==
      Set((2L, 0L, 20L, 200L), (3L, 1L, 30L, 300L)))

    // batch 1 touches month 1 only: before the carry-forward fix this
    // commit REBUILT the entry map from the sink's own keys — erasing
    // slh_other's pins and the DV pins (deleted k=1 resurrected)
    val batch1 = Seq((4L, 1L, 40L, 400L)).toDF("k", "m", "v", "w")
    assert(StreamLakeSink.commitBatch(spark, dir, "slh_root", "slh_data",
      "m", "k", batch1, 1L))
    assert(Versioned.snapshotPins(dir, "slh_root", "slh_other")
      .values.toSet == Set(otherTag),
      "a batch commit dropped another root's pins from the shared manifest")
    assert(servedMinusDeleted() ==
      Set((2L, 0L, 20L, 200L), (3L, 1L, 30L, 300L), (4L, 1L, 40L, 400L)),
      "a batch commit dropped the pinned delete batch — deleted rows resurrected")
    // the multi sidecar stayed maintained through the spec-less epoch
    // (restart amnesia) and the untouched month kept its pins
    assert(boxRead() == Set((2L, 0L, 20L, 200L)))
    assert(graft.io.LakeTable.readTable(spark, dir, "slh_data", "m",
        manifestPrefix = Some("slh_root"),
        ranges = Seq(("v", Some(35L), Some(45L)),
          ("w", Some(350L), Some(450L))))
      .select($"k").as[Long].collect().toSet == Set(4L),
      "the multi sidecar went stale through a streamed epoch")
  }
}
