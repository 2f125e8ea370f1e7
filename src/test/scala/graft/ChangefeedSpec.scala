package graft

import org.apache.spark.sql.functions._
import graft.io.{FileStats, LakeTable, Versioned}

/** Changefeed between manifest tags ([[Versioned.snapshotChangefeed]],
  * q425): row-level added/removed/changed between the snapshots two
  * committed tags served, read ONLY from the partitions whose pins
  * moved. Pins: equality with the full-diff twin, the numFiles
  * certificate (unmoved partitions never scheduled), pin-drop
  * retraction as `removed`, pinned DV batches as `removed`, additive
  * schema evolution aligned (not an error), in-place erasure absent
  * from BOTH sides, and the type-change refusal.
  */
class ChangefeedSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(lo: Long, hi: Long, shift: Long = 0L) =
    spark.range(lo, hi).select($"id",
      expr("id div 1000").as("m"), ($"id" * 3 + shift).as("v"))

  private def scanNumFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metrics("numFiles").value).sum
  }

  test("feed ≡ full diff; only churned partitions scheduled; pin drops, DV batches, evolution, erasure") {
    val dir = graft.core.Scratch.dir("changefeed")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("cfs_root__")).foreach(_.delete()))
    val base = mk(0, 8000)
    val g1 = "00000001_a"
    LakeTable.commitSnapshot(spark, dir, "cfs_root", g1,
      Seq(LakeTable.RootPublish("cfs_data", "m", base)))

    // g2: month 2 rewritten (shifted v, one id dropped, one id added,
    // and an ADDED COLUMN w) and month 5 EMPTIED via the staged
    // facade's pin-drop retraction
    val g2 = "00000002_b"
    val month2 = base.filter($"m" === 2L && $"id" =!= 2004L)
      .select($"id", $"m", ($"v" + 100000L).as("v"))
      .unionByName(Seq((902004L, 2L, 42L)).toDF("id", "m", "v"))
      .withColumn("w", $"id" % 7)
      .localCheckpoint(true)
    val stage = LakeTable.stage(spark, dir, "cfs_root", g2)
    stage.publish("cfs_data", "m", month2, touched = Seq(2L, 5L))
    stage.commit()

    // g3: a pinned delete batch over month 0
    val g3 = "00000003_c"
    Versioned.commitSnapshotDeleteVectors(spark, dir, "cfs_root",
      "cfs_data", "m", "id",
      base.filter($"m" === 0L && $"id" % 9 === 0)
        .select($"m", $"id").localCheckpoint(true), g3)

    // in-place ERASURE of one month-2 id: absent from BOTH sides, so
    // it must never surface in the feed even though month 2 churned
    Versioned.appendDeleteVectors(spark, dir, "cfs_data", "m", "id",
      Seq((2L, 2010L)).toDF("m", "id").localCheckpoint(true))

    def feed(from: String, to: String) =
      Versioned.snapshotChangefeed(spark, dir, "cfs_root", "cfs_data",
        "m", Seq("id"), from, to)
    val got = feed(g1, g3)
      .select($"id", $"change").orderBy($"id", $"change")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    // the full-diff twin: both tags' SERVED views over the whole root
    def served(tag: String) = {
      val entries = Versioned.manifestAt(dir, "cfs_root", tag).get
      def pinsOf(p: String) = entries.collect {
        case (k, g) if k.startsWith(s"$p/") => k.stripPrefix(s"$p/") -> g }
      val data = Versioned.readSnapshotAt(spark, dir, "cfs_data", "m",
        pinsOf("cfs_data"), None, mergeSchema = true)
      val dvPins = pinsOf(Versioned.dvPrefix("cfs_data"))
      val d2 =
        if (dvPins.isEmpty) data
        else data.join(Versioned.readSnapshotAt(spark, dir,
          Versioned.dvPrefix("cfs_data"), "m", dvPins, None),
          Seq("m", "id"), "left_anti")
      d2.filter($"id" =!= 2010L) // the in-place erasure, by hand
    }
    def withW(df: org.apache.spark.sql.DataFrame) =
      if (df.columns.contains("w")) df
      else df.withColumn("w", lit(null).cast("long"))
    val want = Versioned.snapshotDiff(withW(served(g1)), withW(served(g3)),
        Seq("id"))
      .select($"id", $"change").orderBy($"id", $"change")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want, "changefeed diverged from the full-diff twin")

    // spot semantics: month-5 rows removed (pin drop), month-0 %9
    // removed (DV batch), month-2 rows changed (shift + evolved w),
    // 2004 removed / 902004 added, erased 2010 ABSENT
    val byChange = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byChange("removed").contains(5000L) &&
      byChange("removed").contains(2004L) &&
      byChange("removed").contains(0L) && // id 0: m=0, %9
      byChange("added") == Set(902004L))
    assert(byChange("changed").contains(2000L))
    assert(!got.exists(_._1 == 2010L),
      "an erased row surfaced in the changefeed")
    // no unmoved month leaked in: every surfaced id lives in month
    // 0, 2 or 5
    assert(got.forall { case (id, _) =>
      id == 902004L || id / 1000 == 0L || id / 1000 == 2L ||
        id / 1000 == 5L },
      "a row from an unmoved partition surfaced")

    // numFiles certificate: the feed schedules ONLY the churned
    // partitions' files — old side months {0,2,5}, new side {0,2}
    // (5's pin dropped), plus the DV generation's month-0 file; the
    // five unmoved months' files are never touched
    spark.catalog.clearCache()
    val n = scanNumFiles(feed(g1, g3))
    assert(n <= 7L,
      s"changefeed scheduled $n files — unmoved partitions were read")

    // a column TYPE change between tags refuses loudly
    val g4 = "00000004_d"
    val stage4 = LakeTable.stage(spark, dir, "cfs_root", g4)
    stage4.publish("cfs_data", "m",
      Seq((903000L, 3L, 1L, "oops")).toDF("id", "m", "v", "w")
        .localCheckpoint(true), touched = Seq(3L))
    stage4.commit()
    // loud either way: parquet's own merge failure when both types
    // meet inside one side's read, or the changefeed's union-type
    // refusal when they only meet across sides — never a silent coerce
    val ex = intercept[Exception] {
      Versioned.snapshotChangefeed(spark, dir, "cfs_root", "cfs_data",
        "m", Seq("id"), g1, g4)
    }
    val msg = ex.getMessage.toLowerCase
    assert(msg.contains("type") || msg.contains("merg"),
      s"expected a loud type-conflict failure, got: ${ex.getMessage}")
  }

  test("changefeed over STREAMED epochs: the feed between two batch tags is the keyed diff of what the sink published") {
    import graft.streaming.StreamLakeSink
    val dir = graft.core.Scratch.dir("changefeed_stream")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("cfm_root__")).foreach(_.delete()))
    val b0 = Seq((1L, 0L, 10L), (2L, 0L, 20L), (3L, 1L, 30L))
      .toDF("k", "m", "v")
    val b1 = Seq((2L, 0L, 21L), (5L, 2L, 50L)).toDF("k", "m", "v")
    val b2 = Seq((3L, 1L, 31L), (6L, 2L, 60L)).toDF("k", "m", "v")
    assert(StreamLakeSink.commitBatch(spark, dir, "cfm_root", "cfm_data",
      "m", "k", b0, 0L))
    assert(StreamLakeSink.commitBatch(spark, dir, "cfm_root", "cfm_data",
      "m", "k", b1, 1L))
    assert(StreamLakeSink.commitBatch(spark, dir, "cfm_root", "cfm_data",
      "m", "k", b2, 2L))
    // epoch tags ARE manifest tags: the feed 0→2 is exactly the keyed
    // replacement diff (k2 changed in epoch 1, k3 changed in epoch 2,
    // k5/k6 added; k1/k4 untouched) — the incremental-consumer read of
    // a streamed lake table
    val feed = Versioned.snapshotChangefeed(spark, dir, "cfm_root",
        "cfm_data", "m", Seq("k"),
        StreamLakeSink.batchTag(0L), StreamLakeSink.batchTag(2L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed == Set((2L, "changed"), (3L, "changed"),
      (5L, "added"), (6L, "added")),
      s"streamed-epoch changefeed diverged: $feed")
    // consecutive epochs compose: feed(0→1) then feed(1→2)
    val f01 = Versioned.snapshotChangefeed(spark, dir, "cfm_root",
        "cfm_data", "m", Seq("k"),
        StreamLakeSink.batchTag(0L), StreamLakeSink.batchTag(1L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val f12 = Versioned.snapshotChangefeed(spark, dir, "cfm_root",
        "cfm_data", "m", Seq("k"),
        StreamLakeSink.batchTag(1L), StreamLakeSink.batchTag(2L))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(f01 == Set((2L, "changed"), (5L, "added")))
    assert(f12 == Set((3L, "changed"), (6L, "added")))

    // the CONSUMER loop: followManifest walks every window after the
    // cursor exactly once (oldest first), returns the new cursor, and
    // a caught-up cursor consumes nothing
    var seen = List.empty[(String, String)]
    val cursor = Versioned.followManifest(dir, "cfm_root",
      StreamLakeSink.batchTag(0L)) { (a, b) => seen :+= (a, b) }
    assert(seen == List(
      (StreamLakeSink.batchTag(0L), StreamLakeSink.batchTag(1L)),
      (StreamLakeSink.batchTag(1L), StreamLakeSink.batchTag(2L))),
      s"consumer walked the wrong windows: $seen")
    assert(cursor == StreamLakeSink.batchTag(2L))
    var n2 = 0
    assert(Versioned.followManifest(dir, "cfm_root", cursor) {
      (_, _) => n2 += 1 } == cursor && n2 == 0,
      "a caught-up consumer must consume nothing")
    // a cursor outside retention refuses — the missed windows are
    // unknowable (re-bootstrap, don't silently skip)
    intercept[IllegalArgumentException] {
      Versioned.followManifest(dir, "cfm_root", "00000000000000000000_gone") {
        (_, _) => ()
      }
    }
  }

  test("changefeed-driven LSH maintenance: post-cycle signature state ≡ full rebuild over the target snapshot") {
    // q427's fixture: corpus appends through the write facade, a %13
    // takedown as a pinned delete batch, the bucketed signature store
    // maintained purely from the feed — after the cycle the published
    // state must equal signatureState() rebuilt over exactly the docs
    // the target snapshot serves
    SparkEntry.queries("q427_lsh_changefeed")(spark, sfDir).collect()
    val dir = graft.core.Scratch.dir("q427_lcf")
    val got = Versioned.readPartitioned(spark, dir, "lcf_state")
      .select($"id", $"sig").as[(Long, Seq[Long])]
      .collect().toSeq.sortBy(_._1)
    val survivors = graft.core.Tables.documents(spark, sfDir)
      .filter(!($"doc_id" % 13 === 0 && $"doc_id" % 17 =!= 0))
    val want = graft.ext.Dedup.signatureState(survivors, "doc_id",
        "text", n = 2, bands = 21, rowsPerBand = 3)
      .select($"id", $"sig").as[(Long, Seq[Long])]
      .collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == want.map(_._1),
      "the feed-maintained state's id set drifted from the snapshot")
    assert(got == want,
      "the feed-maintained state's signatures drifted from the rebuild")
    // and the state genuinely FORGOT the takedown: no %13-only id left
    assert(!got.exists { case (id, _) => id % 13 == 0 && id % 17 != 0 },
      "a taken-down id survived in the signature state")
  }
}
