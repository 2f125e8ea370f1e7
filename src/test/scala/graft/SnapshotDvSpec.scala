package graft

import org.apache.spark.sql.functions._
import graft.io.{LakeTable, Versioned}

/** Manifest-pinned deletion vectors — the TRANSACTIONAL twin of the
  * in-place DV lane: a delete batch publishes its vectors as a new
  * generation and commits one manifest, so deletes are atomic with
  * everything else the manifest pins, a time-traveled read shows the
  * delete STATE AS OF that tag (isolation, not erasure), zombie
  * replays are refused before any write, and a purge folds the pinned
  * vectors into a data rewrite + pin drop in one commit.
  */
class SnapshotDvSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(n: Int) = spark.range(n.toLong).select(
    $"id", expr("id div 1000").as("m"), ($"id" * 3).as("v"))

  private def leafFingerprints(dir: String, prefix: String) = {
    val root = new java.io.File(Versioned.snapshotRoot(dir, prefix))
    Option(root.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isDirectory).sortBy(_.getName).map { p =>
        p.getName -> Option(p.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          .filter(_.isDirectory).sortBy(_.getName).flatMap(g =>
            Option(g.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
              .filter(_.getName.endsWith(".parquet"))
              .map(f => (g.getName, f.getName, f.length, f.lastModified)))
      }
  }

  test("delete batches commit atomically, isolate across tags, refuse zombies, and purge folds pins away") {
    val dir = graft.core.Scratch.dir("snap_dv")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("sdv_root__")).foreach(_.delete()))
    val df = mk(8000)
    val g1 = "00000001_a"
    val p1 = Versioned.writeSnapshotFull(df, dir, "sdv_data", "m", g1)
    Versioned.commitManifest(dir, "sdv_root", g1,
      p1.map(v => Versioned.snapshotPinKey("sdv_data", v) -> g1).toMap)
    val dataBefore = leafFingerprints(dir, "sdv_data")

    def served(asOf: Option[String]) =
      Versioned.readSnapshotMergeOnRead(spark, dir, "sdv_root",
          "sdv_data", "m", "id", asOf)
        .select($"id", $"m", $"v").orderBy($"id").collect().toSeq
    def expect(pred: org.apache.spark.sql.Column) =
      df.filter(!pred).orderBy($"id").collect().toSeq
    val p7 = $"id" % 7 === 0 && ($"m" === 1L || $"m" === 4L)
    val p11 = $"id" % 11 === 0 && $"m" === 1L

    // batch 1 @ g2: data files untouched, latest serves minus-deleted,
    // g1 time travel still serves EVERYTHING (isolation, not erasure)
    val g2 = "00000002_b"
    Versioned.commitSnapshotDeleteVectors(spark, dir, "sdv_root",
      "sdv_data", "m", "id",
      df.filter(p7).select($"m", $"id").localCheckpoint(true), g2)
    assert(leafFingerprints(dir, "sdv_data") == dataBefore,
      "a pinned delete batch modified a data file")
    assert(served(None) == expect(p7))
    assert(served(Some(g1)) == df.orderBy($"id").collect().toSeq,
      "time travel to the pre-delete tag must show all rows")

    // batch 2 @ g3 accumulates; as-of g2 shows ONLY batch 1's deletes
    val g3 = "00000003_c"
    Versioned.commitSnapshotDeleteVectors(spark, dir, "sdv_root",
      "sdv_data", "m", "id",
      df.filter(p11).select($"m", $"id").localCheckpoint(true), g3)
    assert(served(None) == expect(p7 || p11))
    assert(served(Some(g2)) == expect(p7),
      "as-of g2 must show the delete state as of g2, not today's")

    // replay of the LAST batch no-ops through the same-tag/same-entries
    // path; a ZOMBIE replay of an older batch is refused BEFORE writes
    Versioned.commitSnapshotDeleteVectors(spark, dir, "sdv_root",
      "sdv_data", "m", "id",
      df.filter(p11).select($"m", $"id").localCheckpoint(true), g3)
    assert(served(None) == expect(p7 || p11))
    val ex = intercept[IllegalArgumentException] {
      Versioned.commitSnapshotDeleteVectors(spark, dir, "sdv_root",
        "sdv_data", "m", "id",
        df.filter(p7).select($"m", $"id").localCheckpoint(true), g2)
    }
    assert(ex.getMessage.contains("stale"),
      s"expected the zombie refusal, got: ${ex.getMessage}")

    // the facade resolves the pinned vectors per manifest generation
    def facade(asOf: Option[String]) =
      LakeTable.readTable(spark, dir, "sdv_data", "m",
        manifestPrefix = Some("sdv_root"), asOfTag = asOf)
        .select($"id", $"m", $"v").orderBy($"id").collect().toSeq
    assert(facade(None) == expect(p7 || p11))
    assert(facade(Some(g2)) == expect(p7))
    assert(facade(Some(g1)) == df.orderBy($"id").collect().toSeq)

    // purge @ g4: only delete-carrying months rewrite, DV pins drop,
    // serving unchanged, plain pinned reads now equal too
    val g4 = "00000004_d"
    val purged = Versioned.purgeSnapshotDeleteVectors(spark, dir,
      "sdv_root", "sdv_data", "m", "id", g4)
    assert(purged.toSet == Set("1", "4"))
    assert(served(None) == expect(p7 || p11))
    assert(Versioned.readSnapshotPartitions(spark, dir, "sdv_root",
        "sdv_data", "m", None)
      .select($"id", $"m", $"v").orderBy($"id").collect().toSeq ==
      expect(p7 || p11), "post-purge plain pinned read must be folded")
    assert(Versioned.snapshotPins(dir, "sdv_root",
      Versioned.dvPrefix("sdv_data")).isEmpty,
      "purge must drop the DV pins")
    val untouchedPins = Versioned.snapshotPins(dir, "sdv_root", "sdv_data")
    assert(Seq("0", "2", "3", "5", "6", "7").forall(
      untouchedPins(_) == g1), "purge re-pinned a delete-free month")
    assert(Versioned.purgeSnapshotDeleteVectors(spark, dir, "sdv_root",
      "sdv_data", "m", "id", "00000005_e").isEmpty)

    // GC reclaims the superseded data and DV generations; serving holds
    Versioned.gcThroughManifest(dir, "sdv_root", keepLast = 1)
    Versioned.gcSnapshotGenerations(dir, "sdv_root", "sdv_data", 1)
    Versioned.gcSnapshotGenerations(dir, "sdv_root",
      Versioned.dvPrefix("sdv_data"), 1)
    assert(served(None) == expect(p7 || p11))
    assert(facade(None) == expect(p7 || p11))
  }

  test("purge re-derives every pinned sidecar in the same commit: refusal without a spec, purge → GC → skipping ≡ survivors") {
    import graft.io.FileStats
    val dir = graft.core.Scratch.dir("snap_dv_side")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("sds_root__")).foreach(_.delete()))
    val zmap = FileStats.sidecarPrefix("sds_data")
    val bmap = FileStats.bloomPrefix("sds_data")
    val zmapm = FileStats.sidecarMultiPrefix("sds_data")
    val df = mk(8000)
    val g1 = "00000001_a"
    val dP = Versioned.writeSnapshotFull(df, dir, "sds_data", "m", g1)
    val dPins = dP.map(_.toString -> g1).toMap
    val zP = FileStats.writeSnapshotSidecar(spark, dir, "sds_data", "m",
      "v", dPins, dP.toSeq, g1)
    val bP = FileStats.writeSnapshotBloomSidecar(spark, dir, "sds_data",
      "m", "id", dPins, dP.toSeq, g1, itemsPerFile = 10000L,
      numBits = 100000L)
    val mP = FileStats.writeSnapshotSidecarMulti(spark, dir, "sds_data",
      "m", Seq("v", "id"), dPins, dP.toSeq, g1)
    def pinKeys(p: String, vs: Set[Any]) =
      vs.map(v => Versioned.snapshotPinKey(p, v) -> g1).toMap
    // the zone and multi SPECS ride the manifest; the bloom spec does
    // NOT — the purge must resolve the former and refuse on the latter
    Versioned.commitManifest(dir, "sds_root", g1,
      pinKeys("sds_data", dP) ++ pinKeys(zmap, zP) ++
        pinKeys(bmap, bP) ++ pinKeys(zmapm, mP) +
        FileStats.zoneSpecEntry("sds_data", "v") +
        FileStats.zoneMultiSpecEntry("sds_data", Seq("v", "id")))

    val dead = $"id" % 7 === 0 && ($"m" === 1L || $"m" === 4L)
    val g2 = "00000002_b"
    Versioned.commitSnapshotDeleteVectors(spark, dir, "sds_root",
      "sds_data", "m", "id",
      df.filter(dead).select($"m", $"id").localCheckpoint(true), g2)

    // with DV pins outstanding, the RAW snapshot skipping paths refuse
    // (they would resurrect the pinned deletes — readTable is the
    // sanctioned composition, same posture as the in-place lane)
    Seq(
      () => FileStats.readSkippingSnapshot(spark, dir, "sds_root",
        "sds_data", "m", "v", Some(0L), Some(100L)),
      () => FileStats.readSkippingMultiSnapshot(spark, dir, "sds_root",
        "sds_data", "m", Seq(("v", Some(0L), Some(100L)))),
      () => FileStats.readBloomSkippingSnapshot(spark, dir, "sds_root",
        "sds_data", "m", "id", 7L)
    ).foreach { f =>
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("pinned-deleted"),
        s"expected the pinned-DV refusal, got: ${e.getMessage}")
    }
    // ...while the facade composes the pinned vectors correctly
    assert(graft.io.LakeTable.readTable(spark, dir, "sds_data", "m",
        manifestPrefix = Some("sds_root"),
        ranges = Seq(("v", Some(3000L), Some(4000L))))
      .select($"id", $"m", $"v").orderBy($"id").collect().toSeq ==
      df.filter(!dead && $"v" >= 3000L && $"v" <= 4000L)
        .select($"id", $"m", $"v").orderBy($"id").collect().toSeq)

    // bloom sidecar pinned, spec neither passed nor manifest-pinned:
    // the purge refuses BEFORE any write
    val ex = intercept[IllegalArgumentException] {
      Versioned.purgeSnapshotDeleteVectors(spark, dir, "sds_root",
        "sds_data", "m", "id", "00000003_c")
    }
    assert(ex.getMessage.contains("strand"),
      s"expected the stranded-sidecar refusal, got: ${ex.getMessage}")
    assert(Versioned.snapshotPins(dir, "sds_root",
      Versioned.dvPrefix("sds_data")).nonEmpty,
      "a refused purge dropped the DV pins")

    // with the bloom spec passed (zone + multi resolve from the
    // manifest) the purge re-pins all three sidecars for the touched
    // months in the SAME commit
    val g3 = "00000003_c"
    val purged = Versioned.purgeSnapshotDeleteVectors(spark, dir,
      "sds_root", "sds_data", "m", "id", g3,
      bloomSpec = Some(("id", 10000L, 100000L)))
    assert(purged.toSet == Set("1", "4"))
    Seq(zmap, bmap, zmapm).foreach { p =>
      val pins = Versioned.snapshotPins(dir, "sds_root", p)
      assert(pins("1") == g3 && pins("4") == g3,
        s"purge did not re-pin sidecar $p for the touched months")
      assert(pins("0") == g1, s"purge re-pinned an untouched month of $p")
    }

    // GC reclaims the superseded generations of data AND sidecars;
    // before the fix every skipping path below either served PRE-PURGE
    // rows (resurrected deletes) or crashed on the reclaimed files
    Versioned.gcThroughManifest(dir, "sds_root", keepLast = 1)
    Seq("sds_data", Versioned.dvPrefix("sds_data"), zmap, bmap, zmapm)
      .foreach(p => Versioned.gcSnapshotGenerations(dir, "sds_root", p, 1))

    val want = df.filter(!dead)
    // zone range covering deleted rows: they must stay deleted
    val skipRange = FileStats.readSkippingSnapshot(spark, dir,
      "sds_root", "sds_data", "m", "v", Some(3000L), Some(13000L))
    assert(skipRange.select($"id", $"m", $"v").orderBy($"id")
      .collect().toSeq ==
      want.filter($"v" >= 3000L && $"v" <= 13000L)
        .select($"id", $"m", $"v").orderBy($"id").collect().toSeq,
      "post-purge+GC zone skipping diverged from the survivors")
    // bloom point lookups: a purged key stays gone, a live key serves
    val deadKey = 7 * 150L // id=1050, m=1, deleted
    assert(FileStats.readBloomSkippingSnapshot(spark, dir, "sds_root",
      "sds_data", "m", "id", deadKey).isEmpty,
      "a purged key resurrected through the bloom path")
    assert(FileStats.readBloomSkippingSnapshot(spark, dir, "sds_root",
        "sds_data", "m", "id", 1051L)
      .select($"id").collect().map(_.getLong(0)).toSeq == Seq(1051L))
    // conjunctive multi skipping over the purged months
    val skipMulti = FileStats.readSkippingMultiSnapshot(spark, dir,
      "sds_root", "sds_data", "m",
      Seq(("v", Some(3000L), Some(13000L)), ("id", Some(1000L), Some(4300L))))
    assert(skipMulti.select($"id", $"m", $"v").orderBy($"id")
      .collect().toSeq ==
      want.filter($"v" >= 3000L && $"v" <= 13000L &&
          $"id" >= 1000L && $"id" <= 4300L)
        .select($"id", $"m", $"v").orderBy($"id").collect().toSeq,
      "post-purge+GC multi skipping diverged from the survivors")
    // metadata-only aggregate is exact for the survivors
    val stats = FileStats.statsOnlyAggSnapshot(spark, dir, "sds_root",
        "sds_data")
      .withColumn("part", $"part".cast("string"))
      .orderBy($"part").collect().toSeq
    val wantStats = want.groupBy($"m".cast("string").as("part"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count($"v")).as("n_nulls"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .orderBy($"part").collect().toSeq
    assert(stats == wantStats,
      "post-purge metadata-only aggregate diverged from the survivors")
  }
}
