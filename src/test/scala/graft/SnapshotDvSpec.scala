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
}
