package graft

import org.apache.spark.sql.functions._
import graft.io.Versioned

/** Snapshot-lane compaction: row-preservation across every root, thin
  * leaves and untouched roots byte-identical, selective re-pins in one
  * atomic manifest commit, crash-invisibility of half-written compacted
  * generations, replay no-op, and GC reclamation of the superseded fat
  * generations.
  */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(n: Int) = spark.range(n.toLong).select(
    $"id", ($"id" % 6).cast("long").as("m"), ($"id" * 7 % 1000).as("v"))

  /** The fat fixtures need the salt to actually fan out: AQE's
    * partition coalescing folds this spec's tiny shuffles into one
    * task (one file per leaf) regardless of `filesPerPartition`, which
    * is the right behavior at real sizes and the wrong fixture here.
    */
  private def withFatLayout[T](body: => T): T = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prior)
  }

  private def leafFiles(dir: String, prefix: String, v: Long,
                        gen: String): Seq[(String, Long)] =
    Option(new java.io.File(Versioned.snapshotRoot(dir, prefix),
        s"m=$v/__gen=$gen").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).sortBy(_._1)

  private def served(dir: String, prefix: String) =
    Versioned.readSnapshotPartitions(spark, dir, "cmp_root", prefix,
      "m", None).orderBy($"id").collect().toSeq

  test("compaction preserves rows, re-pins fat leaves only, leaves thin roots untouched, replays as a no-op, and GCs clean") {
    val dir = graft.core.Scratch.dir("cmp_lane")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("cmp_root__")).foreach(_.delete()))
    val g1 = "00000001_a"
    // cp_fat: 4 files per leaf (write-optimized salt); cp_thin: 1
    val fatP = withFatLayout(Versioned.writeSnapshotFull(mk(6000), dir,
      "cp_fat", "m", g1, filesPerPartition = 16))
    val thinP = Versioned.writeSnapshotFull(
      mk(3000).select($"id", $"m", ($"v" + 1).as("v")), dir, "cp_thin",
      "m", g1)
    Versioned.commitManifest(dir, "cmp_root", g1,
      fatP.map(v => Versioned.snapshotPinKey("cp_fat", v) -> g1).toMap ++
        thinP.map(v => Versioned.snapshotPinKey("cp_thin", v) -> g1))
    assert((0L to 5L).forall(v => leafFiles(dir, "cp_fat", v, g1).size > 2))

    val beforeFat = served(dir, "cp_fat")
    val beforeThin = served(dir, "cp_thin")
    val thinFiles = (0L to 5L).map(v => leafFiles(dir, "cp_thin", v, g1))

    // CRASH SIM: a compacted generation written but never committed is
    // invisible to manifest readers
    val g2 = "00000002_b"
    Versioned.writeSnapshotPartitions(
      Versioned.readSnapshotPartitions(spark, dir, "cmp_root", "cp_fat",
        "m", None).localCheckpoint(true),
      dir, "cp_fat", "m", g2)
    assert(served(dir, "cp_fat") == beforeFat,
      "half-written compaction must be invisible before its commit")

    // the replayed compaction completes: rewrites its own generation
    // idempotently and commits
    val report = Versioned.compactSnapshotLeaves(spark, dir, "cmp_root",
      Seq("cp_fat" -> "m", "cp_thin" -> "m"), g2, maxFiles = 2)
    assert(report("cp_fat") == (0L to 5L).map(_.toString).toSet)
    assert(report("cp_thin").isEmpty, "thin leaves must not be rewritten")
    assert(served(dir, "cp_fat") == beforeFat,
      "compaction changed the served rows")
    assert(served(dir, "cp_thin") == beforeThin)
    assert((0L to 5L).forall(v =>
      leafFiles(dir, "cp_fat", v, g2).size == 1),
      "compacted leaves must land at targetFiles files")
    assert((0L to 5L).map(v => leafFiles(dir, "cp_thin", v, g1)) ==
      thinFiles, "an untouched root's files were modified")
    val pins = Versioned.snapshotPins(dir, "cmp_root", "cp_fat")
    assert(pins.values.toSet == Set(g2))
    assert(Versioned.snapshotPins(dir, "cmp_root", "cp_thin")
      .values.toSet == Set(g1), "thin pins must carry unchanged")

    // replay after commit: every leaf thin now — pure no-op
    val replay = Versioned.compactSnapshotLeaves(spark, dir, "cmp_root",
      Seq("cp_fat" -> "m", "cp_thin" -> "m"), g2, maxFiles = 2)
    assert(replay.values.forall(_.isEmpty))
    assert(Versioned.latestManifest(dir, "cmp_root").exists(_._1 == g2))
    assert(served(dir, "cp_fat") == beforeFat)

    // GC under keep-last-1 reclaims the superseded fat generation and
    // serving still works
    Versioned.gcThroughManifest(dir, "cmp_root", keepLast = 1)
    val gone = Versioned.gcSnapshotGenerations(dir, "cmp_root", "cp_fat",
      keepLast = 1)
    assert(gone.nonEmpty, "the superseded fat generation must reclaim")
    assert((0L to 5L).forall(v => leafFiles(dir, "cp_fat", v, g1).isEmpty))
    assert(served(dir, "cp_fat") == beforeFat)
    assert(served(dir, "cp_thin") == beforeThin)
  }

  test("a compaction that lost the race to a newer publish is refused loudly at its commit") {
    val dir = graft.core.Scratch.dir("cmp_race")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("cmr_root__")).foreach(_.delete()))
    val g1 = "00000001_a"
    val p = withFatLayout(Versioned.writeSnapshotFull(mk(2000), dir,
      "cr_data", "m", g1, filesPerPartition = 16))
    Versioned.commitManifest(dir, "cmr_root", g1,
      p.map(v => Versioned.snapshotPinKey("cr_data", v) -> g1).toMap)
    // a publish cycle commits g3 while our compaction (tagged g2) is
    // still writing: the compactor's commit must fail, not clobber
    Versioned.commitManifest(dir, "cmr_root", "00000003_c",
      p.map(v => Versioned.snapshotPinKey("cr_data", v) -> g1).toMap)
    val ex = intercept[IllegalArgumentException] {
      Versioned.compactSnapshotLeaves(spark, dir, "cmr_root",
        Seq("cr_data" -> "m"), "00000002_b", maxFiles = 2)
    }
    assert(ex.getMessage.contains("stale"),
      s"expected the stale-commit refusal, got: ${ex.getMessage}")
    // readers were never disturbed: still the g1 pins
    assert(Versioned.snapshotPins(dir, "cmr_root", "cr_data")
      .values.toSet == Set(g1))
  }

  test("selective compaction: only the leaves over the threshold re-pin; others keep generation AND bytes") {
    val dir = graft.core.Scratch.dir("cmp_sel")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("cms_root__")).foreach(_.delete()))
    val g1 = "00000001_a"
    val p0 = Versioned.writeSnapshotFull(mk(3000), dir, "cs_data", "m", g1)
    Versioned.commitManifest(dir, "cms_root", g1,
      p0.map(v => Versioned.snapshotPinKey("cs_data", v) -> g1).toMap)
    // a hot-month publish fattens leaves m=1 and m=4 only
    val g2 = "00000002_b"
    val hot = Versioned.readSnapshotPartitions(spark, dir, "cms_root",
        "cs_data", "m", Some(Seq(1L, 4L))).localCheckpoint(true)
    val present = withFatLayout(Versioned.writeSnapshotPartitions(hot,
      dir, "cs_data", "m", g2, filesPerPartition = 16))
    Versioned.commitManifest(dir, "cms_root", g2,
      Versioned.snapshotPins(dir, "cms_root", "cs_data")
        .map { case (v, g) => Versioned.snapshotPinKey("cs_data", v) -> g } ++
        present.map(v => Versioned.snapshotPinKey("cs_data", v) -> g2))
    val before = Versioned.readSnapshotPartitions(spark, dir, "cms_root",
      "cs_data", "m", None).orderBy($"id").collect().toSeq
    val coldFiles = Seq(0L, 2L, 3L, 5L).map(v =>
      Option(new java.io.File(Versioned.snapshotRoot(dir, "cs_data"),
          s"m=$v/__gen=$g1").listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        .map(f => (f.getName, f.lastModified())).sortBy(_._1))

    val g3 = "00000003_c"
    val report = Versioned.compactSnapshotLeaves(spark, dir, "cms_root",
      Seq("cs_data" -> "m"), g3, maxFiles = 2)
    assert(report("cs_data") == Set("1", "4"))
    val pins = Versioned.snapshotPins(dir, "cms_root", "cs_data")
    assert(pins("1") == g3 && pins("4") == g3)
    assert(Seq("0", "2", "3", "5").forall(pins(_) == g1),
      "cold pins must stay on their original generation")
    assert(Seq(0L, 2L, 3L, 5L).map(v =>
      Option(new java.io.File(Versioned.snapshotRoot(dir, "cs_data"),
          s"m=$v/__gen=$g1").listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        .map(f => (f.getName, f.lastModified())).sortBy(_._1)) == coldFiles,
      "cold leaves' files were modified")
    assert(Versioned.readSnapshotPartitions(spark, dir, "cms_root",
      "cs_data", "m", None).orderBy($"id").collect().toSeq == before)
  }
}
