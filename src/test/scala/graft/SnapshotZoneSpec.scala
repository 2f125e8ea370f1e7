package graft

import org.apache.spark.sql.functions._
import graft.io.{FileStats, Versioned}

/** Manifest-pinned zone maps: the stats sidecar is a generation-pinned
  * snapshot root whose pins ride the same atomic manifest commit as the
  * data pins — a reader can never pair new data with old stats (files
  * silently un-prunable) or old data with new stats (files wrongly
  * pruned). Pins: skipping ≡ pinned filter, plan-level numFiles, the
  * crash-window atomicity of the PAIR, candidate containment in pinned
  * generations, and byte-identical untouched sidecar leaves.
  */
class SnapshotZoneSpec extends SparkTestBase {
  import spark.implicits._

  // v correlates with m so each month's file covers a narrow zone
  private def mk(lo: Long, hi: Long, shift: Long = 0L) =
    spark.range(lo, hi).select($"id",
      ($"id" / 1000L).cast("long").as("m"), ($"id" + shift).as("v"))

  private def scanNumFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metrics("numFiles").value).sum
  }

  private def pinKeys(prefix: String, present: Set[Any], gen: String) =
    present.map(v => Versioned.snapshotPinKey(prefix, v) -> gen).toMap

  test("atomic data+stats flip, skipping ≡ pinned filter, pruned numFiles, candidates stay inside pinned generations") {
    val dir = graft.core.Scratch.dir("szone")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("sz_root__")).foreach(_.delete()))
    val zmap = FileStats.sidecarPrefix("sz_data")
    val g1 = "00000001_a"
    val dP = Versioned.writeSnapshotFull(mk(0, 8000), dir, "sz_data",
      "m", g1)
    val dPins1 = dP.map(v => v.toString -> g1).toMap
    val zP = FileStats.writeSnapshotSidecar(spark, dir, "sz_data", "m",
      "v", dPins1, dP.toSeq, g1)
    Versioned.commitManifest(dir, "sz_root", g1,
      pinKeys("sz_data", dP, g1) ++ pinKeys(zmap, zP, g1))

    def skipRead(lo: Long, hi: Long) = FileStats.readSkippingSnapshot(
      spark, dir, "sz_root", "sz_data", "m", "v", Some(lo), Some(hi))
    def fullRead() = Versioned.readSnapshotPartitions(spark, dir,
      "sz_root", "sz_data", "m", None)

    val skip1 = skipRead(2500L, 4200L)
    val want1 = fullRead().filter($"v" >= 2500L && $"v" <= 4200L)
      .orderBy($"id").collect().toSeq
    assert(skip1.orderBy($"id").collect().toSeq == want1)
    val cand1 = FileStats.candidateFilesSnapshot(spark, dir, "sz_root",
      "sz_data", Some(2500L), Some(4200L))
    assert(cand1.size < 8 && cand1.nonEmpty,
      s"correlated zones must prune: ${cand1.size} of 8 files")
    assert(scanNumFiles(skipRead(2500L, 4200L)) == cand1.size.toLong)

    // --- incremental publish of months 2 and 5 with SHIFTED values:
    // new generations + new stats written, NOTHING committed yet
    val g2 = "00000002_b"
    val delta = mk(2000, 3000, shift = 100000L)
      .unionByName(mk(5000, 6000, shift = 100000L))
      .localCheckpoint(true)
    val dP2 = Versioned.writeSnapshotPartitions(delta, dir, "sz_data",
      "m", g2)
    val dPins2 = dPins1 ++ dP2.map(v => v.toString -> g2)
    val zP2 = FileStats.writeSnapshotSidecar(spark, dir, "sz_data", "m",
      "v", dPins2, dP2.toSeq, g2)

    // CRASH WINDOW: readers still see the OLD pair — both the data and
    // the stats that prune it
    assert(skipRead(2500L, 4200L).orderBy($"id").collect().toSeq == want1,
      "uncommitted data or stats leaked into the skipping read")
    val candOld = FileStats.candidateFilesSnapshot(spark, dir, "sz_root",
      "sz_data", Some(102000L), Some(102500L))
    assert(candOld.isEmpty,
      "stats for an uncommitted generation must be invisible")

    // the one commit flips the PAIR
    val zPins2 = zP.map(_.toString -> g1).toMap ++
      zP2.map(_.toString -> g2)
    Versioned.commitManifest(dir, "sz_root", g2,
      dPins2.map { case (v, g) =>
        Versioned.snapshotPinKey("sz_data", v) -> g } ++
        zPins2.map { case (v, g) =>
          Versioned.snapshotPinKey(zmap, v) -> g })
    val wantNew = fullRead().filter($"v" >= 102000L && $"v" <= 102500L)
      .orderBy($"id").collect().toSeq
    assert(wantNew.nonEmpty)
    assert(skipRead(102000L, 102500L).orderBy($"id").collect().toSeq ==
      wantNew, "post-commit skipping must serve the new pair")
    // the replaced months' OLD zones [2000,3000)/[5000,6000) are gone:
    // a query there now matches nothing
    assert(skipRead(2200L, 2300L).isEmpty)

    // candidates always point into PINNED generations
    val pins = Versioned.snapshotPins(dir, "sz_root", "sz_data")
    val candAll = FileStats.candidateFilesSnapshot(spark, dir, "sz_root",
      "sz_data", None, None)
    assert(candAll.nonEmpty && candAll.forall { f =>
      pins.exists { case (v, g) => f.contains(s"m=$v/__gen=$g") }
    }, "a candidate file escaped the pinned generations")

    // untouched months' sidecar leaves stayed byte-identical: their g1
    // stats files were never rewritten
    val zRoot = Versioned.snapshotRoot(dir, zmap)
    Seq("0", "1", "3", "4", "6", "7").foreach { v =>
      val leaf = new java.io.File(zRoot, s"part=$v/__gen=$g1")
      assert(leaf.isDirectory && Option(leaf.listFiles()).exists(
        _.exists(_.getName.endsWith(".parquet"))),
        s"untouched sidecar leaf part=$v lost its g1 generation")
      val g2leaf = new java.io.File(zRoot, s"part=$v/__gen=$g2")
      assert(!g2leaf.exists(),
        s"untouched sidecar partition part=$v was rewritten at g2")
    }
  }

  test("compaction re-pins the sidecars it compacts under: compact → GC → skipping read ≡ full scan (and refuses a spec-less compact)") {
    val dir = graft.core.Scratch.dir("szone_cmp")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("szc_root__")).foreach(_.delete()))
    val zmap = FileStats.sidecarPrefix("szc_data")
    val bmap = FileStats.bloomPrefix("szc_data")
    val g1 = "00000001_a"
    // fat leaves: the salt must genuinely fan out (AQE coalescing
    // folds tiny shuffles into one file per leaf — right at real
    // sizes, wrong for this fixture)
    val coalKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prior = spark.conf.get(coalKey)
    spark.conf.set(coalKey, "false")
    val dP = try Versioned.writeSnapshotFull(mk(0, 8000), dir,
      "szc_data", "m", g1, filesPerPartition = 8)
    finally spark.conf.set(coalKey, prior)
    val dPins1 = dP.map(v => v.toString -> g1).toMap
    val zP = FileStats.writeSnapshotSidecar(spark, dir, "szc_data", "m",
      "v", dPins1, dP.toSeq, g1)
    val bP = FileStats.writeSnapshotBloomSidecar(spark, dir, "szc_data",
      "m", "id", dPins1, dP.toSeq, g1, itemsPerFile = 10000L,
      numBits = 100000L)
    Versioned.commitManifest(dir, "szc_root", g1,
      pinKeys("szc_data", dP, g1) ++ pinKeys(zmap, zP, g1) ++
        pinKeys(bmap, bP, g1))
    val wantRange = fullRead(dir).filter($"v" >= 2500L && $"v" <= 4200L)
      .orderBy($"id").collect().toSeq
    val wantStats = FileStats.statsOnlyAggSnapshot(spark, dir,
      "szc_root", "szc_data").orderBy($"part").collect().toSeq

    // a compaction that would strand the pinned sidecars is REFUSED
    val ex = intercept[IllegalArgumentException] {
      Versioned.compactSnapshotLeaves(spark, dir, "szc_root",
        Seq("szc_data" -> "m"), "00000002_b", maxFiles = 2)
    }
    assert(ex.getMessage.contains("strand"),
      s"expected the stranded-sidecar refusal, got: ${ex.getMessage}")
    assert(Versioned.snapshotPins(dir, "szc_root", "szc_data")
      .values.toSet == Set(g1), "a refused compaction moved pins")

    // with the specs, data AND both sidecars re-pin in ONE commit
    val g2 = "00000002_b"
    val report = Versioned.compactSnapshotLeaves(spark, dir, "szc_root",
      Seq("szc_data" -> "m"), g2, maxFiles = 2,
      zoneSidecars = Map("szc_data" -> "v"),
      bloomSidecars = Map("szc_data" -> (("id", 10000L, 100000L))))
    assert(report("szc_data").nonEmpty)
    val zPins = Versioned.snapshotPins(dir, "szc_root", zmap)
    val bPins = Versioned.snapshotPins(dir, "szc_root", bmap)
    report("szc_data").foreach { v =>
      assert(zPins(v) == g2, s"zone sidecar pin for $v not re-pinned")
      assert(bPins(v) == g2, s"bloom sidecar pin for $v not re-pinned")
    }

    // GC reclaims the superseded fat generations of data AND sidecars;
    // the skipping read path must keep serving — before the fix this
    // sequence threw FILE_NOT_EXIST on the stale sidecar's file names
    Versioned.gcThroughManifest(dir, "szc_root", keepLast = 1)
    Versioned.gcSnapshotGenerations(dir, "szc_root", "szc_data", 1)
    Versioned.gcSnapshotGenerations(dir, "szc_root", zmap, 1)
    Versioned.gcSnapshotGenerations(dir, "szc_root", bmap, 1)

    val skip = FileStats.readSkippingSnapshot(spark, dir, "szc_root",
      "szc_data", "m", "v", Some(2500L), Some(4200L))
    assert(skip.orderBy($"id").collect().toSeq == wantRange,
      "post-compaction+GC skipping read diverged from the full scan")
    // candidates name ONLY the compacted generation's files now
    val cand = FileStats.candidateFilesSnapshot(spark, dir, "szc_root",
      "szc_data", Some(2500L), Some(4200L))
    assert(cand.nonEmpty && cand.forall(_.contains(s"__gen=$g2")),
      "a candidate still points into the reclaimed generation")
    // bloom point lookup and the metadata-only aggregate survive too
    val hit = FileStats.readBloomSkippingSnapshot(spark, dir, "szc_root",
      "szc_data", "m", "id", 4242L)
    assert(hit.select($"id").collect().map(_.getLong(0)).toSeq ==
      Seq(4242L))
    assert(FileStats.statsOnlyAggSnapshot(spark, dir, "szc_root",
      "szc_data").orderBy($"part").collect().toSeq == wantStats,
      "compaction changed the metadata-only aggregate")
  }

  private def fullRead(dir: String) = Versioned.readSnapshotPartitions(
    spark, dir, "szc_root", "szc_data", "m", None)

  test("manifest-pinned sidecar SPECS: compaction derives the zone/bloom columns from the manifest, no arguments needed") {
    val dir = graft.core.Scratch.dir("szone_spec")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("szs_root__")).foreach(_.delete()))
    val zmap = FileStats.sidecarPrefix("szs_data")
    val g1 = "00000001_a"
    val coalKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prior = spark.conf.get(coalKey)
    spark.conf.set(coalKey, "false")
    val dP = try Versioned.writeSnapshotFull(mk(0, 6000), dir,
      "szs_data", "m", g1, filesPerPartition = 8)
    finally spark.conf.set(coalKey, prior)
    val dPins1 = dP.map(v => v.toString -> g1).toMap
    val zP = FileStats.writeSnapshotSidecar(spark, dir, "szs_data", "m",
      "v", dPins1, dP.toSeq, g1)
    // the spec entry rides the same commit as the pins it describes
    Versioned.commitManifest(dir, "szs_root", g1,
      pinKeys("szs_data", dP, g1) ++ pinKeys(zmap, zP, g1) +
        FileStats.zoneSpecEntry("szs_data", "v"))
    val want = Versioned.readSnapshotPartitions(spark, dir, "szs_root",
        "szs_data", "m", None)
      .filter($"v" >= 1500L && $"v" <= 3200L).orderBy($"id")
      .collect().toSeq

    // NO sidecar arguments: the spec comes from the manifest
    val g2 = "00000002_b"
    val report = Versioned.compactSnapshotLeaves(spark, dir, "szs_root",
      Seq("szs_data" -> "m"), g2, maxFiles = 2)
    assert(report("szs_data").nonEmpty)
    report("szs_data").foreach { v =>
      assert(Versioned.snapshotPins(dir, "szs_root", zmap)(v) == g2,
        s"spec-derived compaction did not re-pin the sidecar for $v")
    }
    Versioned.gcThroughManifest(dir, "szs_root", keepLast = 1)
    Versioned.gcSnapshotGenerations(dir, "szs_root", "szs_data", 1)
    Versioned.gcSnapshotGenerations(dir, "szs_root", zmap, 1)
    assert(FileStats.readSkippingSnapshot(spark, dir, "szs_root",
        "szs_data", "m", "v", Some(1500L), Some(3200L))
      .orderBy($"id").collect().toSeq == want,
      "spec-derived compaction + GC broke the skipping read")
    // the spec entry survives the compaction commit (carried forward)
    assert(Versioned.latestManifest(dir, "szs_root").exists(
      _._2.get(FileStats.sidecarSpecKey(zmap)).contains("v")),
      "the compaction commit dropped the sidecar spec entry")
  }

  test("multi-column zone maps on the snapshot lane: Z-order leaves, conjunctive pruning through the manifest, facade parity") {
    val dir = graft.core.Scratch.dir("szone_multi")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("szm_root__")).foreach(_.delete()))
    val zmapm = FileStats.sidecarMultiPrefix("szm_data")
    // uniform 256x256 grid, one partition; the Morton key clusters
    // each file into a small 2-D rectangle
    val grid = spark.range(65536L).select(
      lit(0L).as("m"),
      ($"id" % 256).as("x"),
      org.apache.spark.sql.functions.expr("id div 256").as("y"))
      .withColumn("zk", graft.ops.Layout.zKey($"x", $"y", 8))
    val g1 = "00000001_a"
    val dP = FileStats.writeSnapshotZoneClustered(grid, dir, "szm_data",
      "m", "zk", g1, tasks = 16)
    val dPins = dP.map(v => v.toString -> g1).toMap
    val zP = FileStats.writeSnapshotSidecarMulti(spark, dir, "szm_data",
      "m", Seq("x", "y"), dPins, dP.toSeq, g1)
    Versioned.commitManifest(dir, "szm_root", g1,
      pinKeys("szm_data", dP, g1) ++ pinKeys(zmapm, zP, g1))

    val box = Seq(("x", Some(10L: Any), Some(50L: Any)),
      ("y", Some(10L: Any), Some(50L: Any)))
    val zmPins = Versioned.snapshotPins(dir, "szm_root", zmapm)
    val cand2 = FileStats.candidateFilesMultiAt(spark, dir, "szm_data",
      zmPins, box)
    val candX = FileStats.candidateFilesMultiAt(spark, dir, "szm_data",
      zmPins, box.take(1))
    val total = FileStats.candidateFilesMultiAt(spark, dir, "szm_data",
      zmPins, Seq(("x", Some(0L: Any), Some(255L: Any))))
    assert(cand2.nonEmpty && cand2.size < candX.size &&
      candX.size <= total.size,
      s"conjunction must out-prune one dimension: 2d=${cand2.size} " +
        s"x=${candX.size} all=${total.size}")

    val skip = FileStats.readSkippingMultiSnapshot(spark, dir,
      "szm_root", "szm_data", "m", box)
    val want = Versioned.readSnapshotPartitions(spark, dir, "szm_root",
        "szm_data", "m", None)
      .filter($"x" >= 10L && $"x" <= 50L && $"y" >= 10L && $"y" <= 50L)
    assert(skip.orderBy($"zk").collect().toSeq ==
      want.orderBy($"zk").collect().toSeq)
    assert(scanNumFiles(FileStats.readSkippingMultiSnapshot(spark, dir,
      "szm_root", "szm_data", "m", box)) == cand2.size.toLong)

    // the facade routes snapshot multi-range predicates through the
    // pinned multi sidecar: same rows, same pruned scan
    val viaFacade = graft.io.LakeTable.readTable(spark, dir, "szm_data",
      "m", manifestPrefix = Some("szm_root"),
      ranges = box)
    assert(viaFacade.orderBy($"zk").collect().toSeq ==
      want.orderBy($"zk").collect().toSeq)
    assert(scanNumFiles(graft.io.LakeTable.readTable(spark, dir,
      "szm_data", "m", manifestPrefix = Some("szm_root"),
      ranges = box)) == cand2.size.toLong,
      "the facade did not plan through the pinned multi sidecar")

    // metadata-only multi aggregate: per-column rollup from the pinned
    // sidecar alone ≡ the data twin, and zero DATA files scheduled
    spark.catalog.clearCache()
    val mstats = graft.io.LakeTable.statsTableMulti(spark, dir,
      "szm_data", manifestPrefix = Some("szm_root"))
    val gotStats = mstats
      .withColumn("part", $"part".cast("string"))
      .orderBy($"part").collect().toSeq
    val wantStats = Versioned.readSnapshotPartitions(spark, dir,
        "szm_root", "szm_data", "m", None)
      .groupBy($"m".cast("string").as("part"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count($"x")).as("n_nulls_x"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        (count(lit(1)) - count($"y")).as("n_nulls_y"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .orderBy($"part").collect().toSeq
    assert(gotStats == wantStats,
      "multi metadata-only aggregate diverged from the data twin")
    mstats.collect()
    val scannedRoots = mstats.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scannedRoots.forall(_.contains("_zmapm")),
      s"the multi stats path scanned a data root: $scannedRoots")
  }

  test("multi-column sidecar survives compaction: spec-less refusal, re-pin in one commit, compact → GC → readTable(ranges) ≡ full scan") {
    val dir = graft.core.Scratch.dir("szone_mcmp")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("szq_root__")).foreach(_.delete()))
    val zmapm = FileStats.sidecarMultiPrefix("szq_data")
    val g1 = "00000001_a"
    // fat leaves so compaction has work; a 2-D value space so the
    // multi sidecar is the one doing the pruning
    val df = mk(0, 8000).withColumn("w", $"id" % 97L)
    val coalKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prior = spark.conf.get(coalKey)
    spark.conf.set(coalKey, "false")
    val dP = try Versioned.writeSnapshotFull(df, dir, "szq_data", "m",
      g1, filesPerPartition = 8)
    finally spark.conf.set(coalKey, prior)
    val dPins = dP.map(_.toString -> g1).toMap
    val mP = FileStats.writeSnapshotSidecarMulti(spark, dir, "szq_data",
      "m", Seq("v", "w"), dPins, dP.toSeq, g1)
    // FIRST commit pins the multi sidecar WITHOUT its spec entry: the
    // exact round-14 shape whose compaction silently stranded it
    Versioned.commitManifest(dir, "szq_root", g1,
      pinKeys("szq_data", dP, g1) ++ pinKeys(zmapm, mP, g1))
    val box = Seq(("v", Some(2500L: Any), Some(4200L: Any)),
      ("w", Some(10L: Any), Some(60L: Any)))
    val want = Versioned.readSnapshotPartitions(spark, dir, "szq_root",
        "szq_data", "m", None)
      .filter($"v" >= 2500L && $"v" <= 4200L &&
        $"w" >= 10L && $"w" <= 60L)
      .orderBy($"id").collect().toSeq

    // spec-less compact is REFUSED (before the fix it proceeded and
    // stranded the multi pins at g1 — a crash after GC)
    val ex = intercept[IllegalArgumentException] {
      Versioned.compactSnapshotLeaves(spark, dir, "szq_root",
        Seq("szq_data" -> "m"), "00000002_b", maxFiles = 2)
    }
    assert(ex.getMessage.contains("multi-column"),
      s"expected the multi-sidecar refusal, got: ${ex.getMessage}")
    assert(Versioned.snapshotPins(dir, "szq_root", "szq_data")
      .values.toSet == Set(g1), "a refused compaction moved pins")

    // with the spec (explicit arg), compaction re-derives + re-pins
    // the multi sidecar in the SAME commit, and pins the spec entry is
    // NOT this call's job — pass it next time via the manifest instead
    val g2 = "00000002_b"
    val report = Versioned.compactSnapshotLeaves(spark, dir, "szq_root",
      Seq("szq_data" -> "m"), g2, maxFiles = 2,
      multiSidecars = Map("szq_data" -> Seq("v", "w")))
    assert(report("szq_data").nonEmpty)
    val mPins = Versioned.snapshotPins(dir, "szq_root", zmapm)
    report("szq_data").foreach { v =>
      assert(mPins(v) == g2, s"multi sidecar pin for $v not re-pinned")
    }

    Versioned.gcThroughManifest(dir, "szq_root", keepLast = 1)
    Versioned.gcSnapshotGenerations(dir, "szq_root", "szq_data", 1)
    Versioned.gcSnapshotGenerations(dir, "szq_root", zmapm, 1)

    // the facade's multi-skipped read (readTable PREFERS the pinned
    // multi sidecar) keeps serving after GC — the round-14 crash path
    val got = graft.io.LakeTable.readTable(spark, dir, "szq_data", "m",
      manifestPrefix = Some("szq_root"), ranges = box)
    assert(got.orderBy($"id").collect().toSeq == want,
      "post-compaction+GC facade multi read diverged from the full scan")
    val cand = FileStats.candidateFilesMultiAt(spark, dir, "szq_data",
      Versioned.snapshotPins(dir, "szq_root", zmapm), box)
    assert(cand.nonEmpty && cand.forall(_.contains(s"__gen=$g2")),
      "a multi candidate still points into the reclaimed generation")

    // manifest-pinned spec path: commit the spec entry, compact again
    // (everything is thin now — force fat by a fresh fat publish)
    val g3 = "00000003_c"
    val delta = mk(2000, 3000, shift = 500000L)
      .withColumn("w", $"id" % 97L).localCheckpoint(true)
    val dP3 = try {
      spark.conf.set(coalKey, "false")
      Versioned.writeSnapshotPartitions(delta, dir, "szq_data", "m", g3,
        filesPerPartition = 8)
    } finally spark.conf.set(coalKey, prior)
    val dPins3 = Versioned.snapshotPins(dir, "szq_root", "szq_data") ++
      dP3.map(_.toString -> g3)
    val mP3 = FileStats.writeSnapshotSidecarMulti(spark, dir, "szq_data",
      "m", Seq("v", "w"), dPins3, dP3.toSeq, g3)
    Versioned.commitManifest(dir, "szq_root", g3,
      Versioned.latestManifest(dir, "szq_root").map(_._2).get ++
        dP3.map(v => Versioned.snapshotPinKey("szq_data", v) -> g3) ++
        mP3.map(v => Versioned.snapshotPinKey(zmapm, v) -> g3) +
        FileStats.zoneMultiSpecEntry("szq_data", Seq("v", "w")))
    // NO arguments: the spec resolves from the manifest
    val g4 = "00000004_d"
    val report2 = Versioned.compactSnapshotLeaves(spark, dir, "szq_root",
      Seq("szq_data" -> "m"), g4, maxFiles = 2)
    assert(report2("szq_data") == Set("2"),
      s"expected only the fresh fat month to compact, got ${report2("szq_data")}")
    assert(Versioned.snapshotPins(dir, "szq_root", zmapm)("2") == g4,
      "spec-derived compaction did not re-pin the multi sidecar")
    Versioned.gcThroughManifest(dir, "szq_root", keepLast = 1)
    Versioned.gcSnapshotGenerations(dir, "szq_root", "szq_data", 1)
    Versioned.gcSnapshotGenerations(dir, "szq_root", zmapm, 1)
    val want2 = Versioned.readSnapshotPartitions(spark, dir, "szq_root",
        "szq_data", "m", None)
      .filter($"v" >= 501000L && $"v" <= 502500L && $"w" >= 0L)
      .orderBy($"id").collect().toSeq
    assert(want2.nonEmpty)
    assert(graft.io.LakeTable.readTable(spark, dir, "szq_data", "m",
        manifestPrefix = Some("szq_root"),
        ranges = Seq(("v", Some(501000L), Some(502500L)),
          ("w", Some(0L), None)))
      .orderBy($"id").collect().toSeq == want2,
      "spec-derived multi compaction + GC broke the facade read")
  }
}
