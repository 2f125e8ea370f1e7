package graft

import org.apache.spark.sql.functions._
import graft.io.{FileStats, Versioned}

/** File-level zone maps: conservative skipping ≡ full scan, plan-level
  * numFiles pins, all-null exclusion, O(touched) sidecar maintenance
  * through the partitioned-publish protocol (untouched sidecar
  * partitions byte-identical, emptied partitions leave the sidecar),
  * and the metadata-only aggregate fast path.
  */
class FileStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def mkData(n: Int) = spark.range(n.toLong).select(
    $"id",
    concat(lit("m"), format_string("%02d", ($"id" % 8).cast("int")))
      .as("part"),
    // v correlates with id so range clustering gives narrow file zones
    ($"id" * 3 + 7).as("v"),
    when($"id" % 997 === 0, lit(null).cast("long"))
      .otherwise($"id").as("w"))

  private def leafFiles(root: String): Seq[java.io.File] =
    Option(new java.io.File(root).listFiles()).map(_.toSeq)
      .getOrElse(Seq.empty)
      .filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty))
      .filter(_.getName.endsWith(".parquet"))

  private def scanNumFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metrics("numFiles").value).sum
  }

  test("skipping read ≡ full filter, with real file-level pruning") {
    val dir = graft.core.Scratch.dir("fstats_base")
    FileStats.writeZoneClustered(mkData(8000), dir, "fs_data",
      "part", "v", tasks = 32)
    FileStats.buildSidecar(spark, dir, "fs_data", "part", "v")

    val side = Versioned.readPartitioned(spark, dir,
      FileStats.sidecarPrefix("fs_data"))
    val total = leafFiles(Versioned.partitionedRoot(dir, "fs_data")).size
    assert(side.count() == total.toLong,
      "sidecar must hold exactly one row per data file")
    assert(side.agg(sum($"n_rows")).first.getLong(0) == 8000L)

    val (lo, hi) = (3000L, 5000L)
    val skip = FileStats.readSkipping(spark, dir, "fs_data", "part", "v",
      Some(lo), Some(hi))
    val full = Versioned.readPartitioned(spark, dir, "fs_data")
      .filter($"v" >= lo && $"v" <= hi)
    assert(skip.orderBy($"id").collect().toSeq ==
      full.orderBy($"id").collect().toSeq)

    val cand = FileStats.candidateFiles(spark, dir, "fs_data",
      Some(lo), Some(hi))
    assert(cand.nonEmpty && cand.size < total,
      s"zone-clustered layout must actually prune: ${cand.size} of $total")
    assert(scanNumFiles(skip) == cand.size.toLong,
      "the skipping scan must schedule exactly the candidate files")
    // measured certificate: bytes the pruned scan schedules vs the root
    val allFiles = leafFiles(Versioned.partitionedRoot(dir, "fs_data"))
    val candSet = cand.map(p => new java.io.File(
      new java.net.URI(p).getPath).getName).toSet
    val candBytes = allFiles.filter(f => candSet(f.getName))
      .map(_.length).sum
    val totalBytes = allFiles.map(_.length).sum
    info(f"zone-map certificate: ${cand.size}/$total files, " +
      f"$candBytes/$totalBytes bytes " +
      f"(${100.0 * candBytes / totalBytes}%.1f%%) scheduled for a " +
      "25% value-range query")
    assert(candBytes * 2 < totalBytes,
      "the pruned scan should schedule well under half the root's bytes")

    // an interval outside every zone reads zero files
    val none = FileStats.readSkipping(spark, dir, "fs_data", "part", "v",
      Some(1000000L), None)
    assert(none.isEmpty)
    assert(FileStats.candidateFiles(spark, dir, "fs_data",
      Some(1000000L), None).isEmpty)
  }

  test("conservative under an unclustered layout: equal rows, no pruning win") {
    val dir = graft.core.Scratch.dir("fstats_unclustered")
    // hash layout: every file spans the whole v range — zone maps must
    // still return EXACTLY the right rows, they just can't skip
    Versioned.writePartitionedFull(mkData(4000), dir, "fs_flat",
      Seq("part"), filesPerPartition = 4)
    FileStats.buildSidecar(spark, dir, "fs_flat", "part", "v")
    val skip = FileStats.readSkipping(spark, dir, "fs_flat", "part", "v",
      Some(2000L), Some(2600L))
    val full = Versioned.readPartitioned(spark, dir, "fs_flat")
      .filter($"v" >= 2000L && $"v" <= 2600L)
    assert(skip.orderBy($"id").collect().toSeq ==
      full.orderBy($"id").collect().toSeq)
  }

  test("all-null files are excluded; null rows never match a range") {
    val dir = graft.core.Scratch.dir("fstats_nulls")
    // partition m1 entirely null on v
    val df = spark.range(200).select($"id",
      concat(lit("m"), ($"id" % 2).cast("string")).as("part"),
      when($"id" % 2 === 1, lit(null).cast("long")).otherwise($"id")
        .as("v"))
    Versioned.writePartitionedFull(df, dir, "fs_null", Seq("part"))
    FileStats.buildSidecar(spark, dir, "fs_null", "part", "v")
    val side = Versioned.readPartitioned(spark, dir,
      FileStats.sidecarPrefix("fs_null"))
    assert(side.filter($"part" === "m1").select($"n_nulls" === $"n_rows")
      .collect().forall(_.getBoolean(0)))
    val cand = FileStats.candidateFiles(spark, dir, "fs_null",
      Some(0L), Some(500L))
    assert(cand.forall(_.contains("part=m0")),
      "an all-null file can never satisfy a range predicate")
    val skip = FileStats.readSkipping(spark, dir, "fs_null", "part", "v",
      Some(0L), Some(500L))
    assert(skip.count() == 100L)
  }

  test("O(touched) maintenance: untouched sidecar partitions byte-identical; emptied partition leaves the sidecar") {
    val dir = graft.core.Scratch.dir("fstats_maint")
    val df = mkData(4000)
    Versioned.writePartitionedFull(df, dir, "fs_inc", Seq("part"))
    FileStats.buildSidecar(spark, dir, "fs_inc", "part", "v")
    val sideRoot = Versioned.partitionedRoot(dir,
      FileStats.sidecarPrefix("fs_inc"))

    def fingerprint(part: String): Seq[(String, Long)] =
      Option(new java.io.File(sideRoot, s"part=$part").listFiles())
        .map(_.toSeq).getOrElse(Seq.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).sortBy(_._1)
    val before = (0 until 8).map(i => fingerprint(f"m$i%02d"))

    // cycle: rewrite m02 with doubled v, empty m05 entirely
    val touched = Seq("m02", "m05")
    val newRows = df.filter($"part" === "m02")
      .select($"id", $"part", ($"v" * 2).as("v"), $"w")
      .localCheckpoint(true)
    Versioned.overwriteTouchedPartitions(newRows, dir, "fs_inc",
      "part", touched)
    FileStats.maintainSidecar(spark, dir, "fs_inc", "part", "v", touched)

    val after = (0 until 8).map(i => fingerprint(f"m$i%02d"))
    for (i <- 0 until 8 if i != 2 && i != 5)
      assert(before(i) == after(i),
        s"untouched sidecar partition m$i was rewritten")
    assert(after(5).isEmpty, "emptied partition must leave the sidecar")

    // skipping over the maintained sidecar ≡ full scan of the new data
    val skip = FileStats.readSkipping(spark, dir, "fs_inc", "part", "v",
      Some(4000L), Some(9000L))
    val full = Versioned.readPartitioned(spark, dir, "fs_inc")
      .filter($"v" >= 4000L && $"v" <= 9000L)
    assert(skip.orderBy($"id").collect().toSeq ==
      full.orderBy($"id").collect().toSeq)
    // m05's files are gone from the candidate universe
    assert(FileStats.candidateFiles(spark, dir, "fs_inc", None, None)
      .forall(!_.contains("part=m05")))

    // replay of the same maintenance is a no-op in content
    FileStats.maintainSidecar(spark, dir, "fs_inc", "part", "v", touched)
    val replay = FileStats.statsOnlyAgg(spark, dir, "fs_inc")
      .orderBy($"part").collect().toSeq
    val expect = Versioned.readPartitioned(spark, dir, "fs_inc")
      .groupBy($"part".cast("string").as("part"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count($"v")).as("n_nulls"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .orderBy($"part").collect().toSeq
    assert(replay == expect)
  }

  test("multi-column zone maps over a Z-ordered layout: both dimensions prune, conjunction beats either alone") {
    val dir = graft.core.Scratch.dir("fstats_zorder")
    // uniform 256x256 grid; Morton key as the clustering column makes
    // every file a small 2-D rectangle of the value space
    val grid = spark.range(65536L).select(
      lit("p0").as("part"),
      ($"id" % 256).as("x"),
      expr("id div 256").as("y"))
      .withColumn("zk", graft.ops.Layout.zKey($"x", $"y", 8))
    FileStats.writeZoneClustered(grid, dir, "fs_z", "part", "zk",
      tasks = 16)
    FileStats.buildSidecarMulti(spark, dir, "fs_z", "part",
      Seq("x", "y"))
    val total = leafFiles(Versioned.partitionedRoot(dir, "fs_z")).size
    assert(total >= 8, s"fixture needs real fan-out, got $total files")

    val boxX = ("x", Some(10L: Any), Some(50L: Any))
    val boxY = ("y", Some(10L: Any), Some(50L: Any))
    val cand2 = FileStats.candidateFilesMulti(spark, dir, "fs_z",
      Seq(boxX, boxY))
    val candX = FileStats.candidateFilesMulti(spark, dir, "fs_z",
      Seq(boxX))
    val candY = FileStats.candidateFilesMulti(spark, dir, "fs_z",
      Seq(boxY))
    assert(cand2.nonEmpty && cand2.size < total)
    assert(cand2.size <= candX.size && cand2.size <= candY.size &&
      (cand2.size < candX.size || cand2.size < candY.size),
      s"conjunction must beat a single dimension: 2d=${cand2.size} " +
        s"x=${candX.size} y=${candY.size} of $total")

    val skip = FileStats.readSkippingMulti(spark, dir, "fs_z", "part",
      Seq(boxX, boxY))
    val full = Versioned.readPartitioned(spark, dir, "fs_z")
      .filter($"x" >= 10L && $"x" <= 50L && $"y" >= 10L && $"y" <= 50L)
    assert(skip.orderBy($"zk").collect().toSeq ==
      full.orderBy($"zk").collect().toSeq)
    assert(scanNumFiles(FileStats.readSkippingMulti(spark, dir, "fs_z",
      "part", Seq(boxX, boxY))) == cand2.size.toLong)
  }

  test("bloom sidecar: point lookup prunes where zone maps cannot; one-sided errors; O(touched) maintenance") {
    val dir = graft.core.Scratch.dir("fstats_bloom")
    // unclustered on id: part = id % 8, so every file's [min,max] id
    // interval spans nearly the whole range — min/max prunes NOTHING
    val df = mkData(8000)
    Versioned.writePartitionedFull(df, dir, "fs_bl", Seq("part"))
    FileStats.buildSidecar(spark, dir, "fs_bl", "part", "id")
    FileStats.buildBloomSidecar(spark, dir, "fs_bl", "part", "id",
      itemsPerFile = 10000L, numBits = 100000L)
    val total = leafFiles(Versioned.partitionedRoot(dir, "fs_bl")).size

    // zone maps see every file as a candidate for a point probe...
    val zoneCand = FileStats.candidateFiles(spark, dir, "fs_bl",
      Some(4242L), Some(4242L))
    assert(zoneCand.size == total,
      "fixture broken: min/max was supposed to be useless here")
    // ...the bloom sidecar prunes to (nearly) the one holder
    val bloomCand = FileStats.bloomCandidateFiles(spark, dir, "fs_bl",
      4242L)
    assert(bloomCand.nonEmpty && bloomCand.size < total,
      s"bloom must prune the unclustered point lookup: " +
        s"${bloomCand.size} of $total")
    val hit = FileStats.readBloomSkipping(spark, dir, "fs_bl", "part",
      "id", 4242L)
    assert(hit.orderBy($"id").collect().toSeq ==
      Versioned.readPartitioned(spark, dir, "fs_bl")
        .filter($"id" === 4242L).orderBy($"id").collect().toSeq)
    assert(scanNumFiles(FileStats.readBloomSkipping(spark, dir, "fs_bl",
      "part", "id", 4242L)) == bloomCand.size.toLong)
    // absent key: candidates may fp, the residual never does
    assert(FileStats.readBloomSkipping(spark, dir, "fs_bl", "part",
      "id", 999999L).isEmpty)

    // maintenance: partition m02's ids move +100000; the bloom for the
    // touched partition re-derives, others byte-stable via the shared
    // overwriteTouchedPartitions protocol (pinned in the stats test)
    val newRows = df.filter($"part" === "m02")
      .select(($"id" + 100000L).as("id"), $"part", $"v", $"w")
      .localCheckpoint(true)
    Versioned.overwriteTouchedPartitions(newRows, dir, "fs_bl", "part",
      Seq("m02"))
    FileStats.maintainBloomSidecar(spark, dir, "fs_bl", "part", "id",
      Seq("m02"), itemsPerFile = 10000L, numBits = 100000L)
    // a key that only lived in m02 is gone end-to-end...
    assert(FileStats.readBloomSkipping(spark, dir, "fs_bl", "part",
      "id", 4002L).isEmpty, "stale bloom served a replaced key")
    // ...and its replacement is findable
    val moved = FileStats.readBloomSkipping(spark, dir, "fs_bl", "part",
      "id", 104002L)
    assert(moved.count() == 1L, "maintained bloom missed a new key")
  }

  test("multi-column sidecar maintenance and partition-restricted bloom probes") {
    val dir = graft.core.Scratch.dir("fstats_multi_maint")
    val df = mkData(4000)
    Versioned.writePartitionedFull(df, dir, "fs_mm", Seq("part"))
    FileStats.buildSidecarMulti(spark, dir, "fs_mm", "part",
      Seq("v", "w"))
    FileStats.buildBloomSidecar(spark, dir, "fs_mm", "part", "id",
      itemsPerFile = 10000L, numBits = 100000L)

    // cycle rewrites m03 with shifted v; the multi sidecar maintains
    // only that partition and conjunctive skipping stays exact
    val newRows = df.filter($"part" === "m03")
      .select($"id", $"part", ($"v" + 50000L).as("v"), $"w")
      .localCheckpoint(true)
    Versioned.overwriteTouchedPartitions(newRows, dir, "fs_mm", "part",
      Seq("m03"))
    FileStats.maintainSidecarMulti(spark, dir, "fs_mm", "part",
      Seq("v", "w"), Seq("m03"))
    // EVERY sidecar over a root maintains with the publish — a stale
    // bloom here would hand the reader a deleted file path
    FileStats.maintainBloomSidecar(spark, dir, "fs_mm", "part", "id",
      Seq("m03"), itemsPerFile = 10000L, numBits = 100000L)
    val preds = Seq(("v", Some(52000L: Any), Some(55000L: Any)),
      ("w", Some(0L: Any), None))
    val skip = FileStats.readSkippingMulti(spark, dir, "fs_mm", "part",
      preds)
    val full = Versioned.readPartitioned(spark, dir, "fs_mm")
      .filter($"v" >= 52000L && $"v" <= 55000L && $"w" >= 0L)
    assert(skip.orderBy($"id").collect().toSeq ==
      full.orderBy($"id").collect().toSeq)
    assert(skip.count() > 0)
    // stale-map hazard check: the maintained range exists ONLY in the
    // rewritten partition, so candidates must come from m03 alone
    assert(FileStats.candidateFilesMulti(spark, dir, "fs_mm", preds)
      .forall(_.contains("part=m03")))

    // a parts-restricted bloom probe prunes the sidecar read AND the
    // candidate set to the named partitions
    val hit = FileStats.readBloomSkipping(spark, dir, "fs_mm", "part",
      "id", 1003L, parts = Some(Seq("m03")))
    assert(hit.count() == 1L)
    assert(FileStats.bloomCandidateFiles(spark, dir, "fs_mm", 1003L,
      parts = Some(Seq("m00"))).isEmpty ||
      FileStats.readBloomSkipping(spark, dir, "fs_mm", "part", "id",
        1003L, parts = Some(Seq("m00"))).isEmpty,
      "a probe restricted to the wrong partition must return nothing")
  }

  test("bloom probe is distributed: executors evaluate membership, the driver collects file NAMES only") {
    val dir = graft.core.Scratch.dir("fstats_bloom_dist")
    val df = mkData(4000)
    Versioned.writePartitionedFull(df, dir, "fs_bd", Seq("part"))
    FileStats.buildBloomSidecar(spark, dir, "fs_bd", "part", "id",
      itemsPerFile = 10000L, numBits = 100000L)

    // the collected frame must carry NO filter bytes — its schema is
    // the one file-name column (the driver's share is O(candidates)·
    // name bytes, never O(files)·numBits/8)
    val frame = FileStats.bloomCandidateFrame(spark, dir, "fs_bd", 1234L)
    assert(frame.schema.fieldNames.toSeq == Seq("file"),
      s"driver-bound schema leaked filter bytes: " +
        s"${frame.schema.fieldNames.mkString(",")}")
    // and the membership filter sits UNDER the projection in the plan —
    // no bloom column survives past the executor-side filter
    assert(!frame.queryExecution.executedPlan.output
      .exists(_.name == "bloom"),
      "the executed plan still outputs the bloom column to the driver")

    // distributed verdicts ≡ a driver-side deserialize walk (the old
    // implementation, kept here as the spec's ground truth)
    val h = FileStats.bloomHash(1234L)
    val expected = Versioned.readPartitioned(spark, dir,
        FileStats.bloomPrefix("fs_bd"))
      .select($"file", $"bloom").collect().toSeq
      .filter { r =>
        org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
          .mightContainLong(h)
      }.map(_.getString(0)).sorted
    assert(FileStats.bloomCandidateFiles(spark, dir, "fs_bd", 1234L) ==
      expected)
  }

  test("unbounded probes keep all-null files: no bound means no exclusion") {
    val dir = graft.core.Scratch.dir("fstats_null_unbounded")
    // partition m1 entirely null on v
    val df = spark.range(200).select($"id",
      concat(lit("m"), ($"id" % 2).cast("string")).as("part"),
      when($"id" % 2 === 1, lit(null).cast("long")).otherwise($"id")
        .as("v"))
    Versioned.writePartitionedFull(df, dir, "fs_nu", Seq("part"))
    FileStats.buildSidecar(spark, dir, "fs_nu", "part", "v")
    // an UNBOUNDED candidate probe means "every file" — the all-null
    // exclusion only applies under a real bound (a range never matches
    // null, but no range keeps everything)
    val candAll = FileStats.candidateFiles(spark, dir, "fs_nu", None, None)
    assert(candAll.exists(_.contains("part=m1")),
      "unbounded probe dropped the all-null file")
    val skipAll = FileStats.readSkipping(spark, dir, "fs_nu", "part", "v",
      None, None)
    assert(skipAll.count() == 200L,
      "unbounded skipping read must equal the full scan, null rows included")
    // multi-column: a column constrained only by ANOTHER column's
    // bound keeps its all-null files too
    FileStats.buildSidecarMulti(spark, dir, "fs_nu", "part",
      Seq("id", "v"))
    val skipMixed = FileStats.readSkippingMulti(spark, dir, "fs_nu",
      "part", Seq(("id", Some(0L: Any), None), ("v", None, None)))
    assert(skipMixed.count() == 200L,
      "an unbounded column must not exclude its all-null files")
  }

  test("skipping and metadata paths refuse roots with outstanding delete vectors; MergeOnRead compositions serve minus-deleted") {
    val dir = graft.core.Scratch.dir("fstats_dv_guard")
    val df = mkData(4000)
    Versioned.writePartitionedFull(df, dir, "fs_dv", Seq("part"))
    FileStats.buildSidecar(spark, dir, "fs_dv", "part", "v")
    FileStats.buildSidecarMulti(spark, dir, "fs_dv", "part", Seq("v"))
    FileStats.buildBloomSidecar(spark, dir, "fs_dv", "part", "id",
      itemsPerFile = 10000L, numBits = 100000L)
    // pre-delete: paths work
    assert(FileStats.readSkipping(spark, dir, "fs_dv", "part", "v",
      Some(0L), Some(1000L)).count() > 0)

    val dead = df.filter($"id" % 5 === 0).select($"part", $"id")
      .localCheckpoint(true)
    Versioned.appendDeleteVectors(spark, dir, "fs_dv", "part", "id", dead)

    // every sidecar-planned path refuses — serving through the sidecar
    // would resurrect the deleted rows
    intercept[IllegalArgumentException] {
      FileStats.readSkipping(spark, dir, "fs_dv", "part", "v",
        Some(0L), Some(1000L))
    }
    intercept[IllegalArgumentException] {
      FileStats.readSkippingMulti(spark, dir, "fs_dv", "part",
        Seq(("v", Some(0L: Any), Some(1000L: Any))))
    }
    intercept[IllegalArgumentException] {
      FileStats.readBloomSkipping(spark, dir, "fs_dv", "part", "id", 100L)
    }
    intercept[IllegalArgumentException] {
      FileStats.statsOnlyAgg(spark, dir, "fs_dv")
    }

    // the compositions stay exact: ≡ merge-on-read + filter
    val skipMor = FileStats.readSkippingMergeOnRead(spark, dir, "fs_dv",
      "part", "id", "v", Some(0L), Some(3000L))
    val wantMor = Versioned.readMergeOnRead(spark, dir, "fs_dv", "part",
      "id").filter($"v" >= 0L && $"v" <= 3000L)
    assert(skipMor.orderBy($"id").collect().toSeq ==
      wantMor.orderBy($"id").collect().toSeq)
    assert(skipMor.filter($"id" % 5 === 0).isEmpty,
      "skipping composition resurrected a deleted row")
    // a deleted key's point lookup: bloom still names its file (one-
    // sided error), the DV anti-join erases the row
    assert(FileStats.readBloomSkippingMergeOnRead(spark, dir, "fs_dv",
      "part", "id", 100L, "id").isEmpty,
      "point lookup resurrected a deleted key")
    val alive = FileStats.readBloomSkippingMergeOnRead(spark, dir,
      "fs_dv", "part", "id", 101L, "id")
    assert(alive.count() == 1L)

    // purge restores the fast paths
    Versioned.purgeDeleteVectors(spark, dir, "fs_dv", "part", "id")
    FileStats.maintainSidecar(spark, dir, "fs_dv", "part", "v",
      (0 until 8).map(i => f"m$i%02d"))
    assert(FileStats.statsOnlyAgg(spark, dir, "fs_dv")
      .agg(sum($"n_rows")).first.getLong(0) ==
      df.filter($"id" % 5 =!= 0).count())
  }

  test("batched multi-key bloom lookup: one sidecar pass ≡ the union of single probes, isin residual exact, bounded batch") {
    val dir = graft.core.Scratch.dir("fstats_batch")
    val df = mkData(8000)
    Versioned.writePartitionedFull(df, dir, "fs_bk", Seq("part"))
    FileStats.buildBloomSidecar(spark, dir, "fs_bk", "part", "id",
      itemsPerFile = 10000L, numBits = 100000L)
    val keys = Seq(11L, 2042L, 4242L, 7777L)

    // the any-match candidate set IS the union of the per-key sets —
    // one sidecar pass instead of |batch| passes
    val batched = FileStats.bloomCandidateFilesForKeys(spark, dir,
      "fs_bk", keys)
    val union = keys.flatMap(k =>
      FileStats.bloomCandidateFiles(spark, dir, "fs_bk", k))
      .distinct.sorted
    assert(batched == union)
    val total = leafFiles(Versioned.partitionedRoot(dir, "fs_bk")).size
    assert(batched.nonEmpty && batched.size < total,
      s"batched lookup must still prune: ${batched.size} of $total")

    // exactness: pruned scan + isin residual ≡ full scan + isin,
    // absent keys contribute nothing (one-sided error)
    val got = FileStats.readBloomSkippingKeys(spark, dir, "fs_bk",
      "part", "id", keys :+ 999999L)
    val want = Versioned.readPartitioned(spark, dir, "fs_bk")
      .filter($"id".isin(keys :+ 999999L: _*))
    assert(got.orderBy($"id").collect().toSeq ==
      want.orderBy($"id").collect().toSeq)
    assert(got.count() == keys.length.toLong)

    // an oversized batch is a join workload, not a probe — refused
    intercept[IllegalArgumentException] {
      FileStats.bloomCandidateFilesForKeys(spark, dir, "fs_bk",
        (0 until FileStats.MaxBatchedLookupKeys + 1).map(_.toLong))
    }
  }

  test("metadata-only aggregate: answered from the sidecar, zero data files scanned") {
    val dir = graft.core.Scratch.dir("fstats_meta")
    FileStats.writeZoneClustered(mkData(2000), dir, "fs_meta",
      "part", "w", tasks = 8)
    FileStats.buildSidecar(spark, dir, "fs_meta", "part", "w")
    val agg = FileStats.statsOnlyAgg(spark, dir, "fs_meta")
    val planned = agg.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(planned.forall(
      _.relation.location.rootPaths.forall(_.toString.contains("_zmap"))),
      "stats-only aggregate must scan only the sidecar root")
    val got = agg.orderBy($"part").collect().toSeq
    val expect = Versioned.readPartitioned(spark, dir, "fs_meta")
      .groupBy($"part".cast("string").as("part"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count($"w")).as("n_nulls"),
        min($"w").as("min_v"), max($"w").as("max_v"))
      .orderBy($"part").collect().toSeq
    assert(got == expect,
      "sidecar-served counts/min/max must equal the data-derived truth " +
        "including null accounting")
  }
}
