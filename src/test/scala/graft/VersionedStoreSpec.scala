package graft

import org.apache.spark.sql.functions._
import graft.io.Versioned

/** Operational contracts of the versioned store added for the 100 TB
  * publish path: retention GC (superseded object versions must not
  * accumulate forever), the monotonic-tag conditional publish
  * (overlapping cycles must fail loudly, never interleave silently),
  * and the partitioned-state primitives' edge cases (a touched
  * partition emptied by retraction must actually disappear).
  */
class VersionedStoreSpec extends SparkTestBase {
  import spark.implicits._

  test("gc keeps the newest N versions; readLatest serves after GC") {
    val dir = graft.core.Scratch.dir("spec_vgc")
    for (i <- 1 to 4)
      Versioned.write(Seq((i, s"v$i")).toDF("n", "v"), dir, "g",
        f"$i%08d_t$i")
    val deleted = Versioned.gc(dir, "g", keepLast = 2)
    assert(deleted.length == 2 &&
      deleted.forall(p => p.contains("00000001") || p.contains("00000002")),
      s"gc deleted the wrong versions: $deleted")
    deleted.foreach(p => assert(!new java.io.File(p).exists(),
      s"gc reported but did not delete $p"))
    // the survivors still resolve and serve, newest first
    val latest = Versioned.readLatest(spark, dir, "g").collect()
    assert(latest.map(_.getInt(0)).toSeq == Seq(4),
      "readLatest no longer serves the newest version after GC")
    assert(Versioned.resolveLatest(dir, "g").exists(_.contains("00000004")))
    // idempotent: nothing left to delete
    assert(Versioned.gc(dir, "g", keepLast = 2).isEmpty)
    // the newest version is never eligible
    assert(Versioned.gc(dir, "g", keepLast = 1).length == 1)
    assert(Versioned.readLatest(spark, dir, "g").count() == 1L)
    intercept[IllegalArgumentException] { Versioned.gc(dir, "g", 0) }
  }

  test("a delta cycle still serves correctly after GC removes superseded versions") {
    import org.apache.spark.sql.functions._
    val dir = graft.core.Scratch.dir("spec_vgc_cycle")
    val keys = Seq("g")
    def rows(lo: Int, hi: Int) = (lo until hi)
      .map(i => (s"g${i % 7}", i.toLong)).toDF("g", "v")
    Versioned.write(graft.ops.IncrementalAgg.rollupState(rows(0, 100),
      keys, col("v")), dir, "gst", "00000001_a")
    Versioned.write(rows(100, 200), dir, "graw", "00000002_b")
    graft.pipeline.Incremental.deltaCycle(spark, dir, "gst", "graw", keys,
      col("v"), "00000002_b").count()
    // superseded versions GC away: the raw delta (consumed) and the
    // next-state store keeps only its newest
    Versioned.write(rows(200, 300), dir, "graw", "00000003_c")
    assert(Versioned.gc(dir, "graw", keepLast = 1).length == 1)
    Versioned.gc(dir, "gst_next", keepLast = 1)
    val out = graft.pipeline.Incremental.deltaCycle(spark, dir, "gst_next",
        "graw", keys, col("v"), "00000003_c")
      .collect().map(r => (r.getString(0), r.getAs[Long]("sum_cents"))).toMap
    val full = graft.ops.IncrementalAgg.rollupState(rows(0, 300), keys,
        col("v"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("sum_cents"))).toMap
    assert(out == full,
      s"cycle after GC diverged from full recompute: $out vs $full")
  }

  test("gc scopes to its prefix: sibling prefixes survive") {
    val dir = graft.core.Scratch.dir("spec_vgc_scope")
    for (i <- 1 to 3) {
      Versioned.write(Seq(i).toDF("n"), dir, "a", f"$i%08d_t")
      Versioned.write(Seq(i).toDF("n"), dir, "a_next", f"$i%08d_t")
    }
    Versioned.gc(dir, "a", keepLast = 1)
    // "a_next" versions share the "a" name prefix as a STRING but are a
    // different object lineage — all three must survive an "a" GC
    assert(Versioned.resolveLatest(dir, "a_next").isDefined)
    val survivors = Option(new java.io.File(dir).listFiles()).get
      .map(_.getName).count(_.startsWith("a_next__"))
    assert(survivors == 3, s"gc of 'a' ate sibling 'a_next' versions")
  }

  test("writeGuarded refuses a stale or replayed tag, accepts a newer one") {
    val dir = graft.core.Scratch.dir("spec_vguard")
    Versioned.writeGuarded(Seq(1).toDF("n"), dir, "w", "00000002_b")
    // a concurrent cycle that lost the race (older tag) must fail loudly
    intercept[IllegalArgumentException] {
      Versioned.writeGuarded(Seq(2).toDF("n"), dir, "w", "00000001_a")
    }
    // replaying the SAME tag is also refused (not strictly newer)
    intercept[IllegalArgumentException] {
      Versioned.writeGuarded(Seq(3).toDF("n"), dir, "w", "00000002_b")
    }
    Versioned.writeGuarded(Seq(4).toDF("n"), dir, "w", "00000003_c")
    assert(Versioned.readLatest(spark, dir, "w").collect()
      .map(_.getInt(0)).toSeq == Seq(4))
  }

  test("overwriteTouchedPartitions: only present partitions rewrite; emptied touched partitions disappear") {
    val dir = graft.core.Scratch.dir("spec_vparts")
    val init = Seq(("2024-01", 1L), ("2024-02", 2L), ("2024-03", 3L))
      .toDF("m", "v")
    val root = Versioned.writePartitionedFull(init, dir, "ps", Seq("m"))
    def partFiles(m: String) = Option(
      new java.io.File(root, s"m=$m").listFiles()).map(_.toSeq)
      .getOrElse(Seq.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1)
    val janBefore = partFiles("2024-01")
    assert(janBefore.nonEmpty, "fixture wrote no January files")
    Thread.sleep(1100) // mtime granularity guard
    // the cycle touches Feb (rewrite) and Mar (fully retracted): the
    // written frame carries only Feb rows, Mar is touched-but-absent
    Versioned.overwriteTouchedPartitions(
      Seq(("2024-02", 20L)).toDF("m", "v"),
      dir, "ps", "m", Seq("2024-02", "2024-03"))
    assert(partFiles("2024-01") == janBefore,
      "an untouched partition's files changed under dynamic overwrite")
    assert(partFiles("2024-03").isEmpty &&
      !new java.io.File(root, "m=2024-03").exists(),
      "a fully-retracted touched partition survived the publish")
    val out = Versioned.readPartitioned(spark, dir, "ps")
      .collect().map(r => (r.getAs[String]("m"), r.getAs[Long]("v"))).toSet
    assert(out == Set(("2024-01", 1L), ("2024-02", 20L)),
      s"published partitioned state wrong: $out")
  }

  test("filesPerPartition salts a hot partition's write across tasks") {
    // a month holding most of a delta would otherwise funnel into ONE
    // write task under the partition-column clustering (the layout that
    // keeps small months at one file each) — the salt splits it. AQE's
    // small-shuffle coalescing would re-merge this test's 40k-row salt
    // buckets into one task (it wouldn't at a real month's size), so
    // the certificate runs in a session with coalescing off; xxhash64
    // is deterministic, so the observed split is stable across runs.
    val ns = spark.newSession()
    ns.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    ns.conf.set("spark.sql.shuffle.partitions", "16")
    val dir = graft.core.Scratch.dir("spec_vsalt")
    val df = ns.range(0, 40000)
      .selectExpr("CASE WHEN id % 20 = 0 THEN '2024-02' ELSE '2024-01' END AS m",
        "id AS v")
    val root = Versioned.writePartitionedFull(df, dir, "hs", Seq("m"),
      filesPerPartition = 4)
    def nFiles(m: String) = Option(
      new java.io.File(root, s"m=$m").listFiles()).map(_.toSeq)
      .getOrElse(Seq.empty).count(_.getName.endsWith(".parquet"))
    assert(nFiles("2024-01") >= 2 && nFiles("2024-01") <= 4,
      s"hot month wrote ${nFiles("2024-01")} files — salt did not split it")
    // content survives the salted layout, and the dynamic-overwrite
    // path accepts the same knob
    assert(Versioned.readPartitioned(spark, dir, "hs").count() == 40000L)
    Versioned.overwriteTouchedPartitions(
      ns.range(0, 10000).selectExpr("'2024-01' AS m", "id AS v"),
      dir, "hs", "m", Seq("2024-01"), filesPerPartition = 4)
    assert(nFiles("2024-01") >= 2 && nFiles("2024-01") <= 4)
    val out = Versioned.readPartitioned(spark, dir, "hs")
    assert(out.filter($"m" === "2024-01").count() == 10000L &&
      out.filter($"m" === "2024-02").count() == 2000L)
  }

  test("readPartitions prunes at plan time: untouched partitions never scheduled") {
    val dir = graft.core.Scratch.dir("spec_vprune")
    val init = Seq(("2024-01", 1L), ("2024-02", 2L), ("2024-03", 3L))
      .toDF("m", "v")
    Versioned.writePartitionedFull(init, dir, "pr", Seq("m"))
    spark.catalog.clearCache() // scan-posture audit (house rule)
    val read = Versioned.readPartitions(spark, dir, "pr", "m",
      Seq("2024-02"))
    assert(read.collect().map(_.getAs[Long]("v")).toSeq == Seq(2L))
    val scan = read.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val feb = Option(new java.io.File(
      Versioned.partitionedRoot(dir, "pr"), "m=2024-02").listFiles())
      .get.count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value == feb,
      s"scan scheduled ${scan.metrics("numFiles").value} files, " +
        s"expected only February's $feb")
    assert(scan.metadata("PartitionFilters").contains("m"),
      s"no partition filter: ${scan.metadata("PartitionFilters")}")
    // the empty touched set reads nothing and keeps the schema
    val none = Versioned.readPartitions(spark, dir, "pr", "m", Seq.empty)
    assert(none.isEmpty && none.columns.toSet == Set("m", "v"))
  }
}
