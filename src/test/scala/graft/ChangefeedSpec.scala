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

  test("drift gate: a distribution-breaking window refuses and touches no state; a lax gate admits with the same tv; a pure-takedown window never refuses") {
    import graft.ext.Pq
    import graft.pipeline.Incremental
    val dir = graft.core.Scratch.dir("changefeed_gate")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("gat_root__")).foreach(_.delete()))
    val bw = 64L
    // two well-separated clusters, dim 4; seeds (lowest two vec_ids)
    // land one per cluster, so the trained coarse quantizer splits
    // them: evens -> cell 0's centroid, odds -> cell 1's
    def vecs(ids: Seq[Long], base: Array[Float]) =
      ids.map(i => (i,
        base.map(x => x + (i % 5) * 0.001f).toSeq)).toDF("vec_id",
        "embedding")
    val a = vecs(0L until 40L by 2, Array(1f, 0f, 0f, 0f))
    val b = vecs(1L until 40L by 2, Array(0f, 1f, 0f, 0f))
    val prior = a.unionByName(b)
    val bucketOf = Incremental.idBucket($"vec_id", bw)
    val g1 = "00000001_a"
    LakeTable.commitSnapshot(spark, dir, "gat_root", g1,
      Seq(LakeTable.RootPublish("gat_emb", "bucket",
        prior.withColumn("bucket", bucketOf).localCheckpoint(true))))
    Versioned.write(Pq.trainCodebooks(spark, prior, m = 1, subDim = 4,
      k = 2), dir, "gatcoarse", g1)
    Versioned.write(Pq.trainCodebooks(spark, prior, m = 2, subDim = 2,
      k = 2), dir, "gatfine", g1)
    val coarse0 = graft.ext.IvfIndex.materializeLocal(spark,
      Versioned.readLatest(spark, dir, "gatcoarse"))
    val fine0 = graft.ext.IvfIndex.materializeLocal(spark,
      Versioned.readLatest(spark, dir, "gatfine"))
    Versioned.writePartitionedFull(
      Pq.encode(prior, coarse0, m = 1, subDim = 4)
        .select($"vec_id", $"cid".as("cell"))
        .withColumn("bucket", bucketOf),
      dir, "gatcells", Seq("bucket"))
    Versioned.writePartitionedFull(
      Pq.encode(prior, fine0, m = 2, subDim = 2)
        .withColumn("bucket", bucketOf),
      dir, "gatcodes", Seq("bucket"))
    // g2: twenty upserts ALL in cluster A — prior shares 500/500,
    // upsert shares 1000/0, tv = (|1000-500| + |0-500|) div 2 = 500
    val up = vecs(100L until 120L, Array(1f, 0f, 0f, 0f))
    val g2 = "00000002_b"
    LakeTable.commitSnapshot(spark, dir, "gat_root", g2,
      Seq(LakeTable.RootPublish("gat_emb", "bucket",
        up.withColumn("bucket", bucketOf).localCheckpoint(true))))
    val queries = vecs(Seq(200L), Array(1f, 0f, 0f, 0f))
    def gated(from: String, to: String, tv: Long) =
      Incremental.ivfPqChangefeedGatedCycle(spark, dir, "gat_root",
        "gat_emb", "bucket", "gatcoarse", "gatfine", "gatcells",
        "gatcodes", from, to, queries, dim = 4, nProbe = 1, m = 2,
        subDim = 2, k = 3, bucketWidth = bw, tvMilli = tv)
    def cellIds() = Versioned.readPartitioned(spark, dir, "gatcells")
      .select($"vec_id").collect().map(_.getLong(0)).toSet

    // strict gate: tv=500 > 250 refuses, and the refusal lands BEFORE
    // any state write — the cells table still holds exactly the prior
    val before = cellIds()
    val ex = intercept[IllegalArgumentException] { gated(g1, g2, 250L) }
    assert(ex.getMessage.contains("REFUSED") &&
      ex.getMessage.contains("tv_milli=500"),
      s"wrong refusal: ${ex.getMessage}")
    assert(cellIds() == before,
      "a refused window touched the index state")

    // lax gate: the same window admits, carries the same tv, and the
    // maintenance lands the upserts
    val served = gated(g1, g2, 600L)
    assert(served.select($"tv_milli").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(500L))
    assert(cellIds() == before ++ (100L until 120L),
      "the admitted window did not land the upserts")

    // pure-takedown window: no upserts -> no drift evidence -> never
    // refused even at the strictest gate; the removals purge
    val g3 = "00000003_c"
    Versioned.commitSnapshotDeleteVectors(spark, dir, "gat_root",
      "gat_emb", "bucket", "vec_id",
      Seq((0L, 1L), (0L, 3L), (0L, 5L)).toDF("bucket", "vec_id")
        .localCheckpoint(true), g3)
    val served3 = gated(g2, g3, 1L)
    assert(served3.select($"tv_milli").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(0L))
    assert(cellIds() == before ++ (100L until 120L) -- Set(1L, 3L, 5L),
      "the takedown window did not purge the removed ids")
  }

  test("auto cycle: a tripped window RETRAINS on the target snapshot and rewrites the index; the next takedown window goes back to assign") {
    import graft.ext.Pq
    import graft.pipeline.Incremental
    val dir = graft.core.Scratch.dir("changefeed_auto")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(f => f.getName.startsWith("aut_root__") ||
        f.getName.startsWith("autcoarse__") ||
        f.getName.startsWith("autfine__"))
      .foreach(graft.core.Scratch.deleteRecursively))
    val bw = 64L
    def vecs(ids: Seq[Long], base: Array[Float]) =
      ids.map(i => (i,
        base.map(x => x + (i % 5) * 0.001f).toSeq)).toDF("vec_id",
        "embedding")
    val a = vecs(0L until 40L by 2, Array(1f, 0f, 0f, 0f))
    val b = vecs(1L until 40L by 2, Array(0f, 1f, 0f, 0f))
    val prior = a.unionByName(b)
    val bucketOf = Incremental.idBucket($"vec_id", bw)
    val g1 = "00000001_a"
    LakeTable.commitSnapshot(spark, dir, "aut_root", g1,
      Seq(LakeTable.RootPublish("aut_emb", "bucket",
        prior.withColumn("bucket", bucketOf).localCheckpoint(true))))
    Versioned.write(Pq.trainCodebooks(spark, prior, m = 1, subDim = 4,
      k = 2), dir, "autcoarse", g1)
    Versioned.write(Pq.trainCodebooks(spark, prior, m = 2, subDim = 2,
      k = 2), dir, "autfine", g1)
    val coarse0 = graft.ext.IvfIndex.materializeLocal(spark,
      Versioned.readLatest(spark, dir, "autcoarse"))
    val fine0 = graft.ext.IvfIndex.materializeLocal(spark,
      Versioned.readLatest(spark, dir, "autfine"))
    Versioned.writePartitionedFull(
      Pq.encode(prior, coarse0, m = 1, subDim = 4)
        .select($"vec_id", $"cid".as("cell"))
        .withColumn("bucket", bucketOf),
      dir, "autcells", Seq("bucket"))
    Versioned.writePartitionedFull(
      Pq.encode(prior, fine0, m = 2, subDim = 2)
        .withColumn("bucket", bucketOf),
      dir, "autcodes", Seq("bucket"))
    // g2: twenty upserts all in cluster A — tv = 500 trips a 250 gate
    val up = vecs(100L until 120L, Array(1f, 0f, 0f, 0f))
    val g2 = "00000002_b"
    LakeTable.commitSnapshot(spark, dir, "aut_root", g2,
      Seq(LakeTable.RootPublish("aut_emb", "bucket",
        up.withColumn("bucket", bucketOf).localCheckpoint(true))))
    val queries = vecs(Seq(200L), Array(1f, 0f, 0f, 0f))
    def auto(from: String, to: String, newTag: String) =
      Incremental.ivfPqChangefeedAutoCycle(spark, dir, "aut_root",
        "aut_emb", "bucket", "autcoarse", "autfine", "autcells",
        "autcodes", from, to, queries, dim = 4, nProbe = 1, m = 2,
        subDim = 2, k = 3, kCells = 2, kSub = 2, bucketWidth = bw,
        tvMilli = 250L, newTag = newTag)

    val served = auto(g1, g2, "00000003_idx")
    val tags = served.select($"tv_milli", $"path").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(tags == Seq((500L, "rebuild")), s"wrong branch: $tags")
    // the quantizer store ADVANCED to the rebuild version...
    assert(Versioned.resolveLatest(dir, "autcoarse").get
      .contains("00000003_idx"), "rebuild did not publish the quantizer")
    // ...and the index is the full re-encode of the target snapshot's
    // corpus (prior ∪ upserts) against the RETRAINED coarse quantizer
    val coarse2 = graft.ext.IvfIndex.materializeLocal(spark,
      Versioned.readLatest(spark, dir, "autcoarse"))
    val corpus = prior.unionByName(up)
    val wantCells = Pq.encode(corpus, coarse2, m = 1, subDim = 4)
      .select($"vec_id", $"cid".as("cell")).as[(Long, Long)]
      .collect().toSet
    val gotCells = Versioned.readPartitioned(spark, dir, "autcells")
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    assert(gotCells == wantCells,
      "rebuilt cells are not the full re-encode against the new quantizer")

    // a pure-takedown window after the rebuild: no upserts, no drift
    // evidence — back to the ASSIGN path; quantizers stay at the
    // rebuild version and the removals purge
    val g3 = "00000003_c"
    Versioned.commitSnapshotDeleteVectors(spark, dir, "aut_root",
      "aut_emb", "bucket", "vec_id",
      Seq((0L, 2L), (0L, 4L)).toDF("bucket", "vec_id")
        .localCheckpoint(true), g3)
    val served3 = auto(g2, g3, "00000004_zzz")
    val tags3 = served3.select($"tv_milli", $"path").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(tags3 == Seq((0L, "assign")), s"wrong branch: $tags3")
    assert(Versioned.resolveLatest(dir, "autcoarse").get
      .contains("00000003_idx"),
      "an assign window must not republish the quantizer")
    val after = Versioned.readPartitioned(spark, dir, "autcells")
      .select($"vec_id").as[Long].collect().toSet
    assert(after == wantCells.map(_._1) -- Set(2L, 4L),
      "the takedown window did not purge the removed ids")
  }

  test("rebuild intent: a crashed rebuild's replay completes the rebuild even when the re-measured gate would assign; a foreign intent refuses") {
    import graft.ext.Pq
    import graft.pipeline.Incremental
    val dir = graft.core.Scratch.dir("changefeed_intent")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(f => f.getName.startsWith("itt_root__") ||
        f.getName.startsWith("ittcoarse__") ||
        f.getName.startsWith("ittfine__") ||
        f.getName.startsWith("ittcells_rbintent__"))
      .foreach(graft.core.Scratch.deleteRecursively))
    val bw = 64L
    def vecs(ids: Seq[Long], base: Array[Float]) =
      ids.map(i => (i,
        base.map(x => x + (i % 5) * 0.001f).toSeq)).toDF("vec_id",
        "embedding")
    val a = vecs(0L until 40L by 2, Array(1f, 0f, 0f, 0f))
    val b = vecs(1L until 40L by 2, Array(0f, 1f, 0f, 0f))
    val prior = a.unionByName(b)
    val bucketOf = Incremental.idBucket($"vec_id", bw)
    val g1 = "00000001_a"
    LakeTable.commitSnapshot(spark, dir, "itt_root", g1,
      Seq(LakeTable.RootPublish("itt_emb", "bucket",
        prior.withColumn("bucket", bucketOf).localCheckpoint(true))))
    Versioned.write(Pq.trainCodebooks(spark, prior, m = 1, subDim = 4,
      k = 2), dir, "ittcoarse", g1)
    Versioned.write(Pq.trainCodebooks(spark, prior, m = 2, subDim = 2,
      k = 2), dir, "ittfine", g1)
    val coarse0 = graft.ext.IvfIndex.materializeLocal(spark,
      Versioned.readLatest(spark, dir, "ittcoarse"))
    val fine0 = graft.ext.IvfIndex.materializeLocal(spark,
      Versioned.readLatest(spark, dir, "ittfine"))
    Versioned.writePartitionedFull(
      Pq.encode(prior, coarse0, m = 1, subDim = 4)
        .select($"vec_id", $"cid".as("cell"))
        .withColumn("bucket", bucketOf),
      dir, "ittcells", Seq("bucket"))
    Versioned.writePartitionedFull(
      Pq.encode(prior, fine0, m = 2, subDim = 2)
        .withColumn("bucket", bucketOf),
      dir, "ittcodes", Seq("bucket"))
    val up = vecs(100L until 120L, Array(1f, 0f, 0f, 0f))
    val g2 = "00000002_b"
    LakeTable.commitSnapshot(spark, dir, "itt_root", g2,
      Seq(LakeTable.RootPublish("itt_emb", "bucket",
        up.withColumn("bucket", bucketOf).localCheckpoint(true))))
    val queries = vecs(Seq(200L), Array(1f, 0f, 0f, 0f))
    def auto(tv: Long, newTag: String) =
      Incremental.ivfPqChangefeedAutoCycle(spark, dir, "itt_root",
        "itt_emb", "bucket", "ittcoarse", "ittfine", "ittcells",
        "ittcodes", g1, g2, queries, dim = 4, nProbe = 1, m = 2,
        subDim = 2, k = 3, kCells = 2, kSub = 2, bucketWidth = bw,
        tvMilli = tv, newTag = newTag)
    def intent(tag: String): Unit = Versioned.write(
      Seq((g1, g2)).toDF("from_tag", "to_tag"),
      dir, "ittcells_rbintent", tag)

    // a FOREIGN window's intent refuses before any state is touched
    intent("00000000_stale")
    val ex = intercept[IllegalArgumentException] {
      auto(999L, "00000003_idx") }
    assert(ex.getMessage.contains("interrupted rebuild"),
      s"wrong refusal: ${ex.getMessage}")
    Versioned.resolveLatest(dir, "ittcells_rbintent").foreach(p =>
      graft.core.Scratch.deleteRecursively(new java.io.File(p)))

    // THIS window's intent (the crashed-replay breadcrumb) forces the
    // rebuild branch even though tv=500 <= 999 would assign — the
    // re-measured gate must never freeze a half-rebuilt index in
    intent("00000003_idx")
    val served = auto(999L, "00000003_idx")
    val tags = served.select($"tv_milli", $"path").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(tags == Seq((500L, "rebuild")),
      s"a pending intent did not force the rebuild: $tags")
    // the completed rebuild cleared its intent and published coherently
    assert(Versioned.resolveLatest(dir, "ittcells_rbintent").isEmpty,
      "a completed rebuild left its intent behind")
    val coarse2 = graft.ext.IvfIndex.materializeLocal(spark,
      Versioned.readLatest(spark, dir, "ittcoarse"))
    assert(Versioned.resolveLatest(dir, "ittcoarse").get
      .contains("00000003_idx"))
    val want = Pq.encode(prior.unionByName(up), coarse2, m = 1,
        subDim = 4)
      .select($"vec_id", $"cid".as("cell")).as[(Long, Long)]
      .collect().toSet
    val got = Versioned.readPartitioned(spark, dir, "ittcells")
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    assert(got == want, "the resumed rebuild left an incoherent index")
  }

  test("a compaction-only window: pins move but the feed is EMPTY and index maintenance no-ops through it") {
    import graft.pipeline.Incremental
    val dir = graft.core.Scratch.dir("changefeed_compact")
    Option(new java.io.File(dir).listFiles()).foreach(_.toSeq
      .filter(_.getName.startsWith("cfc_root__")).foreach(_.delete()))
    val bw = 64L
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (65L, "epsilon zeta eta theta"), (66L, "iota kappa lambda mu"))
      .toDF("doc_id", "text")
      .withColumn("bucket", Incremental.idBucket($"doc_id", bw))
    val g1 = "00000001_a"
    // fat publish (the salt must actually fan out — AQE's coalescing
    // folds tiny shuffles to one file, correctly, at real sizes)
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val priorConf = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      LakeTable.commitSnapshot(spark, dir, "cfc_root", g1,
        Seq(LakeTable.RootPublish("cfc_docs", "bucket",
          docs.localCheckpoint(true), filesPerPartition = 4)))
    } finally spark.conf.set(key, priorConf)
    Versioned.writePartitionedFull(
      graft.ext.Dedup.signatureState(docs, "doc_id", "text", n = 2,
          bands = 4, rowsPerBand = 2)
        .withColumn("bucket", Incremental.idBucket($"id", bw)),
      dir, "cfc_state", Seq("bucket"))
    def stateFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).map(_.toSeq)
          .getOrElse(Seq.empty).flatMap(walk)
        else Seq(f)
      walk(new java.io.File(dir, "cfc_state"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getPath, f.length(), f.lastModified())).sortBy(_._1)
    }
    val filesBefore = stateFiles()

    // the compaction-only commit: every fat leaf re-pins to a fresh
    // generation — pure pin movement, zero row change
    val g2 = "00000002_b"
    val compacted = Versioned.compactSnapshotLeaves(spark, dir,
      "cfc_root", Seq("cfc_docs" -> "bucket"), g2, maxFiles = 1)
    assert(compacted("cfc_docs").nonEmpty, "fixture: nothing compacted")
    assert(Versioned.changedPartitions(dir, "cfc_root", "cfc_docs",
      g1, g2).nonEmpty, "fixture: compaction moved no pins")

    // the feed between the tags is EMPTY — pin movement without row
    // change is invisible to consumers (semantic, not vacuous: the
    // pins DID move, so the feed had to read and diff those leaves)
    assert(Versioned.snapshotChangefeed(spark, dir, "cfc_root",
      "cfc_docs", "bucket", Seq("doc_id"), g1, g2).count() == 0L,
      "a compaction-only window produced a non-empty changefeed")

    // and maintenance through the window is a genuine no-op: no pairs
    // reported, no state bucket rewritten (files byte-identical)
    val pairs = Incremental.lshDedupChangefeedCycle(spark, dir,
      "cfc_root", "cfc_docs", "bucket", "doc_id", "text", g1, g2,
      "cfc_state", n = 2, threshold = 0.2, bands = 4, rowsPerBand = 2,
      bucketWidth = bw)
    assert(pairs.count() == 0L,
      "maintenance through a compaction-only window reported pairs")
    assert(stateFiles() == filesBefore,
      "maintenance through a compaction-only window rewrote state files")
  }

  test("continuous consumer maintenance: after the followManifest loop the postings state ≡ full rebuild over the final corpus, and a caught-up re-follow consumes nothing") {
    // q431's loop: append window, edit window, takedown window
    SparkEntry.queries("q431_bm25_follow")(spark, sfDir).collect()
    val dir = graft.core.Scratch.dir("q431_bfl")
    val got = Versioned.readPartitioned(spark, dir, "bfl_post")
      .select($"id", $"tok", $"tf").as[(Long, String, Long)]
      .collect().toSeq.sorted
    val finalCorpus = graft.core.Tables.documents(spark, sfDir)
      .filter(!($"doc_id" % 13 === 0 && $"doc_id" % 17 =!= 0))
      .withColumn("text",
        when($"doc_id" % 19 === 0, concat($"text", lit(" melon melon")))
          .otherwise($"text"))
    val want = finalCorpus
      .select($"doc_id".as("id"),
        explode(graft.ext.TextAnalysis.tokens($"text")).as("tok"))
      .groupBy($"id", $"tok").agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSeq.sorted
    assert(got == want,
      "the loop-maintained postings drifted from the full rebuild")
    // the cursor the loop returned is caught up: nothing to consume
    var n = 0
    Versioned.followManifest(dir, "bfl_root", "00000004_ddd") {
      (_, _) => n += 1 }
    assert(n == 0, "a caught-up consumer re-consumed a window")
  }

  test("autonomous consumer: after the followManifest × auto-cycle loop the index ≡ re-encode of the survivors against the published quantizer") {
    import graft.ext.Pq
    import org.apache.spark.sql.functions.{element_at, round => rnd}
    // q433's loop: tail-batch window (may rebuild mid-loop), takedown
    // window (assign) — whatever branch won, the published state must
    // be exactly the survivors encoded against the LATEST quantizer,
    // and a taken-down vector must be gone
    SparkEntry.queries("q433_ivfpq_follow_auto")(spark, sfDir).collect()
    val dir = graft.core.Scratch.dir("q433_afl")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val hs = rnd(element_at($"embedding", 1).cast("double") * 1000000, 0)
      .cast("long") > 250000L
    val survivors = emb.filter(!($"vec_id" % 13 === 0 && !hs))
    val coarse = graft.ext.IvfIndex.materializeLocal(spark,
      Versioned.readLatest(spark, dir, "aflcoarse"))
    val want = Pq.encode(survivors, coarse, m = 1, subDim = 64)
      .select($"vec_id", $"cid".as("cell")).as[(Long, Long)]
      .collect().toSet
    val got = Versioned.readPartitioned(spark, dir, "aflcells")
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    assert(got == want,
      "the loop-maintained cells drifted from the survivor re-encode")
    val gone = emb.filter($"vec_id" % 13 === 0 && !hs)
      .select($"vec_id").as[Long].collect().toSet
    assert(gone.nonEmpty && got.map(_._1).intersect(gone).isEmpty,
      "a taken-down vector survived in the maintained index")
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
