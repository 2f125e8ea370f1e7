package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-hardening certificates: the engine's scale story leans on
  * fine-grained shuffle keys and map-side partial aggregation; this
  * suite PROVES it on a Zipf fixture where ONE key holds 60% of the
  * rows, using per-task shuffle-read metrics as the certificate —
  * a skew-oblivious plan funnels the hot key's whole row group through
  * one task (measured here as the naive baseline), the engine's shape
  * must not.
  *
  * All fixtures are parquet-backed (constant-folding eats
  * LocalRelation plans — the PlanAudit lesson).
  */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // ---- fixtures: 60%-hot Zipf key over parquet ------------------------
  private lazy val occPath: String = {
    val p = graft.core.Scratch.dir("skew_occ") + "/occ.parquet"
    // 50k occurrences: token "hot" at 60% of positions, 500 cold tokens
    spark.range(0, 50000).select(
        when($"id" % 5 < 3, "hot")
          .otherwise(concat(lit("t"), ($"id" % 500).cast("string"))).as("tok"),
        $"id".as("gp"))
      .write.mode("overwrite").parquet(p)
    p
  }
  private lazy val docsPath: String = {
    val p = graft.core.Scratch.dir("skew_docs") + "/docs.parquet"
    // 50k docs: 60% share one exact text (a giant dup group)
    spark.range(0, 50000).select($"id",
        when($"id" % 5 < 3, "the hot duplicated text body")
          .otherwise(concat(lit("unique text "), $"id".cast("string"))).as("text"))
      .write.mode("overwrite").parquet(p)
    p
  }

  // ---- per-task shuffle-read tap --------------------------------------
  private class TaskTap extends SparkListener {
    val recs = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) recs.add(m.shuffleReadMetrics.recordsRead)
    }
  }

  /** Max records any single task read from a shuffle while `action`
    * ran — the straggler certificate. Polls the listener queue until
    * it stops growing (the bus delivers asynchronously).
    */
  private def maxTaskShuffleRead(action: => Unit): Long = {
    val tap = new TaskTap
    spark.sparkContext.addSparkListener(tap)
    try {
      action
      var prev = -1; var stable = 0
      while (stable < 3) {
        val n = tap.recs.size
        if (n == prev) stable += 1 else { stable = 0; prev = n }
        Thread.sleep(150)
      }
      import scala.jdk.CollectionConverters._
      tap.recs.asScala.map(_.longValue).foldLeft(0L)(math.max)
    } finally spark.sparkContext.removeSparkListener(tap)
  }

  test("two-phase gap moments: no task ingests the hot token's stream; the naive window does") {
    val occ = spark.read.parquet(occPath)
    val hotCount = occ.filter($"tok" === "hot").count() // 30k of 50k
    val twoPhase = graft.ops.Ranks.twoPhaseGapMoments(occ, "tok", $"gp")
    var tpRows: Array[org.apache.spark.sql.Row] = null
    val tpMax = maxTaskShuffleRead { tpRows = twoPhase.collect() }
    // naive baseline: the partition-less-per-key window the operator
    // exists to avoid — its hot task must swallow the whole hot stream
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"tok").orderBy($"gp")
    val naive = occ.withColumn("g", $"gp" - lag($"gp", 1).over(w))
      .filter($"g".isNotNull)
      .groupBy($"tok").agg(count(lit(1)).as("n_gaps"),
        sum($"g").as("sum_gap"), sum($"g" * $"g").as("sum_gap_sq"))
    var nvRows: Array[org.apache.spark.sql.Row] = null
    val nvMax = maxTaskShuffleRead { nvRows = naive.collect() }
    // identical moments...
    def asMap(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      r.getAs[String]("tok") -> (r.getAs[Long]("n_gaps"),
        r.getAs[Long]("sum_gap"), r.getAs[Long]("sum_gap_sq"))).toMap
    assert(asMap(tpRows).view.filterKeys(asMap(nvRows).contains).toMap
      == asMap(nvRows),
      "two-phase moments diverge from the sequential window")
    // ...and the straggler certificate: naive funnels >= the hot stream
    // into one task, two-phase stays near the balanced range share
    assert(nvMax >= hotCount,
      s"baseline didn't exhibit the skew (max task read $nvMax < $hotCount)")
    assert(tpMax < hotCount / 2,
      s"two-phase still funnels the hot token: max task read $tpMax of $hotCount hot rows")
  }

  test("exact-dup groups absorb a 30k-row dup group map-side") {
    val docs = spark.read.parquet(docsPath)
    var out: Array[org.apache.spark.sql.Row] = null
    val mx = maxTaskShuffleRead {
      out = graft.ext.Dedup.exactDupGroups(docs, "id", Seq("text")).collect()
    }
    assert(out.length == 1 && out.head.getAs[Long]("n_dups") == 30000L
      && out.head.getAs[Long]("keep_id") == 0L)
    // partial aggregation collapses the hot group to one row per map
    // partition BEFORE the exchange: the reduce side never sees the
    // 30k rows (bound: distinct keys + a few per-partition partials)
    assert(mx < 25000L,
      s"hot dup group crossed the shuffle as rows: max task read $mx")
  }

  test("gated merge streams a 60%-hot ambiguous key instead of buffering it") {
    val docs = spark.read.parquet(docsPath)
    val left = docs.select($"text".as("k"), $"id".as("lv"))
    val right = docs.select($"text".as("k"), ($"id" + 1000000L).as("rv"))
    var n = 0L
    val mx = maxTaskShuffleRead {
      n = graft.ops.GatedMerge.gatedOneToOne(left, right, Seq("k")).count()
    }
    // 30k hot left + 30k hot right pass through unjoined; 20k unique
    // keys join 1:1 → 20k + 60k rows
    assert(n == 80000L, s"gated merge row count $n")
    // the count-side aggregation partial-combines; the join probe tasks
    // stream — no task may buffer-read the union of both hot sides.
    // (The old count-window form read 60k+ in one task here.)
    assert(mx < 45000L, s"hot key still funnels one task: max read $mx")
  }

  test("gated merge CYCLE absorbs a 60%-hot delta device-day") {
    // the incremental lane around GatedMerge (q384's retract-and-remerge)
    // adds its own shuffles: touched-key distinct, semi/anti joins
    // against the accumulated states, and the published-merge anti-join.
    // A nightly delta where ONE device uploads 60% of the rows must not
    // funnel any of them through one task.
    val dir = graft.core.Scratch.dir("skew_gmcycle")
    val keys = Seq("k")
    val lp = spark.range(0, 20000).select(
      concat(lit("k"), $"id").as("k"), $"id".as("lv"))
    val rp = spark.range(0, 20000).select(
      concat(lit("k"), $"id").as("k"), ($"id" + 1000000L).as("rv"))
    graft.io.Versioned.write(lp, dir, "sl", "00000001_a")
    graft.io.Versioned.write(rp, dir, "sr", "00000001_a")
    graft.io.Versioned.write(
      graft.ops.GatedMerge.gatedOneToOne(lp, rp, keys), dir, "sm",
      "00000001_a")
    // delta: 50k survey rows, 60% on ONE hot key; the rest on fresh keys
    graft.io.Versioned.write(spark.range(0, 50000).select(
        when($"id" % 5 < 3, "hot")
          .otherwise(concat(lit("n"), $"id".cast("string"))).as("k"),
        ($"id" + 2000000L).as("lv")),
      dir, "slraw", "00000002_b")
    graft.io.Versioned.write(spark.range(0, 10).select(
        lit("hot").as("k"), ($"id" + 3000000L).as("rv")),
      dir, "srraw", "00000002_b")
    var n = 0L
    val mx = maxTaskShuffleRead {
      n = graft.pipeline.Incremental.gatedMergeCycle(spark, dir, "sl",
        "sr", "sm", "slraw", "srraw", keys, "00000002_b").count()
    }
    // hot key: 30k left + 10 right, all ambiguous → pass-throughs;
    // 20k fresh keys: one left-only pass-through each; 20k untouched
    // prior keys: their published joined row carries over
    assert(n == 30010L + 20000L + 20000L, s"cycle row count $n")
    // the certificate: the hot stream (30k rows) must never be BUFFERED
    // together with its counterpart or the cold bulk in one task — the
    // count aggregations partial-combine and the join probes stream
    // (same bound discipline as the direct GatedMerge certificate)
    assert(mx < 25000L,
      s"hot device-day still funnels one task: max shuffle read $mx")
  }

  test("interval join streams a 4M-pair hot STRING key out of the sweep kernel") {
    // one string key holds 2000 fully-overlapping intervals per side →
    // 2000² = 4M output pairs; 2000 cold rows sit on singleton keys
    // with disjoint unit intervals (each matches only itself)
    val p = graft.core.Scratch.dir("skew_iv") + "/iv.parquet"
    spark.range(0, 4000).select(
        when($"id" < 2000, "hot")
          .otherwise(concat(lit("cold"), $"id".cast("string"))).as("k"),
        when($"id" < 2000, $"id" % 50).otherwise($"id" * 10000L).as("lo"),
        when($"id" < 2000, $"id" % 50 + 9000L).otherwise($"id" * 10000L + 1L)
          .as("hi"),
        $"id".as("rid"))
      .write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
    val l = df.select($"k".as("lk"), $"lo".as("llo"), $"hi".as("lhi"),
      $"rid".as("lid"))
    val r = df.select($"k".as("rk"), $"lo".as("rlo"), $"hi".as("rhi"),
      $"rid".as("rrid"))
    var n = 0L
    val mx = maxTaskShuffleRead {
      n = graft.plans.IntervalOverlapJoin.join(
        l, r, "lk", "llo", "lhi", "rk", "rlo", "rhi").count()
    }
    assert(n == 2000L * 2000L + 2000L, s"pair count $n")
    // the certificate: the exec's INPUT shuffles at data size (8k rows
    // across both sides — AQE may coalesce them into one task) and the
    // 4M pairs stream out of the sweep kernel — a pair-materializing
    // plan would read millions of shuffled rows in one task
    assert(mx <= 8000L,
      s"hot string key's pairs crossed a shuffle: max task read $mx")
  }

  test("banded containment screen stays sub-quadratic under a corpus-wide stop-shingle") {
    // every doc shares one hot sentence; without the df cap the hot
    // shingle alone would generate ~n² candidates
    val p = graft.core.Scratch.dir("skew_shingle") + "/docs.parquet"
    spark.range(0, 2000).select($"id",
        concat(lit("the quick brown fox jumps over it "),
          lit("doc "), $"id".cast("string"), lit(" body "),
          ($"id" % 7).cast("string"), lit(" tail "),
          ($"id" % 11).cast("string"))
          .as("text"))
      .write.mode("overwrite").parquet(p)
    val docs = spark.read.parquet(p)
    val pairs = graft.ext.Dedup.ngramContainmentPairsBanded(
      docs, "id", "text", n = 3, threshold = 0.5, blockCols = Seq.empty,
      probes = 4, maxDf = 64)
    val cnt = pairs.count()
    // df cap drops the ubiquitous shingles: candidates per doc are
    // bounded by probes·maxDf = 256, so the 2000-doc corpus emits far
    // fewer than the ~4M pairs the hot shingle alone would license
    assert(cnt < 2000L * 4 * 64,
      s"screen emitted $cnt pairs — the stop-shingle leaked through the cap")
  }

  test("partitioned postings publish absorbs a hot tail bucket") {
    // the id-range bucketing that makes partitioned index writes
    // O(touched) concentrates a nightly ingest in the TAIL bucket by
    // design — the hot partition is the normal case, not the anomaly.
    // Certificate: a 30k-doc delta landing entirely in one bucket (a)
    // salts its write across filesPerPartition tasks instead of
    // funnelling one writer, and (b) never buffers the bucket's row
    // stream in a single task. Coalescing is disabled in a child
    // session because AQE would re-merge THIS fixture's small salt
    // buckets (it wouldn't at a real bucket's size) — the
    // VersionedStoreSpec salt-test discipline.
    val ns = spark.newSession()
    ns.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    ns.conf.set("spark.sql.shuffle.partitions", "16")
    val dir = graft.core.Scratch.dir("skew_pidx")
    val bw = 100000L
    // prior: 1k docs in bucket 0; delta: 30k NEW docs, all bucket 1
    def docsOf(lo: Long, hi: Long) = ns.range(lo, hi).select(
      $"id".as("doc_id"),
      concat_ws(" ", lit("alpha"),
        concat(lit("t"), ($"id" % 97).cast("string")),
        concat(lit("u"), ($"id" % 31).cast("string"))).as("text"))
    def postings(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id".as("id"),
        explode(graft.ext.TextAnalysis.tokens($"text")).as("tok"))
      .groupBy($"id", $"tok").agg(count(lit(1)).as("tf"))
    graft.io.Versioned.writePartitionedFull(
      postings(docsOf(0, 1000)).withColumn("bucket",
        graft.pipeline.Incremental.idBucket($"id", bw)),
      dir, "sk_post", Seq("bucket"))
    graft.io.Versioned.write(docsOf(100000, 130000), dir, "sk_raw",
      "00000002_b")
    var rows = 0L
    val mx = maxTaskShuffleRead {
      rows = graft.pipeline.Incremental.bm25PartitionedCycle(ns, dir,
        "sk_post", "sk_raw", "doc_id", "text", qTerms = 3, k = 10,
        bucketWidth = bw, filesPerPartition = 4).count()
    }
    assert(rows == 10L, s"serve returned $rows rows")
    val tailFiles = Option(new java.io.File(
        graft.io.Versioned.partitionedRoot(dir, "sk_post"), "bucket=1")
        .listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .count(_.getName.endsWith(".parquet"))
    assert(tailFiles >= 2 && tailFiles <= 4,
      s"hot tail bucket wrote $tailFiles files — salt did not split it")
    // 90k posting rows land in bucket 1; salted 4 ways no task may read
    // anywhere near the whole bucket (the groupBy partial-combines, the
    // layout repartition spreads on (bucket, salt))
    assert(mx < 45000L,
      s"hot tail bucket funnelled one task: max shuffle read $mx")
  }
}
