package graft

import org.apache.spark.sql.functions._
import graft.functions.Percentiles

/** Rank-error contract of the percentile scale twin: on a million-row
  * log-skewed group (the giant-group regime the exact aggregation
  * cannot buffer), every sketched quantile's RANK in the exact sorted
  * data must sit within the advertised ±n/accuracy of its target.
  * Values are engine-deterministic (integer mix → log), so this spec
  * is replayable.
  */
class PercentilesSpec extends SparkTestBase {

  private val n = 1000000L
  private val accuracy = Percentiles.DefaultAccuracy

  // heavy right tail: exp over a pseudo-uniform integer mix — the
  // skewed-group shape (most mass tiny, a long expensive tail)
  private def skewed() = spark.range(0, n).select(
    exp((pmod(col("id") * 2654435761L + 12345L, lit(1000003L)).cast("double")
      / 1000003.0) * 9.0).as("v"))

  test("sketched quantiles stay within the rank-error bound on a 1e6-row skewed group") {
    val probs = Seq(0.5, 0.9, 0.99)
    val df = skewed()
    val got = df.agg(Percentiles.percentilesSketch(col("v"), probs, accuracy))
      .head().getSeq[Double](0)
    val exact = df.sort(col("v")).collect().map(_.getDouble(0))
    probs.zip(got).foreach { case (p, g) =>
      // rank of the sketched value in the exact sorted sample
      val rank = {
        val i = java.util.Arrays.binarySearch(exact, g)
        if (i >= 0) i.toLong else (-i - 1).toLong
      }
      val target = (p * n).toLong
      val tol = n / accuracy + 1 // ±eps·n, +1 for the boundary
      assert(math.abs(rank - target) <= tol,
        s"p=$p: sketched value $g has rank $rank, target $target, tol $tol")
    }
  }

  test("weighted sketch stays within 2*eps*W rank error on a skewed weighted 1e6 group") {
    import spark.implicits._
    val eps = 0.005
    // skewed values, heavy-tailed integer weights; 32 partitions force
    // real partial-aggregation merges through the sketch's merge path
    val df = spark.range(0, n).select(
        lit("g").as("grp"),
        pmod(col("id") * 2654435761L + 12345L, lit(99991L)).as("v"),
        (pmod(col("id") * 48271L, lit(1000L)) + 1L).as("w"))
      .repartition(32)
    val got = graft.ops.WeightedStats.weightedQuantilesSketch(df, "grp", "v", "w",
      Seq((1, 2, "med"), (9, 10, "p90")), eps).head()
    // exact per-value masses (the grouped table is small; the sketch is
    // for the regime where it is not)
    val exact = df.groupBy($"v").agg(sum($"w").as("w")).orderBy($"v")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val totW = exact.map(_._2).sum
    assert(got.getLong(1) === totW)
    Seq(("med", 1L, 2L, 2), ("p90", 9L, 10L, 3)).foreach { case (alias, num, den, i) =>
      val target = (totW * num + den - 1) / den
      val vr = got.getLong(i)
      var below = 0L; var le = 0L
      exact.foreach { case (v, w) =>
        if (v < vr) below += w
        if (v <= vr) le += w
      }
      val err =
        if (le >= target && below < target) 0L
        else math.min(math.abs(le - target), math.abs(below + 1 - target))
      val tol = (2 * eps * totW).toLong + 1
      assert(err <= tol, s"$alias: value $vr rank err $err > tol $tol")
    }
  }

  test("weighted sketch final state is O(1/eps) tuples (two-tier compress)") {
    // same build as the rank-error test, driven through the buffer API
    // so the tuple count is observable: 32 partial buffers, pairwise
    // merge tree, eval-time finalCompress. Single-tier absorption
    // saturated every certificate and stalled at 1996 tuples; the
    // two-tier scheme measured 190. Assert a generous O(1/eps) ceiling
    // (3/eps = 600) so a regression back to certificate saturation
    // (~10/eps) fails loudly, plus the error-bound invariant.
    val eps = 0.005
    val bufs = Array.fill(32)(new graft.functions.WgkBuffer(eps))
    var i = 0
    while (i < 1000000) {
      val v = (i.toLong * 2654435761L + 12345L) % 99991L
      val w = (i.toLong * 48271L) % 1000L + 1L
      bufs(i % 32).insert(v, w)
      i += 1
    }
    var layer = bufs
    while (layer.length > 1)
      layer = layer.grouped(2).map { g =>
        if (g.length == 2) g(0).mergeIn(g(1)); g(0)
      }.toArray
    val b = layer(0)
    b.finalCompress()
    assert(b.vs.length <= (3.0 / eps).toInt,
      s"final state ${b.vs.length} tuples — certificate saturation is back")
    val certMax = b.vs.indices.map(k => b.gs(k) + b.ds(k)).max
    assert(certMax <= (2.0 * eps * b.totalW).toLong,
      s"certificate $certMax exceeds 2*eps*W")
  }

  test("weighted sketch is exact when the group fits uncompressed") {
    import spark.implicits._
    val df = Seq(("A", 1L, 5L), ("A", 2L, 1L), ("A", 3L, 1L),
        ("B", 1L, 1L), ("B", 2L, 1L), ("B", 3L, 1L), ("B", 4L, 1L),
        ("B", 9L, 0L))
      .toDF("grp", "v", "w")
    val sk = graft.ops.WeightedStats.weightedQuantilesSketch(df, "grp", "v", "w",
        Seq((1, 2, "med"), (9, 10, "p90")))
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // identical to the exact operator's spec fixture (AnalyticsSpec)
    assert(sk === Seq(("A", 7L, 1L, 3L), ("B", 4L, 2L, 4L)))
  }

  test("sketch matches exact percentile closely on q03's real groups") {
    import spark.implicits._
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val both = li.groupBy($"l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.95D)").as("exact_p95"),
      Percentiles.percentileSketch($"l_extendedprice", 0.95).as("sketch_p95"),
      count(lit(1)).as("cnt"))
    both.collect().foreach { r =>
      val (e, s) = (r.getDouble(1), r.getDouble(2))
      // small groups: the sketch holds every value, so the only
      // difference is exact percentile's midpoint interpolation —
      // bounded by one observation's spacing; assert a loose relative
      // bound rather than equality
      assert(math.abs(e - s) / e < 0.01,
        s"returnflag ${r.getString(0)}: exact $e vs sketch $s")
    }
  }
}
