package graft

import org.apache.spark.sql.functions._

/** Round-9 statistical operators: hand-walkable goldens for Spearman,
  * Kendall τ-b, segmented Holt smoothing, classical decomposition, and
  * the top-k state monoid law.
  */
class StatOps2Spec extends SparkTestBase {
  import spark.implicits._

  test("spearman: perfect monotone = ±1e6; constant axis = null") {
    val up = (1 to 20).map(i => ("g", i.toLong, (i * 7 + 3).toLong))
      .toDF("grp", "x", "y")
    val r1 = graft.ops.Eval.spearmanByGroup(up, "grp", "x", "y").collect()
    assert(r1.head.getAs[Long]("rho_micro") == 1000000L)
    val down = (1 to 20).map(i => ("g", i.toLong, (100 - i).toLong))
      .toDF("grp", "x", "y")
    val r2 = graft.ops.Eval.spearmanByGroup(down, "grp", "x", "y").collect()
    assert(r2.head.getAs[Long]("rho_micro") == -1000000L)
    val flat = (1 to 20).map(i => ("g", i.toLong, 5L)).toDF("grp", "x", "y")
    val r3 = graft.ops.Eval.spearmanByGroup(flat, "grp", "x", "y").collect()
    assert(r3.head.isNullAt(r3.head.fieldIndex("rho_micro")))
  }

  test("spearman ties: midranks match the closed form on a hand fixture") {
    // x: 1,2,2,3  y: 10,20,20,40 — same tie structure on both axes,
    // same ordering → rho = 1 exactly under midranks
    val df = Seq(("g", 1L, 10L, 1L), ("g", 2L, 20L, 2L),
      ("g", 2L, 20L, 3L), ("g", 3L, 40L, 4L)).toDF("grp", "x", "y", "tb")
    val r = graft.ops.Eval.spearmanByGroup(df, "grp", "x", "y").collect()
    assert(r.head.getAs[Long]("rho_micro") == 1000000L, r.toSeq)
  }

  test("kendall tau-b: monotone = 1e6, reversed = -1e6, hand C-D") {
    val up = (1 to 10).map(i => ("g", i.toLong, (i * 2).toLong))
      .toDF("grp", "x", "y")
    val r1 = graft.ops.Eval.kendallTauB(up, "grp", "x", "y", "x").collect()
    assert(r1.head.getAs[Long]("tau_micro") == 1000000L)
    assert(r1.head.getAs[Long]("cd") == 45L) // C(10,2) all concordant
    val down = (1 to 10).map(i => ("g", i.toLong, (100 - i).toLong))
      .toDF("grp", "x", "y")
    val r2 = graft.ops.Eval.kendallTauB(down, "grp", "x", "y", "x").collect()
    assert(r2.head.getAs[Long]("tau_micro") == -1000000L)
    // one discordant swap: y = 1,3,2,4 → C=5, D=1, cd=4, tau = 4/6
    val m = Seq(("g", 1L, 1L), ("g", 2L, 3L), ("g", 3L, 2L), ("g", 4L, 4L))
      .toDF("grp", "x", "y")
    val r3 = graft.ops.Eval.kendallTauB(m, "grp", "x", "y", "x").collect()
    assert(r3.head.getAs[Long]("cd") == 4L)
    assert(r3.head.getAs[Long]("tau_micro") == 666667L)
  }

  test("holt segmented: constant series fixes level, zeroes trend") {
    val c = (1 to 17).map(i => ("k", i.toLong, i.toLong, 5000L))
      .toDF("key", "sec", "ord", "v")
    val r = graft.ops.TimeSeries.holtSegmentedFixedPoint(c, "key",
      Seq("sec", "ord"), "v", na = 1L, da = 4L, nb = 1L, db = 4L,
      chunk = 4).collect()
    assert(r.head.getAs[Long]("level_end") == 5000L, r.toSeq)
    assert(r.head.getAs[Long]("trend_end") == 0L)
  }

  test("holt segmented tracks a linear ramp's slope") {
    // y = 1000·t: after enough steps the trend approaches 1000/step
    val ramp = (1 to 41).map(i => ("k", i.toLong, i.toLong, i * 1000L))
      .toDF("key", "sec", "ord", "v")
    val r = graft.ops.TimeSeries.holtSegmentedFixedPoint(ramp, "key",
      Seq("sec", "ord"), "v", na = 1L, da = 4L, nb = 1L, db = 4L,
      chunk = 4).collect()
    val level = r.head.getAs[Long]("level_end")
    val trend = r.head.getAs[Long]("trend_end")
    // level lags the last value (41000) but sits within a few steps of
    // it; trend near the true slope 1000 (chunked truncation ≤ den/num
    // per chunk keeps it within ~15%)
    assert(math.abs(trend - 1000L) < 150L, s"trend=$trend")
    assert(level > 35000L && level <= 41000L, s"level=$level")
  }

  test("classical decomposition recovers a pure trend+seasonal signal") {
    // y = 100 + s[t%4] with Σs = 0, period 4: interior trend = 100,
    // seasonal index = s (uncentered mean-of-detrended = s exactly),
    // remainder = 0
    val s4 = Array(3L, -1L, -2L, 0L)
    val rows = (0 until 24).map(t => ("k", t.toLong, 100L + s4(t % 4)))
    val df = rows.toDF("key", "t", "y")
    val out = graft.ops.TimeSeries.classicalDecompose(df, "key", "t", "y",
      period = 4).collect()
    val interior = out.filter(!_.isNullAt(3))
    assert(interior.nonEmpty)
    interior.foreach { r =>
      assert(r.getAs[Long]("trend_milli") == 100000L, r)
      assert(r.getAs[Long]("seasonal_milli") == s4((r.getAs[Long]("t") % 4).toInt) * 1000L, r)
      assert(r.getAs[Long]("remainder_milli") == 0L, r)
    }
  }

  test("top-k state monoid law: merge of 3-way split ≡ top-k of the whole") {
    val rows = (1 to 300).map(i =>
      ((i % 7).toString, ((i * 37) % 101).toLong, i.toLong))
    val df = rows.toDF("g", "v", "id")
    val whole = graft.ops.IncrementalAgg.topKState(df, Seq("g"), "v", "id", 5)
      .collect().map(r => (r.getString(0), r.getAs[Long]("rnk"),
        r.getAs[Long]("id"))).toSet
    val parts = (0 until 3).map(p =>
      graft.ops.IncrementalAgg.topKState(
        df.filter($"id" % 3 === p), Seq("g"), "v", "id", 5))
    val merged = graft.ops.IncrementalAgg.mergeTopKStates(
      Seq("g"), "v", "id", 5, parts: _*)
      .collect().map(r => (r.getString(0), r.getAs[Long]("rnk"),
        r.getAs[Long]("id"))).toSet
    assert(merged == whole)
  }
}
