package graft

import org.apache.spark.sql.functions._
import graft.functions.RobustBounds

/** LocScaleB aggregator vs an independent in-memory reference
  * implementation (SURVEY.md §5.2 property tests), including the
  * reference's guards: all-NA/zero → null, zero MAD → null.
  */
class RobustBoundsSpec extends SparkTestBase {
  import spark.implicits._

  private def refMedian(xs: Seq[Double]): Double = {
    val a = xs.sorted
    val n = a.length
    if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2.0
  }

  /** Independent reference: median ± k·1.4826·MAD on ln(x+1), upper exp'd. */
  private def refBounds(xs: Seq[Double], k: Double): Option[(Double, Double)] = {
    if (xs.isEmpty || xs.forall(_ == 0.0)) return None
    val medRaw = refMedian(xs)
    if (1.4826 * refMedian(xs.map(v => math.abs(v - medRaw))) <= 0) return None
    val y = xs.map(v => math.log(v + 1))
    val me = refMedian(y)
    val s = 1.4826 * refMedian(y.map(v => math.abs(v - me)))
    Some((me - k * s, math.exp(me + k * s)))
  }

  private def run(xs: Seq[Double], k: Double = 3.0): (Option[Double], Option[Double]) = {
    val f = RobustBounds.locScaleB(k)
    val row = xs.toDF("x").agg(f($"x").as("b")).select($"b.lower_log", $"b.upper").head()
    (Option(row.get(0)).map(_.asInstanceOf[Double]),
      Option(row.get(1)).map(_.asInstanceOf[Double]))
  }

  test("all-zero input yields null bounds (reference guard)") {
    assert(run(Seq(0.0, 0.0, 0.0)) === ((None, None)))
  }

  test("zero-MAD (constant) input yields null bounds") {
    assert(run(Seq(5.0, 5.0, 5.0, 5.0)) === ((None, None)))
  }

  test("matches the reference implementation on a known vector") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 100.0)
    val (lo, up) = run(xs)
    val Some((rl, ru)) = refBounds(xs, 3.0)
    assert(math.abs(lo.get - rl) < 1e-12 && math.abs(up.get - ru) < 1e-12)
  }

  test("property: aggregator == reference on random positive vectors") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val xs = Seq.fill(1 + rnd.nextInt(40))(rnd.nextDouble() * 1000.0)
      val got = run(xs)
      refBounds(xs, 3.0) match {
        case None => assert(got === ((None, None)))
        case Some((rl, ru)) =>
          assert(math.abs(got._1.get - rl) < 1e-9 && math.abs(got._2.get - ru) < 1e-9)
      }
    }
  }

  test("sketch variant tracks the exact aggregator on a 10^6-element group") {
    // deterministic heavy-tailed positives: exp(3 + 1.2 * z_i) with an
    // LCG-driven approximate normal (sum of 4 uniforms, centered)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val big = spark.range(1000000).selectExpr(
      "'g' AS grp",
      """exp(3.0 + 1.2 * ((pmod(id * 1103515245 + 12345, 100000) / 100000.0
        |  + pmod(id * 69069 + 1, 100000) / 100000.0
        |  + pmod(id * 214013 + 2531011, 100000) / 100000.0
        |  + pmod(id * 134775813 + 1, 100000) / 100000.0) - 2.0) * 1.732) AS x""".stripMargin)
    val exact = big.groupBy($"grp").agg(RobustBounds.locScaleB(3.0)($"x").as("b"))
      .select($"b.lower_log", $"b.upper").head()
    val sketch = big.groupBy($"grp").agg(RobustBounds.locScaleBSketch(3.0)($"x").as("b"))
      .select($"b.lower_log", $"b.upper").head()
    val (el, eu) = (exact.getDouble(0), exact.getDouble(1))
    val (sl, su) = (sketch.getDouble(0), sketch.getDouble(1))
    // both bounds live on the log scale (upper is exp'd) — compare
    // there: rank error 1e-4 + grid resolution 5e-4 on a smooth
    // distribution keeps log-scale drift well under 0.02 (≈2%
    // multiplicative on the raw scale)
    assert(math.abs(sl - el) < 0.02, s"lower_log: sketch $sl vs exact $el")
    assert(math.abs(math.log(su) - math.log(eu)) < 0.02, s"upper: sketch $su vs exact $eu")
  }

  test("sketch variant honors the all-zero and zero-MAD guards") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def runSketch(xs: Seq[Double]): (Option[Double], Option[Double]) = {
      val row = xs.toDF("x").agg(RobustBounds.locScaleBSketch(3.0)($"x").as("b"))
        .select($"b.lower_log", $"b.upper").head()
      (Option(row.get(0)).map(_.asInstanceOf[Double]),
        Option(row.get(1)).map(_.asInstanceOf[Double]))
    }
    assert(runSketch(Seq(0.0, 0.0, 0.0)) === ((None, None)))
    assert(runSketch(Seq(5.0, 5.0, 5.0, 5.0)) === ((None, None)))
    // and on a small clean vector it agrees with exact to sketch precision
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 100.0)
    val (lo, up) = runSketch(xs)
    val Some((rl, ru)) = refBounds(xs, 3.0)
    assert(math.abs(lo.get - rl) < 1e-6 && math.abs(up.get - ru) < 1e-6)
  }
}
