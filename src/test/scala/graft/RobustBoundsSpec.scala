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
}
