package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, WinnowingMins}

/** Golden tests for the winnowing_mins codegen kernel: hand-computed
  * sliding minima, equivalence with the naive slice formulation, and
  * the short-array / adjacent-dedupe edges.
  */
class WinnowingMinsSpec extends SparkTestBase {
  import spark.implicits._

  private def mins(xs: Seq[Long], w: Int): Seq[Long] = {
    GraftFunctions.ensureRegistered(spark)
    Seq(Tuple1(xs)).toDF("hs")
      .select(WinnowingMins.winnowingMins($"hs", lit(w)).as("m"))
      .as[Seq[Long]].head()
  }

  test("hand-computed window minima with adjacent dedupe") {
    // windows of 3 over [5,2,7,2,9,1]: mins 2,2,2,1 → adjacent-deduped 2,1
    assert(mins(Seq(5L, 2L, 7L, 2L, 9L, 1L), 3) === Seq(2L, 1L))
    // strictly increasing: every window min is its left edge
    assert(mins(Seq(1L, 2L, 3L, 4L), 2) === Seq(1L, 2L, 3L))
    // w=1: the array itself, adjacent runs collapsed
    assert(mins(Seq(7L, 7L, 3L, 3L, 7L), 1) === Seq(7L, 3L, 7L))
  }

  test("shorter than w yields no fingerprints; equal to w yields the global min") {
    assert(mins(Seq(4L, 9L), 3) === Seq.empty)
    assert(mins(Seq(4L, 9L, 2L), 3) === Seq(2L))
  }

  test("w < 1 errors instead of returning garbage (SQL-surface guard)") {
    val e = intercept[Exception] { mins(Seq(1L, 2L, 3L), 0) }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("window must be >= 1")), s"wrong error: $e")
  }

  test("matches the naive slice formulation on random-ish arrays") {
    GraftFunctions.ensureRegistered(spark)
    val xs = (1 to 200).map(i => (i * 48271L) % 1009L)
    val df = Seq(Tuple1(xs)).toDF("hs")
    for (w <- Seq(2, 4, 16)) {
      val naive = df.select(array_distinct(
          transform(sequence(lit(1), size($"hs") - w + 1),
            i => array_min(slice($"hs", i, lit(w))))).as("m"))
        .as[Seq[Long]].head()
      val fast = df.select(array_distinct(
          WinnowingMins.winnowingMins($"hs", lit(w))).as("m"))
        .as[Seq[Long]].head()
      assert(fast.sorted === naive.sorted, s"w=$w kernel drifts from naive")
    }
  }
}
