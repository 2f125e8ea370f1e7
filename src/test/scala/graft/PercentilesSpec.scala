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
