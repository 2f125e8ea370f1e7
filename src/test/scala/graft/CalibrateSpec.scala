package graft

import org.apache.spark.sql.functions._
import graft.ext.Calibrate

/** Isotonic fit: monotone by construction, equals the pool-adjacent
  * fold on a hand-walked violator sequence, and reproduces already-
  * monotone rates exactly. Brier decomposition: Murphy identity
  * REL − RES + UNC = Brier to micro rounding.
  */
class CalibrateSpec extends SparkTestBase {

  private def scored(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("p_micro", "y")
  }

  test("isotonic fit is monotone and pools the hand-walked violators") {
    // bins 0,1,2 with rates 0.8, 0.2, 0.5 → PAVA pools all three
    // (avg 0.5 violates 0.8-first), giving [0.5, 0.5, 0.5]:
    // max-min minimax: bin0 fit = min over j of avg(0..j) = 0.5
    val rows =
      Seq.fill(8)((50000L, 1L)) ++ Seq.fill(2)((50000L, 0L)) ++   // bin 0: 0.8
      Seq.fill(2)((150000L, 1L)) ++ Seq.fill(8)((150000L, 0L)) ++ // bin 1: 0.2
      Seq.fill(5)((250000L, 1L)) ++ Seq.fill(5)((250000L, 0L))    // bin 2: 0.5
    val out = Calibrate.isotonicBins(scored(rows), "p_micro", "y")
      .orderBy(col("bin")).collect()
    assert(out.map(_.getAs[Long]("iso_rate_micro")).toSeq ==
      Seq(500000L, 500000L, 500000L))
    val fits = out.map(_.getAs[Long]("iso_rate_micro"))
    assert(fits.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("already-monotone rates pass through unchanged") {
    val rows =
      Seq.fill(1)((50000L, 0L)) ++ Seq.fill(9)((50000L, 0L)) ++    // 0.0
      Seq.fill(4)((150000L, 1L)) ++ Seq.fill(6)((150000L, 0L)) ++  // 0.4
      Seq.fill(9)((250000L, 1L)) ++ Seq.fill(1)((250000L, 0L))     // 0.9
    val out = Calibrate.isotonicBins(scored(rows), "p_micro", "y")
      .orderBy(col("bin")).collect()
    assert(out.map(_.getAs[Long]("iso_rate_micro")).toSeq ==
      Seq(0L, 400000L, 900000L))
    assert(out.map(_.getAs[Long]("emp_rate_micro")).toSeq ==
      out.map(_.getAs[Long]("iso_rate_micro")).toSeq)
  }

  test("Murphy identity: brier = rel - res + unc to micro rounding") {
    import spark.implicits._
    val df = graft.core.Tables.embeddings(spark, sfDir).select(
      least(greatest(
        round((col("embedding").getItem(0) + 1.0) / 2.0 * 1000000.0, 0)
          .cast("long"), lit(0L)), lit(1000000L)).as("p_micro"),
      ($"label" % 2).cast("long").as("y"))
    val r = Calibrate.brierDecomposition(df, "p_micro", "y").collect()(0)
    val brier = r.getAs[Long]("brier_micro")
    val rhs = r.getAs[Long]("rel_micro") - r.getAs[Long]("res_micro") +
      r.getAs[Long]("unc_micro")
    assert(math.abs(brier - rhs) <= 5L, s"identity broke: $brier vs $rhs")
  }
}
