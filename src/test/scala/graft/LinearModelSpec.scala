package graft

import org.apache.spark.sql.functions._
import graft.ext.LinearModel

class LinearModelSpec extends SparkTestBase {

  test("separable data: GD reaches perfect training accuracy") {
    import spark.implicits._
    // y = sign(x): cleanly separable through the origin
    val df = ((-50 to 50).filter(_ != 0).map { v =>
      (v.toLong * 1000000L / 10, v > 0)
    }).toDF("x_micro", "y")
    val out = LinearModel.logisticGd(df, Seq(col("x_micro")), col("y"),
      epochs = 4).orderBy(col("epoch")).collect()
    assert(out.length == 4)
    assert(out.last.getAs[Long]("acc_milli") == 1000L)
    // the slope must be positive (aligned with the separating direction)
    assert(out.last.getAs[Long]("w1") > 0L)
  }

  test("balanced labels with uninformative features keep weights near zero") {
    import spark.implicits._
    // same feature value for both labels → gradient on w1 cancels;
    // bias settles toward the (here zero) log-odds
    val df = (1 to 40).map(i => (500000L, i % 2 == 0)).toDF("x_micro", "y")
    val out = LinearModel.logisticGd(df, Seq(col("x_micro")), col("y"),
      epochs = 3).orderBy(col("epoch")).collect()
    val last = out.last
    // perfectly balanced: every epoch's residuals sum to 0 exactly
    assert(math.abs(last.getAs[Long]("w0")) <= 1000L)
    assert(math.abs(last.getAs[Long]("w1")) <= 1000L)
  }
}
