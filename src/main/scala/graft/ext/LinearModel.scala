package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine linear-model training: full-batch logistic-regression
  * gradient descent with fixed-point (micro-int) weights, every epoch
  * unrolled into the one lazy plan. The seed-classifier story next to
  * the NB screens ([[LangModel]], q244): when the curation gate needs a
  * calibrated linear score instead of count ratios, this trains it
  * inside the engine — no model server, no collect.
  *
  * Scale shape: one partial-aggregated scan per epoch computes the
  * exact integer gradient (model = k+1 scalars, broadcast back); the
  * feature matrix never materializes and nothing iterates on the
  * driver. Fixed-point discipline: features and weights are micro
  * ints; the sigmoid is the one shared-shape transcendental, rounded
  * to micro per row before the integer gradient sum, so DuckDB replays
  * every epoch bit-for-bit.
  */
object LinearModel {

  /** `epochs` rounds of full-batch GD on ln-loss. `features` are
    * micro-int columns (no bias — it's added); `label` is boolean.
    * Output: one row per epoch with the post-update weights and that
    * model's training accuracy (milli).
    */
  def logisticGd(df: DataFrame, features: Seq[Column], label: Column,
                 epochs: Int = 3, eta: Double = 1.0): DataFrame = {
    require(epochs >= 1 && epochs <= 8, "unrolled epochs out of range")
    val k = features.size
    val feats = df.select(
      (features.zipWithIndex.map { case (f, i) => f.as(s"x$i") } :+
        when(label, 1L).otherwise(0L).as("y")): _*)

    // score under weight row w (cross-joined single row): micro ints.
    // products are micro×micro ≤ ~1e12 — exact in the double divide
    def scoreMicro(cols: Seq[String]): Column = {
      val dot = (0 until k).map(i => col(cols(i + 1)).cast("double") *
        col(s"x$i").cast("double")).reduceOption(_ + _).getOrElse(lit(0.0))
      col(cols.head) + round(dot / 1000000.0, 0).cast("long")
    }
    def pMicro(s: Column): Column =
      round(lit(1000000.0) / (lit(1.0) + exp(-s.cast("double") / 1000000.0)), 0)
        .cast("long")

    val wNames = (0 to k).map(i => s"w$i")
    val zero = feats.sparkSession.range(1).select(
      (0 to k).map(i => lit(0L).as(s"w$i")): _*)

    val (rows, _) = (1 to epochs).foldLeft(
        (Vector.empty[DataFrame], zero)) { case ((acc, w), epoch) =>
      val joined = feats.crossJoin(broadcast(w))
        .withColumn("p", pMicro(scoreMicro(wNames)))
        .withColumn("r", col("y") * 1000000L - col("p"))
      val gradTail = (0 until k).map(i =>
        sum(col("r") * col(s"x$i")).as(s"g${i + 1}")) :+ count(lit(1)).as("n")
      val grad = joined.agg(sum(col("r")).as("g0"), gradTail: _*)
      val wNext = w.crossJoin(broadcast(grad)).select(
        ((col("w0") + round(lit(eta) * col("g0").cast("double")
            / col("n").cast("double"), 0).cast("long")).as("w0") +:
          (1 to k).map(i =>
            (col(s"w$i") + round(lit(eta) * col(s"g$i").cast("double")
              / (col("n").cast("double") * 1000000.0), 0).cast("long"))
              .as(s"w$i"))): _*)
      val accRow = feats.crossJoin(broadcast(wNext))
        .withColumn("pred", scoreMicro(wNames) >= 0L)
        .groupBy((0 to k).map(i => col(s"w$i")): _*)
        .agg(round(sum(when(col("pred") === (col("y") === 1L), 1L).otherwise(0L))
            .cast("double") * 1000.0 / count(lit(1)).cast("double"), 0)
          .cast("long").as("acc_milli"))
        .select((lit(epoch.toLong).as("epoch") +:
          (0 to k).map(i => col(s"w$i")) :+ col("acc_milli")): _*)
      (acc :+ accRow, wNext)
    }
    rows.reduce(_ unionByName _)
  }
}
