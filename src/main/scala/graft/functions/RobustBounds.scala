package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable.ArrayBuffer

/** Robust outlier bounds per group: the Spark-native re-expression of the
  * reference's `univOutl::LocScaleB(x, logt = TRUE, k)` call wrapped by
  * `alert_outlier` (reference `R/validation-functions.R:43-69`, used at
  * `:119`, `:262`, `:387`).
  *
  * Semantics (documented public LocScaleB formula, method = "MAD"):
  *   y  = ln(x + 1)                      (logt transform)
  *   Me = median(y)                      (R type-7 / linear interpolation)
  *   s  = 1.4826 * median(|y - Me|)      (MAD with R's default constant)
  *   bounds = (Me - k*s, Me + k*s)       on the log scale
  * and the caller exponentiates the upper bound back to the raw scale
  * (`exp(upper.up)`, reference `R/validation-functions.R:122-124`).
  *
  * Guards mirroring `alert_outlier` (`R/validation-functions.R:50-59`):
  * all inputs NA-or-zero, or raw-scale MAD <= 0 → null bounds.
  *
  * Scale note: this is an exact buffering aggregator because the
  * reference's groups (gear × taxon) are tiny, and exactness is what the
  * DuckDB oracle checks. Partial aggregation still applies (buffers
  * merge associatively), so the shuffle carries one buffer per group per
  * map partition. For high-cardinality or giant groups use
  * [[locScaleBSketch]] — a [[LocScaleBSketch TypedImperativeAggregate]]
  * over a bounded quantile sketch with the same output shape.
  */
object RobustBounds {
  case class Bounds(lower_log: Option[Double], upper: Option[Double])

  /** Exact R type-7 quantile at p=0.5 over a sorted array. */
  private def medianSorted(xs: Array[Double]): Double = {
    val n = xs.length
    if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
  }
  private def median(xs: ArrayBuffer[Double]): Double = {
    val a = xs.toArray
    java.util.Arrays.sort(a)
    medianSorted(a)
  }

  class LocScaleBAgg(k: Double)
      extends Aggregator[java.lang.Double, ArrayBuffer[Double], Bounds] {
    override def zero: ArrayBuffer[Double] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[Double], x: java.lang.Double): ArrayBuffer[Double] = {
      if (x != null && !x.isNaN) b += x.doubleValue()
      b
    }
    override def merge(a: ArrayBuffer[Double], b: ArrayBuffer[Double]): ArrayBuffer[Double] = a ++= b
    override def finish(buf: ArrayBuffer[Double]): Bounds = {
      if (buf.isEmpty || buf.forall(_ == 0.0)) return Bounds(None, None)
      val medRaw = median(buf)
      val madRaw = 1.4826 * median(buf.map(v => math.abs(v - medRaw)))
      if (madRaw <= 0.0) return Bounds(None, None)
      val y = buf.map(v => math.log(v + 1.0))
      val me = median(y)
      val s = 1.4826 * median(y.map(v => math.abs(v - me)))
      Bounds(Some(me - k * s), Some(math.exp(me + k * s)))
    }
    override def bufferEncoder: Encoder[ArrayBuffer[Double]] = Encoders.kryo[ArrayBuffer[Double]]
    override def outputEncoder: Encoder[Bounds] = Encoders.product[Bounds]
  }

  /** Column-level entry point: `locScaleB(3.0)(col("catch_kg"))` yields a
    * struct column `(lower_log, upper)`.
    */
  def locScaleB(k: Double): Column => Column = {
    val f = udaf(new LocScaleBAgg(k), Encoders.DOUBLE)
    c => f(c)
  }

  /** Bounded-memory variant — same `(lower_log, upper)` struct from a
    * quantile sketch ([[LocScaleBSketch]]); approximate, executor-safe
    * on groups of any size. Requires a graft session (or
    * [[GraftFunctions.ensureRegistered]]).
    */
  def locScaleBSketch(k: Double): Column => Column =
    c => org.apache.spark.sql.functions.call_function(
      "loc_scale_b_sketch", c.cast("double"), org.apache.spark.sql.functions.lit(k))
}
