package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.types._

/** Mutable aggregation state: a Greenwald-Khanna quantile sketch over the
  * raw values plus the non-zero counter the all-zero guard needs.
  * Memory is O((1/eps) * log(eps * n)) — BOUNDED, unlike the exact
  * aggregator's whole-group buffer.
  */
final class LocScaleBBuffer(var qs: QuantileSummaries, var nNonZero: Long) {
  def insert(x: Double): Unit = {
    qs = qs.insert(x)
    if (x != 0.0) nNonZero += 1
  }
  def compress(): Unit = { qs = qs.compress() }
}

/** Sketch-based robust bounds — the scale path of
  * [[RobustBounds.locScaleB]] (reference `univOutl::LocScaleB`,
  * R/validation-functions.R:43-69). The exact aggregator buffers the
  * whole group (correct for the reference's tiny gear×taxon groups, an
  * executor-OOM hazard on a skewed group at 100 TB); this
  * TypedImperativeAggregate keeps a bounded Greenwald-Khanna summary
  * per group instead, with partial aggregation and sketch merges on the
  * shuffle — the ApproximatePercentile shape, specialized to the
  * median/MAD/log-bounds pipeline.
  *
  * Only the RAW values are sketched: `ln(x+1)` is monotone, so raw
  * quantiles map straight through to log-scale quantiles. The MAD (a
  * median over the DERIVED |y - Me| values, which a single-pass sketch
  * cannot index) is recovered from a fixed-resolution reconstruction of
  * the quantile function: `GridPoints` (2001) evenly-spaced quantiles approximate the
  * sorted sample to within the sketch's rank error, and median/MAD over
  * that grid converge to the exact statistics as eps shrinks.
  * Approximate by design — the exact aggregator remains the
  * oracle-checked default; a property spec bounds the drift.
  */
case class LocScaleBSketch(
    child: Expression,
    k: Double,
    relativeError: Double = 1.0e-4,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LocScaleBBuffer] with UnaryLike[Expression] {

  private val GridPoints = 2001

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"loc_scale_b_sketch expects double, got ${t.simpleString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("lower_log", DoubleType), StructField("upper", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "loc_scale_b_sketch"

  override def createAggregationBuffer(): LocScaleBBuffer =
    new LocScaleBBuffer(
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError),
      0L)

  override def update(buf: LocScaleBBuffer, input: InternalRow): LocScaleBBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buf.insert(d)
    }
    buf
  }

  override def merge(buf: LocScaleBBuffer, other: LocScaleBBuffer): LocScaleBBuffer = {
    buf.compress(); other.compress()
    buf.qs = buf.qs.merge(other.qs)
    buf.nNonZero += other.nNonZero
    buf
  }

  private def medianOf(xs: Array[Double]): Double = {
    java.util.Arrays.sort(xs)
    val n = xs.length
    if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
  }

  override def eval(buf: LocScaleBBuffer): Any = {
    buf.compress()
    val count = buf.qs.count
    if (count == 0 || buf.nNonZero == 0) return InternalRow(null, null)
    // fixed-resolution reconstruction of the quantile function in ONE
    // monotone walk over the sketch (per-point query() would rescan the
    // sampled array GridPoints times): cum(j) is the minimum rank of
    // sample j; quantile p resolves to the first sample covering rank
    // ceil(p * count), within the sketch's rank guarantee
    val sampled = buf.qs.sampled
    val cum = new Array[Long](sampled.length)
    var acc = 0L
    var j = 0
    while (j < sampled.length) { acc += sampled(j).g; cum(j) = acc; j += 1 }
    val grid = new Array[Double](GridPoints)
    var i = 0
    j = 0
    while (i < GridPoints) {
      val target = math.ceil(i.toDouble / (GridPoints - 1) * count).toLong
      while (j < sampled.length - 1 && cum(j) < target) j += 1
      grid(i) = sampled(j).value
      i += 1
    }
    val medRaw = grid(GridPoints / 2)
    val madRaw = 1.4826 * medianOf(grid.map(v => math.abs(v - medRaw)))
    if (madRaw <= 0.0) return InternalRow(null, null)
    val me = math.log(medRaw + 1.0)
    val s = 1.4826 * medianOf(grid.map(v => math.abs(math.log(v + 1.0) - me)))
    InternalRow(me - k * s, math.exp(me + k * s))
  }

  override def serialize(buf: LocScaleBBuffer): Array[Byte] = {
    buf.compress()
    val sampled = buf.qs.sampled
    val bb = ByteBuffer.allocate(8 + 8 + 4 + sampled.length * 24)
    bb.putLong(buf.nNonZero)
    bb.putLong(buf.qs.count)
    bb.putInt(sampled.length)
    sampled.foreach { s => bb.putDouble(s.value); bb.putLong(s.g); bb.putLong(s.delta) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LocScaleBBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val nNonZero = bb.getLong()
    val count = bb.getLong()
    val sampled = Array.fill(bb.getInt())(Stats(bb.getDouble(), bb.getLong(), bb.getLong()))
    new LocScaleBBuffer(
      new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, relativeError,
        sampled, count, compressed = true),
      nNonZero)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LocScaleBSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LocScaleBSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
