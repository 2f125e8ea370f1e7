package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: probe a SERIALIZED bloom filter column
  * with a BATCH of pre-hashed long keys — true iff ANY key may be
  * present.
  *
  * The batched-lookup planning primitive ("fetch these N documents by
  * id"): one pass over the sidecar answers the whole batch, where N
  * separate [[BloomMightContain]] probes would deserialize every
  * filter N times and collect N candidate lists. The filter
  * deserializes ONCE per sidecar row and the keys short-circuit on the
  * first hit, so the row cost is O(filterBytes + hits·k) — and the
  * key batch is a plan literal, so it must stay bounded (the callers
  * enforce a cap); an UNBOUNDED key set is a join, not a probe.
  *
  * Same executor-side evaluation contract as [[BloomMightContain]]:
  * only matching file names travel to the driver.
  */
case class BloomMightContainAny(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain_any expects (binary, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain_any"

  override def nullSafeEval(bloomBytes: Any, hashes: Any): Any = {
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes.asInstanceOf[Array[Byte]]))
    val arr = hashes.asInstanceOf[ArrayData]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && bf.mightContainLong(arr.getLong(i)))
        return true
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainAny =
    copy(left = newLeft, right = newRight)
}
