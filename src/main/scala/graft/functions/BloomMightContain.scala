package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Native Catalyst expression: probe a SERIALIZED bloom filter column
  * with a pre-hashed long key — `might_contain` for PER-ROW filters.
  *
  * Spark's own `BloomFilterMightContain` exists for exactly this test
  * but its analysis rule requires the filter side to be a foldable
  * literal or scalar subquery (it was built for runtime join pruning,
  * where ONE filter probes many rows). The sidecar planning walk is the
  * transpose — MANY filters (one per data file) probed by one key — so
  * the filter side here is a regular binary column and the membership
  * test runs WHERE THE ROWS ARE: executors deserialize their own
  * sidecar rows and only matching file names travel to the driver
  * (O(candidates)·name bytes, never O(files)·numBits/8 — the
  * driver-OOM hazard of a collect-then-probe walk at 10⁵⁺ files).
  *
  * The hash argument must be the same `xxhash64(key)` the build side
  * ([[graft.io.FileStats.collectBloom]]) inserted. Interpreted eval
  * only (CodegenFallback): the expression runs once per sidecar row —
  * per FILE, not per data row — so the deserialization, not dispatch,
  * dominates and codegen would buy nothing.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain expects (binary, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(bloomBytes: Any, hash: Any): Any =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes.asInstanceOf[Array[Byte]]))
      .mightContainLong(hash.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
