package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression: the sliding-window minima of a long
  * array — the selection kernel of winnowing fingerprints (Schleimer
  * et al. 2003). `winnowing_mins(hs, w)` returns the min of every
  * length-`w` window of `hs`, adjacent duplicates collapsed (the
  * caller applies `array_distinct` for the full fingerprint SET —
  * adjacent collapse already removes the overwhelming share, since
  * consecutive windows usually keep the same minimum).
  *
  * Why an expression and not `transform(sequence(...), i ->
  * array_min(slice(hs, i, w)))`: that formulation allocates a fresh
  * w-element array per window and rescans it — O(n·w) time and O(n)
  * allocations PER DOCUMENT, measured 19.5 s for the sf0.1 corpus
  * against ~1 s for this kernel. The monotonic-deque walk is O(n) with
  * two fixed int/long scratch arrays per row.
  *
  * Empty result when the array is shorter than `w` (no full window).
  * `w < 1` throws (both eval paths — the function is registered at the
  * SQL surface, where the Scala caller's require() can't reach).
  * PRECONDITION: non-null elements (hash arrays by construction).
  */
case class WinnowingMins(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"winnowing_mins expects (array<bigint>, int), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowing_mins"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val w = r.asInstanceOf[Int]
    // SQL surface guard: a w < 1 window would let head pass tail and
    // read stale deque slots — garbage, not an error. Fail loudly.
    if (w < 1) throw new IllegalArgumentException(
      s"winnowing_mins: window must be >= 1, got $w")
    val n = a.numElements()
    val buf = new Array[Long](math.max(n, 1))
    val dqi = new Array[Int](math.max(n, 1))
    var head = 0; var tail = 0; var cnt = 0
    var last = 0L; var has = false
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(dqi(tail - 1)) >= v) tail -= 1
      dqi(tail) = i; tail += 1
      if (dqi(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = a.getLong(dqi(head))
        if (!has || m != last) { buf(cnt) = m; cnt += 1; last = m; has = true }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, wv) => {
      val n = ctx.freshName("n"); val w = ctx.freshName("w")
      val buf = ctx.freshName("buf"); val dqi = ctx.freshName("dqi")
      val head = ctx.freshName("head"); val tail = ctx.freshName("tail")
      val cnt = ctx.freshName("cnt"); val last = ctx.freshName("last")
      val has = ctx.freshName("has"); val i = ctx.freshName("i")
      val v = ctx.freshName("v"); val m = ctx.freshName("m")
      s"""
         |int $n = $a.numElements();
         |int $w = $wv;
         |if ($w < 1) throw new IllegalArgumentException(
         |  "winnowing_mins: window must be >= 1, got " + $w);
         |long[] $buf = new long[$n > 0 ? $n : 1];
         |int[] $dqi = new int[$n > 0 ? $n : 1];
         |int $head = 0; int $tail = 0; int $cnt = 0;
         |long $last = 0L; boolean $has = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  while ($tail > $head && $a.getLong($dqi[$tail - 1]) >= $v) $tail--;
         |  $dqi[$tail++] = $i;
         |  if ($dqi[$head] <= $i - $w) $head++;
         |  if ($i >= $w - 1) {
         |    long $m = $a.getLong($dqi[$head]);
         |    if (!$has || $m != $last) { $buf[$cnt++] = $m; $last = $m; $has = true; }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $cnt));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WinnowingMins {
  /** Column entry point via the function registry (see
    * [[CosineSim.cosineSim]]).
    */
  def winnowingMins(hs: Column, w: Column): Column =
    call_function("winnowing_mins", hs, w)
}
