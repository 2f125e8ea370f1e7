package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined-chunking cut points of a
  * string — `cdc_cutpoints(text, w, mask)` returns the 1-based chunk
  * START positions (codepoints): a leading 1, plus `b + w` for every
  * window start `b` whose `w`-codepoint [[PolyHash]] window hits
  * `0 mod mask` (capped at the string length, so no empty tail chunk).
  *
  * Why an expression and not `filter(sequence(...), b ->
  * poly_hash(substr(text, b, w)) % mask = 0)`: that formulation
  * re-materializes a w-char substring AND re-folds its hash per
  * position — O(n·w) time and O(n) string allocations per document
  * (measured 5.8 s for q277 over the sf0.1 corpus). Here the window
  * hash ROLLS: one precomputed `31^(w-1) mod P`, one subtract-shift-add
  * per position — O(n) with a single codepoint-array scratch per row.
  * The rolled value is bit-identical to the per-window fold (the same
  * modular arithmetic, associativity-free), so the DuckDB oracle keeps
  * replaying the naive per-window formula.
  *
  * PRECONDITION: `w >= 1`, `mask >= 1` (checked in both eval paths —
  * the function is registered at the SQL surface).
  */
case class CdcCutpoints(first: Expression, second: Expression,
                        third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"cdc_cutpoints expects (string, int, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cutpoints"

  override def nullSafeEval(t: Any, wv: Any, mv: Any): Any = {
    val s = t.asInstanceOf[UTF8String].toString
    val w = wv.asInstanceOf[Int]
    val mask = mv.asInstanceOf[Int]
    if (w < 1 || mask < 1) throw new IllegalArgumentException(
      s"cdc_cutpoints: w and mask must be >= 1, got ($w, $mask)")
    val cps = new Array[Int](s.length)
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i); cps(n) = cp; n += 1
      i += Character.charCount(cp)
    }
    val starts = new Array[Int](n + 1)
    var cnt = 0
    starts(cnt) = 1; cnt += 1
    if (n >= w) {
      val P = 1000000007L
      var pow = 1L
      var j = 0
      while (j < w - 1) { pow = pow * 31L % P; j += 1 }
      var h = 0L
      j = 0
      while (j < w) { h = (h * 31L + cps(j)) % P; j += 1 }
      var b = 0
      while (b <= n - w) {
        if (h % mask == 0) {
          val st = b + 1 + w
          if (st <= n) { starts(cnt) = st; cnt += 1 }
        }
        if (b < n - w) {
          h = (((h - cps(b) * pow % P) % P + P) % P * 31L + cps(b + w)) % P
        }
        b += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(starts, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, wv, mv) => {
      val s = ctx.freshName("s"); val cps = ctx.freshName("cps")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val cp = ctx.freshName("cp"); val starts = ctx.freshName("starts")
      val cnt = ctx.freshName("cnt"); val pow = ctx.freshName("pow")
      val h = ctx.freshName("h"); val j = ctx.freshName("j")
      val b = ctx.freshName("b"); val st = ctx.freshName("st")
      val w = ctx.freshName("w"); val mask = ctx.freshName("mask")
      s"""
         |java.lang.String $s = $t.toString();
         |int $w = $wv; int $mask = $mv;
         |if ($w < 1 || $mask < 1) throw new IllegalArgumentException(
         |  "cdc_cutpoints: w and mask must be >= 1, got (" + $w + ", " + $mask + ")");
         |int[] $cps = new int[$s.length()];
         |int $n = 0;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i); $cps[$n++] = $cp;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |int[] $starts = new int[$n + 1];
         |int $cnt = 0;
         |$starts[$cnt++] = 1;
         |if ($n >= $w) {
         |  long $pow = 1L;
         |  for (int $j = 0; $j < $w - 1; $j++) $pow = $pow * 31L % 1000000007L;
         |  long $h = 0L;
         |  for (int $j = 0; $j < $w; $j++) $h = ($h * 31L + $cps[$j]) % 1000000007L;
         |  for (int $b = 0; $b <= $n - $w; $b++) {
         |    if ($h % $mask == 0) {
         |      int $st = $b + 1 + $w;
         |      if ($st <= $n) $starts[$cnt++] = $st;
         |    }
         |    if ($b < $n - $w) {
         |      $h = ((($h - $cps[$b] * $pow % 1000000007L) % 1000000007L + 1000000007L)
         |        % 1000000007L * 31L + $cps[$b + $w]) % 1000000007L;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($starts, $cnt));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CdcCutpoints {
  def cdcCutpoints(text: Column, w: Column, mask: Column): Column =
    call_function("cdc_cutpoints", text, w, mask)
}
