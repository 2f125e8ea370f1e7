package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen Jaro-Winkler similarity — the name-matching
  * complement to `levenshtein` (the reference standardizes fisher /
  * site names by edit-distance ratio; JW is the standard alternative
  * that privileges shared prefixes, cf.
  * /root/reference/R/validation-functions.R:329-377's string-matching
  * pass).
  *
  * Semantics pinned to the DuckDB reference implementation so the
  * oracle can call `jaro_winkler_similarity` directly (verified
  * empirically, JaroWinklerSpec): either side empty → 0.0; match
  * window `max(|a|,|b|)/2 - 1`; Winkler boost `j + l·0.1·(1−j)` with
  * prefix cap l ≤ 4 applied only when jaro > 0.7 (strict).
  *
  * Iterates Unicode code points (what SQL `substring`/`length` see),
  * same contract as [[PolyHash]]. Codegen emits a static call — the
  * work is a loop over two short strings; inlining it as Java source
  * would bloat the codegen unit for zero gain.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.jw($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static entry shared by interpreted eval and generated code. */
  def jw(sa: String, sb: String): Double = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of relative order, halved
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(la, lb)) && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Column entry point; resolves through the function registry. */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("jaro_winkler", a, b)
}
