package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: engine-portable polynomial string hash
  *
  *   h = fold over codepoints of (h * 31 + cp) mod 1e9+7
  *
  * The point is NOT hash quality (xxhash64 is better) but that the same
  * value is computable in any engine that can iterate characters — e.g.
  * DuckDB via `list_reduce(list_transform(generate_series(1, length(s)),
  * i -> ascii(substring(s, i, 1))), ...)`. Swapping this in for xxhash64
  * as the base hash of MinHash / SimHash makes those probabilistic
  * operators oracle-checkable end-to-end instead of rows-only.
  *
  * Iteration is by Unicode codepoint (not UTF-16 unit, not byte), which
  * is what SQL engines' `substring`/`ascii` see. Output range
  * [0, 1e9+7) — always non-negative, products with multipliers below
  * ~4.5e9 stay inside the signed-64 range.
  *
  * Codegen emits the loop inline (one String materialization per row,
  * no boxing); the interpreted path matches it exactly.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  private[functions] def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /** Column entry point; resolves through the function registry (see
    * [[CosineSim.cosineSim]] for why).
    */
  def polyHash(c: Column): Column = call_function("poly_hash", c)
}
