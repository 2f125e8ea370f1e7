package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity between two
  * array<float> embeddings, accumulated in double precision.
  *
  * This is the codegen upgrade of the higher-order-function formulation
  * (`aggregate(zip_with(...))`): one fused primitive loop per row, no
  * boxing, no per-element lambda dispatch — the hot inner kernel of the
  * similarity-search operators. Whole-stage codegen emits the loop
  * inline via [[doGenCode]]; the interpreted path ([[nullSafeEval]])
  * matches it bit-for-bit (same accumulation order), so swapping it into
  * an oracle-checked query changes nothing observable.
  *
  * Division by a zero norm follows IEEE (yields NaN/Infinity), matching
  * the HOF formulation.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType (and thus ExpectsInputTypes) is private[sql] in
  // Spark 4, so input checking is hand-rolled.
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-level entry point. Spark 4 keeps Column↔Expression bridging
    * private[sql], so the expression reaches the plan through the
    * function registry: sessions built via [[graft.core.Sessions]] (or
    * any session with `withExtensions(new GraftExtensions)`) have
    * `cosine_sim` registered, and `call_function` resolves it at
    * analysis time.
    */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
}
