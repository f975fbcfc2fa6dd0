package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused dot product over two double arrays — a native Catalyst expression
  * with whole-stage codegen (SURVEY.md §7.3: custom `Expression` where the
  * built-in composition is measurably hot).
  *
  * The built-in spelling `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, ...)`
  * allocates an intermediate array and a lambda frame per row; in the ANN
  * pair loops (O(n²) rows) that allocation dominates. This expression
  * generates a tight primitive loop instead. Summation order is identical
  * (ascending index, sequential adds), so results are bit-equal to the
  * built-in composition and to the DuckDB oracle. Mismatched array lengths
  * return NULL — the same as the built-in spelling, where zip_with pads the
  * shorter side with null and the null product poisons the aggregate.
  * Null elements are a declared precondition violation (callers bind
  * non-null `transform(..., cast)` outputs).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers must bind array<double> children (Ann.prepared casts once);
  // ExpectsInputTypes is private[sql] in Spark 4, so no implicit coercion.
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $x.numElements(); $i++) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Register graft_dot in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      (args: Seq[Expression]) => DotProduct(args(0), args(1)),
      "built-in")
}
