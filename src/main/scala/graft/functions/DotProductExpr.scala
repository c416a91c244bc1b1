package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double arrays as a native codegen Expression.
  *
  * The composable alternative — aggregate(zip_with(a, b, *), 0d, +) —
  * allocates an intermediate 64-element array and folds through
  * interpreted lambdas PER ROW; on an all-pairs similarity join that is
  * the entire runtime (measured 70 s → ~3 s at sf0.1 for
  * q_embed_neardup). This loops directly over the unsafe ArrayData with
  * no allocation, inside whole-stage codegen.
  *
  * Accumulation order is ascending-index, identical to the sequential
  * fold it replaces, so DuckDB list_dot_product oracle comparisons stay
  * bit-for-bit stable.
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<double> arguments, got ${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // Strict on dimension mismatch (like DuckDB list_dot_product): a
    // silent min-length truncation would turn an upstream dimension bug
    // into plausible-but-wrong cosines the oracle can't catch.
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot: array length mismatch ($n vs ${y.numElements()})")
    var acc = 0d
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
        (children: Seq[Expression]) => DotProductExpr(children(0), children(1))
      )
    )
}
