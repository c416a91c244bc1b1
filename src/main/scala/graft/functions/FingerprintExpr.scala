package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit rolling polynomial fingerprint of a string: h = h*31 + byte
  * over the UTF-8 bytes, wrapping in a Long. A native Catalyst Expression
  * with doGenCode so it stays inside whole-stage codegen — the per-row
  * loop compiles into the generated stage instead of boxing through a
  * Scala UDF closure (no serialization, no Option/Row allocation per row).
  *
  * The reference fingerprints records by (match_id, region) natural keys
  * (models.py:61-66); a content fingerprint is the LLM-corpus analog used
  * for cheap incremental-dedup bookkeeping.
  */
case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + ($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

object FingerprintExpr {
  /** Registration for SparkSessionExtensions / builder.withExtensions. */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_fingerprint"),
        new ExpressionInfo(classOf[FingerprintExpr].getName, "graft_fingerprint"),
        (children: Seq[Expression]) => FingerprintExpr(children.head)
      )
    )

  /** Reference implementation for specs. */
  def reference(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
    h
  }
}
