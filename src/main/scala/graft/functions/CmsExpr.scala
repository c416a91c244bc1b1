package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate probe for Spark's OWN count-min sketch (the
  * `count_min_sketch` SQL aggregate ships in the public
  * FunctionRegistry, but the engine exposes NO probe function — the
  * sketch is only consumable from Scala. This closes that gap the same
  * way BloomExpr does for the bloom pair).
  *
  * `graft_cms_estimate(sketch, hash)` — estimated occurrence count of a
  * LONG item. The sketch side must be a foldable LITERAL (a scalar
  * subquery is NOT accepted — unlike Spark's BloomFilterMightContain,
  * which special-cases subqueries, this expression requires
  * `left.foldable`; build the sketch first and inject its bytes as a
  * literal, the way `vocabTopKCms` does). Foldability is what lets the
  * expression deserialize the sketch ONCE per task and probe from
  * whole-stage codegen via a reference object — never per row. Long items only, by design: the corpus convention is
  * xxhash64 keys at the scan (`count_min_sketch` over the hash column
  * uses the same long-hash ingest path, so probe and build agree).
  *
  * CMS guarantee (Cormode & Muthukrishnan 2005): estimates NEVER
  * undercount; overcounts are bounded by eps·N with the configured
  * confidence. That one-sidedness is why a CMS shortlist + exact
  * rescore emits EXACTLY the true top-k (see
  * `TextFunctions.vocabTopKCms`) — a true heavy hitter cannot be
  * estimated below its real count, so only a flood of overestimates
  * could push it off a shortlist, and the rescore depth absorbs that.
  */
case class CmsEstimateExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) if left.foldable => TypeCheckResult.TypeCheckSuccess
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
      "graft_cms_estimate requires the sketch argument to be a foldable " +
        "literal (scalar subqueries are not supported) so it deserializes once per task")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_estimate requires (binary, bigint), got ${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cms_estimate"

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(s: Any, item: Any): Any =
    sketch.estimateCount(item.asInstanceOf[java.lang.Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", sketch, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, item) =>
      s"${ev.value} = $ref.estimateCount((Object) $item);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
}

object CmsExpr {
  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_cms_estimate"),
        new ExpressionInfo(classOf[CmsEstimateExpr].getName, "graft_cms_estimate"),
        (children: Seq[Expression]) => CmsEstimateExpr(children(0), children(1))
      )
    )
}
