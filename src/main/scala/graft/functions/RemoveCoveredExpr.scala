package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Covered-span removal for exact-substring dedup in ONE linear pass:
  * `graft_remove_covered(tokens, starts, width)` → the tokens whose
  * 0-based index falls inside NO [s, s+width) window for s in `starts`.
  *
  * The composable form this replaces — expand `starts` into a covered-
  * index array (`array_distinct(flatten(transform(starts, s ->
  * sequence(s, s+w-1))))`) and then `filter(w, (t, i) ->
  * NOT array_contains(cov, i))` — probes the covered array per TOKEN:
  * O(n·|cov|) per document. On the test corpus few docs carry coverage
  * and it doesn't matter; on the corpus this operator exists for
  * (real crawls where ExactSubstr removes a double-digit share of
  * tokens, Lee et al. 2022) |cov| is O(n) on MOST docs and the filter
  * goes quadratic in document length. Here a boolean coverage bitmap is
  * painted once (O(Σ width), duplicate and overlapping starts free) and
  * the kept tokens are copied in one scan — O(n) per doc, inside
  * whole-stage codegen, no per-token array probe and no materialized
  * covered-index array at all.
  *
  * Identical output to the composition BY CONSTRUCTION for the inputs
  * the pipeline produces (spec-pinned): same 0-based index space as
  * `posexplode`'s window starts, null token slots kept-or-removed
  * purely by position exactly like the lambda (the output array is
  * containsNull for that reason), duplicate/overlapping starts free,
  * and out-of-range starts clamp to the token range rather than
  * corrupting memory (the mine can't produce them — windows start in
  * [0, n−width] — but a frame assembled by hand must fail soft, not
  * segfault the executor). ONE intended divergence: a NULL `starts`
  * SLOT is skipped here, where the composition's flatten-over-null
  * nulls the whole covered array and its filter then drops EVERY token
  * — a composition artifact nobody wants; `collect_list` can't emit
  * null slots, so the pipeline never sees the difference (spec-pinned).
  */
case class RemoveCoveredExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _), IntegerType) if third.foldable =>
        third.eval() match {
          case null => TypeCheckResult.TypeCheckFailure("graft_remove_covered width must be a non-null literal")
          case wv: Int if wv < 1 || wv > 4096 =>
            TypeCheckResult.TypeCheckFailure(s"graft_remove_covered width out of range (1..4096): $wv")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case (l, m, r) => TypeCheckResult.TypeCheckFailure(
        "graft_remove_covered requires (array<string>, array<int>, foldable int), got " +
          s"${l.catalogString}, ${m.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_remove_covered"

  private lazy val width: Int = third.eval().asInstanceOf[Int]

  override protected def nullSafeEval(toks: Any, starts: Any, w: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val st = starts.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val covered = new Array[Boolean](n)
    var i = 0
    while (i < st.numElements()) {
      if (!st.isNullAt(i)) {
        val s = st.getInt(i)
        var k = math.max(s, 0)
        val end = math.min(s.toLong + width, n.toLong).toInt
        while (k < end) { covered(k) = true; k += 1 }
      }
      i += 1
    }
    val out = new Array[Any](n)
    var m = 0
    var j = 0
    while (j < n) {
      if (!covered(j)) {
        out(m) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        m += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, starts, _) => {
      val n = ctx.freshName("n")
      val cov = ctx.freshName("cov")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      val end = ctx.freshName("end")
      s"""
         |int $n = $toks.numElements();
         |boolean[] $cov = new boolean[$n];
         |for (int $i = 0; $i < $starts.numElements(); $i++) {
         |  if (!$starts.isNullAt($i)) {
         |    int $s = $starts.getInt($i);
         |    int $end = (int) Math.min((long) $s + $width, (long) $n);
         |    for (int $k = Math.max($s, 0); $k < $end; $k++) { $cov[$k] = true; }
         |  }
         |}
         |Object[] $out = new Object[$n];
         |int $m = 0;
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$cov[$j]) {
         |    $out[$m++] = $toks.isNullAt($j) ? null : $toks.getUTF8String($j);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $m));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RemoveCoveredExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RemoveCoveredExpr {
  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_remove_covered"),
        new ExpressionInfo(classOf[RemoveCoveredExpr].getName, "graft_remove_covered"),
        (children: Seq[Expression]) => {
          if (children.size != 3)
            throw new IllegalArgumentException(
              s"graft_remove_covered takes exactly 3 arguments (tokens, starts, width), got ${children.size}")
          RemoveCoveredExpr(children(0), children(1), children(2))
        }
      )
    )
}
