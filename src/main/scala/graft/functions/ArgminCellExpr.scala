package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid assignment in ONE scan-local pass:
  * `graft_argmin_cell(u, flat_centroids, k)` → int cell id.
  *
  * This is the corpus-assignment step of the deterministic IVF/PQ
  * quantizers (`KMeansFit`) — the role `ml.KMeansModel.transform`
  * played through r15. The centroid table enters as one FOLDABLE flat
  * array literal (row-major, k·d doubles — a Literal OBJECT attached by
  * `typedLit`, never SQL text, the IvfPq `flatCb` convention; bounded
  * by the training contract at 32·MaxCells·d ≤ 2 MB, shipped once per
  * stage exactly like the old model closure). Codegen hands the decoded
  * centroids and their precomputed norms to the generated class via
  * `addReferenceObj`, so the hot path is plain array arithmetic inside
  * whole-stage codegen — no per-row decoding, no HOF lambdas, no UDF.
  *
  * Scoring contract (the `KMeansFit` arithmetic contract — replayed
  * bit-exactly by `KMeansOracle`): score(c) = dot(c,c) − 2·dot(u,c)
  * with ascending-index dots, argmin ties to the LOWEST cell id. The
  * per-point dot(u,u) term is constant across candidates and omitted.
  * Null ELEMENT slots read as 0.0 through the raw `getDouble` path —
  * the `graft_dot` convention (§8: parquet read-back reports array
  * elements nullable; the corpus carries none).
  */
case class ArgminCellExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), IntegerType) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            "graft_argmin_cell: centroid table and k must be foldable (literals)")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_argmin_cell requires (array<double>, array<double>, int), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_argmin_cell"

  /** Decoded (flat centroids, per-centroid norms², k, dim) — computed
    * once per JVM from the foldable children (driver at codegen time,
    * executor on the interpreted path after the expression tree — and
    * its literal children — deserialize with the task).
    */
  @transient private lazy val decoded: (Array[Double], Array[Double], Int, Int) = {
    val flatData = second.eval(null).asInstanceOf[ArrayData]
    val k = third.eval(null).asInstanceOf[Int]
    val flat = flatData.toDoubleArray()
    require(k >= 1 && flat.length % k == 0,
      s"graft_argmin_cell: ${flat.length} centroid doubles not divisible into k=$k rows")
    val d = flat.length / k
    val cn = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0; var j = 0; val off = c * d
      while (j < d) { val x = flat(off + j); s += x * x; j += 1 }
      cn(c) = s
      c += 1
    }
    (flat, cn, k, d)
  }

  override protected def nullSafeEval(u: Any, centsIgnored: Any, kIgnored: Any): Any = {
    val (flat, cn, k, d) = decoded
    val arr = u.asInstanceOf[ArrayData]
    if (arr.numElements() != d)
      throw new IllegalArgumentException(
        s"graft_argmin_cell: expected $d dims, got ${arr.numElements()}")
    val v = new Array[Double](d)
    var j = 0
    while (j < d) { v(j) = arr.getDouble(j); j += 1 }
    var best = 0
    var bestS = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      var acc = 0.0; var t = 0; val off = c * d
      while (t < d) { acc += v(t) * flat(off + t); t += 1 }
      val s = cn(c) - 2.0 * acc
      if (s < bestS) { best = c; bestS = s }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (flat, cn, k, d) = decoded
    val flatRef = ctx.addReferenceObj("argminCents", flat, "double[]")
    val cnRef = ctx.addReferenceObj("argminCnorms", cn, "double[]")
    // The foldable centroid/k children codegen to constant object refs
    // (unused below — the decoded reference objects above replace them);
    // only the vector child does per-row work.
    nullSafeCodeGen(ctx, ev, (u, _, _) => {
      val v = ctx.freshName("v")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      s"""
         |if ($u.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "graft_argmin_cell: expected $d dims, got " + $u.numElements());
         |}
         |double[] $v = new double[$d];
         |for (int $j = 0; $j < $d; $j++) { $v[$j] = $u.getDouble($j); }
         |int $best = 0;
         |double $bestS = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $acc = 0.0;
         |  int $off = $c * $d;
         |  for (int $t = 0; $t < $d; $t++) { $acc += $v[$t] * $flatRef[$off + $t]; }
         |  double $s = $cnRef[$c] - 2.0 * $acc;
         |  if ($s < $bestS) { $best = $c; $bestS = $s; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ArgminCellExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ArgminCellExpr {
  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_argmin_cell"),
        new ExpressionInfo(classOf[ArgminCellExpr].getName, "graft_argmin_cell"),
        (children: Seq[Expression]) => {
          if (children.size != 3)
            throw new IllegalArgumentException(
              s"graft_argmin_cell takes (vector, flat_centroids, k), got ${children.size} args")
          ArgminCellExpr(children(0), children(1), children(2))
        }
      )
    )
}
