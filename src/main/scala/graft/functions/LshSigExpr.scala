package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All 64 random-hyperplane LSH signature bits of a vector in ONE
  * fused pass: `graft_lsh_sig(e)` → bigint (bit i = sign of e·plane_i).
  *
  * The composable form — 64 separate `graft_dot(e, array(<64 double
  * literals>))` columns OR-folded together — is arithmetically fine but
  * structurally heavy: every signature site ships 4096 literal doubles
  * into the plan (~80 KB of SQL text parsed, analyzed, folded, and
  * codegen'd PER QUERY BUILD — 0.6 s of driver time per LSH query
  * measured at r13), and the generated code re-reads the vector through
  * ArrayData accessors once per plane. Here the planes live in ONE
  * array object attached to the generated class via `addReferenceObj`,
  * the vector is copied to a local once and scanned 64 times with plain
  * array indexing, and the plan carries a single compact expression.
  * Driver planning cost matters at fleet scale — a production pipeline
  * builds thousands of plans per day and every LSH site paid that 80 KB
  * tax — and the per-row accessor savings come free.
  *
  * Bit-exact with the composition BY CONSTRUCTION — for non-null
  * vectors: same plane values (shared `LshSigExpr.planes` — the seeded
  * PRNG table LshAnn has used since r3), same ascending-index
  * accumulation as `graft_dot`, same raw `getDouble` reads (null slots
  * read as 0.0 exactly like graft_dot's unsafe path), same STRICT `> 0`
  * bit rule, and the same loud length-mismatch failure instead of a
  * silent truncation.
  *
  * NULL-vector divergence, INTENDED (r14): the old composition's
  * `when(null > 0).otherwise(0)` OR-fold produced signature 0L for a
  * null embedding, silently banding every null row together with the
  * all-negative-dot vectors; this Expression is `nullIntolerant`, so a
  * null vector yields a NULL signature → null band keys → the row drops
  * out of ANN candidate generation entirely. Dropping rows with no
  * embedding is the correct semantics for a similarity index (a null
  * vector has no meaningful neighbors) and is pinned by
  * LshSigExprSpec's null-vector case; the corpus tables carry no null
  * embeddings, so production plans see no behavior change.
  */
case class LshSigExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_sig requires array<double>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_lsh_sig"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val dim = LshSigExpr.Dim
    val n = arr.numElements()
    if (n != dim)
      throw new IllegalArgumentException(s"graft_lsh_sig: expected $dim dims, got $n")
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) { v(j) = arr.getDouble(j); j += 1 }
    val flat = LshSigExpr.flatPlanes
    var sig = 0L
    var i = 0
    while (i < LshSigExpr.NumBits) {
      var acc = 0d
      val off = i * dim
      var k = 0
      while (k < dim) { acc += v(k) * flat(off + k); k += 1 }
      if (acc > 0d) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", LshSigExpr.flatPlanes, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val dim = LshSigExpr.Dim
      val bits = LshSigExpr.NumBits
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "graft_lsh_sig: expected $dim dims, got " + $n);
         |}
         |double[] $v = new double[$dim];
         |for (int $j = 0; $j < $dim; $j++) { $v[$j] = $a.getDouble($j); }
         |long $sig = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  double $acc = 0.0;
         |  int $off = $i * $dim;
         |  for (int $k = 0; $k < $dim; $k++) { $acc += $v[$k] * $planesRef[$off + $k]; }
         |  if ($acc > 0.0) $sig |= 1L << $i;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshSigExpr =
    copy(child = newChild)
}

object LshSigExpr {
  val Dim = 64
  val NumBits = 64

  /** The fixed hyperplane table (seeded PRNG, unchanged since r3 —
    * LshAnn.hyperplanes aliases this). Row-major planes(i) = plane i.
    */
  val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumBits, Dim)(rnd.nextGaussian())
  }

  /** Flattened row-major copy handed to generated code (one object,
    * cache-friendly inner loop).
    */
  val flatPlanes: Array[Double] = planes.flatten

  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_lsh_sig"),
        new ExpressionInfo(classOf[LshSigExpr].getName, "graft_lsh_sig"),
        (children: Seq[Expression]) => {
          if (children.size != 1)
            throw new IllegalArgumentException(
              s"graft_lsh_sig takes exactly 1 argument (vector), got ${children.size}")
          LshSigExpr(children.head)
        }
      )
    )
}
