package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** k MinHash values of a hashed-shingle array in ONE pass, as a native
  * codegen Expression: `graft_minhash(shingles, k)`.
  *
  * The composable form — k separate `array_min(transform(sh, s ->
  * xxhash64(s, i)))` columns — walks the array k times through
  * interpreted lambdas and re-hashes every shingle from scratch per
  * seed (the same HOF-per-row cost graft_dot exists to avoid). This
  * walks the array once, computes the shared inner state
  * `XXH64.hashLong(s, 42)` once per shingle, and derives each seed's
  * hash with one cheap `hashInt` — O(n + n·k) trivial ops instead of
  * k interpreted array traversals.
  *
  * Bit-exact with the SQL composition BY CONSTRUCTION, not by luck: a
  * Spark `xxhash64(s, i)` call folds fields left-to-right, so its value
  * is exactly `XXH64.hashInt(i, XXH64.hashLong(s, 42L))` — the same
  * catalyst XXH64 primitives called here (identity is spec-pinned
  * against the HOF composition). Mind the edge: on an EMPTY shingle
  * array this returns Long.MaxValue entries where `array_min` returns
  * nulls — callers filter empty docs (both paths already do).
  *
  * `k` must be a foldable integer (it sizes generated code).
  *
  * Null-slot semantics mirror the composition EXACTLY: Spark's
  * `xxhash64(s, i)` folds fields left-to-right and SKIPS null fields,
  * so `xxhash64(null, i)` = `hashInt(i, 42)` — a null slot therefore
  * contributes `h0 = 42` (the bare seed) here, not an undefined raw
  * read. This matters because the scratch-staging mode re-reads staged
  * arrays from parquet, which always reports elements as nullable.
  */
case class MinHashExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // containsNull=true is ACCEPTED and handled explicitly (see the
    // null-slot note above): rejecting it looked safe but broke the
    // scratch-staging mode — a parquet round-trip re-reads every array
    // as nullable-element regardless of how it was written, so the
    // staged 100 TB path would fail analysis while the persist path
    // sailed through (caught by the r8 scratch-mode re-verification).
    case (ArrayType(LongType, _), IntegerType) if right.foldable =>
      // k sizes generated code — validate the literal at analysis, not
      // with a per-row NegativeArraySize/NPE at runtime
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure("graft_minhash k must be a non-null literal")
        case kv: Int if kv < 1 || kv > 4096 =>
          TypeCheckResult.TypeCheckFailure(s"graft_minhash k out of range (1..4096): $kv")
        case _ => TypeCheckResult.TypeCheckSuccess
      }
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires (array<bigint>, foldable int), got ${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash"

  private lazy val k: Int = right.eval().asInstanceOf[Int]

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h0 = if (arr.isNullAt(j)) 42L else XXH64.hashLong(arr.getLong(j), 42L)
      var i = 0
      while (i < k) {
        val hi = XXH64.hashInt(i, h0)
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val h0 = ctx.freshName("h0")
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h0 = $a.isNullAt($j) ? 42L : $xxh.hashLong($a.getLong($j), 42L);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $hi = $xxh.hashInt($i, $h0);
         |    if ($hi < $mins[$i]) $mins[$i] = $hi;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MinHashExpr =
    copy(left = newLeft, right = newRight)
}

object MinHashExpr {
  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_minhash"),
        new ExpressionInfo(classOf[MinHashExpr].getName, "graft_minhash"),
        (children: Seq[Expression]) => {
          if (children.size != 2)
            throw new IllegalArgumentException(
              s"graft_minhash takes exactly 2 arguments (shingles array, k), got ${children.size}")
          MinHashExpr(children(0), children(1))
        }
      )
    )
}
