package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** All sliding-window hashes of a token array in ONE codegen pass:
  * `graft_window_hashes(tokens, width)` → array<bigint> with
  * n − width + 1 entries (empty when n < width) — the key frame of
  * cross-document exact-substring dedup (`SubstrDedup`).
  *
  * The composable form this replaces,
  *   `transform(w, t -> xxhash64(t))` then
  *   `transform(sequence(0, n−width), s -> xxhash64(slice(th, s+1, width)))`,
  * is arithmetically right but runs as TWO interpreted higher-order
  * lambdas per row (HOFs sit outside whole-stage codegen) and the inner
  * one ALLOCATES a width-long slice array per window — ~n·width object
  * churn per document just to feed a hash. Here the token hashes land
  * in one primitive array and every window key is a seed-chained fold
  * over width adjacent entries — zero allocation beyond the two output
  * arrays, all inside whole-stage codegen.
  *
  * Bit-exact with the composition BY CONSTRUCTION: token hash =
  * `XXH64.hashUTF8String(tok, 42)` (a null slot contributes the bare
  * seed 42, exactly like `xxhash64(null)` — parquet re-reads report
  * nullable elements); window key = Spark's `xxhash64(array<bigint>)`
  * fold, i.e. `hashLong` chained over the width elements in ascending
  * order from seed 42 (identity spec-pinned against the HOF
  * composition, including the multibyte-unicode and null-slot edges).
  * `width` must be a positive int literal (it sizes nothing here, but a
  * row-dependent window width has no meaning for a corpus-wide dedup
  * key and would break the DuckDB oracle's fixed-width replay).
  */
case class WindowHashExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure("graft_window_hashes width must be a non-null literal")
        case wv: Int if wv < 1 || wv > 4096 =>
          TypeCheckResult.TypeCheckFailure(s"graft_window_hashes width out of range (1..4096): $wv")
        case _ => TypeCheckResult.TypeCheckSuccess
      }
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_window_hashes requires (array<string>, foldable int), got ${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_window_hashes"

  private lazy val width: Int = right.eval().asInstanceOf[Int]

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - width + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val th = new Array[Long](n)
    var j = 0
    while (j < n) {
      th(j) = if (arr.isNullAt(j)) 42L else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      j += 1
    }
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var h = 42L
      var k = 0
      while (k < width) { h = XXH64.hashLong(th(s + k), h); k += 1 }
      out(s) = h
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val th = ctx.freshName("th")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val k = ctx.freshName("k")
      s"""
         |int $n = $a.numElements();
         |int $m = $n - $width + 1;
         |if ($m <= 0) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(new long[0]);
         |} else {
         |  long[] $th = new long[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $th[$j] = $a.isNullAt($j) ? 42L : $xxh.hashUTF8String($a.getUTF8String($j), 42L);
         |  }
         |  long[] $out = new long[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    long $h = 42L;
         |    for (int $k = 0; $k < $width; $k++) { $h = $xxh.hashLong($th[$s + $k], $h); }
         |    $out[$s] = $h;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): WindowHashExpr =
    copy(left = newLeft, right = newRight)
}

object WindowHashExpr {
  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_window_hashes"),
        new ExpressionInfo(classOf[WindowHashExpr].getName, "graft_window_hashes"),
        (children: Seq[Expression]) => {
          if (children.size != 2)
            throw new IllegalArgumentException(
              s"graft_window_hashes takes exactly 2 arguments (tokens, width), got ${children.size}")
          WindowHashExpr(children(0), children(1))
        }
      )
    )
}
