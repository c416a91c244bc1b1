package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash fingerprint of a token array in ONE scan-local pass:
  * `graft_simhash(tokens)` (Charikar's random-hyperplane sketch over
  * token hashes — the Manku WWW'07 web-dedup formulation).
  *
  * The composable form — explode the token array, `xxhash64` each
  * token, then a 64-column ±1 vote aggregate per doc — shuffles the
  * ENTIRE exploded token frame (corpus token count × 16-byte rows)
  * just to bring each doc's tokens back together, when every token of
  * a doc is already adjacent in the row's own array. At 100 TB that
  * explode+groupBy is a full-corpus-text shuffle for a per-row
  * function; this Expression computes the same 64 votes in one array
  * walk inside whole-stage codegen and shuffles nothing.
  *
  * Bit-exact with the SQL composition BY CONSTRUCTION: Spark's
  * `xxhash64(tok)` on a string is `XXH64.hashUTF8String(tok, 42L)` —
  * the same catalyst primitive called here — and the vote rule matches
  * the aggregate form exactly: +1 when bit i of the token hash is set,
  * -1 otherwise, bit i of the fingerprint set iff the summed vote is
  * STRICTLY positive (ties at even token counts leave the bit clear,
  * like the `> 0` in the old aggregate). A null token slot contributes
  * the bare seed 42L, mirroring `xxhash64(null)` = seed (null fields
  * are skipped in the fold) — which matters because a staged-parquet
  * round-trip re-reads every array as nullable-element.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string>, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = if (arr.isNullAt(j)) 42L else XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
      var i = 0
      while (i < 64) {
        votes(i) += (((h >>> i).toInt & 1) << 1) - 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= 1L << i
      i += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $a.isNullAt($j) ? 42L : $xxh.hashUTF8String($a.getUTF8String($j), 42L);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $votes[$i] += ((((int) ($h >>> $i)) & 1) << 1) - 1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $fp |= 1L << $i;
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (
        FunctionIdentifier("graft_simhash"),
        new ExpressionInfo(classOf[SimHashExpr].getName, "graft_simhash"),
        (children: Seq[Expression]) => {
          if (children.size != 1)
            throw new IllegalArgumentException(
              s"graft_simhash takes exactly 1 argument (token array), got ${children.size}")
          SimHashExpr(children.head)
        }
      )
    )
}
