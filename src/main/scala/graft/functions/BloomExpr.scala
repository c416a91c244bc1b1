package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-callable handles on Spark's OWN bloom-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair
  * Catalyst itself injects for runtime row-level join filtering). Spark
  * keeps them out of the public FunctionRegistry, so the membership
  * pre-filters here (`Dedup.decontaminateBloom`, the streaming ingest
  * gate) register them under graft names instead of reimplementing a
  * sketch the engine already ships with codegen support.
  *
  * - `graft_bloom_agg(hash, n_items)` — aggregates LONG hashes into a
  *   serialized bloom (BINARY). Sizing: `n_items` at the default 3% fpp;
  *   the engine clamps bits at `spark.sql.optimizer.runtime.bloomFilter.
  *   maxNumBits` (64M bits = 8 MB), so the sketch is bounded by
  *   construction no matter what capacity a caller asks for.
  * - `graft_might_contain(bloom, hash)` — membership probe; the bloom
  *   side must be a constant (literal or scalar subquery), which is what
  *   lets the expression deserialize it ONCE per task and probe from
  *   whole-stage codegen.
  *
  * No false negatives ever; false positives are whatever downstream
  * exactness logic must absorb (decontaminateBloom confirms candidates
  * with an exact join, so its OUTPUT is exact and oracle-comparable).
  */
object BloomExpr {
  def register(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
        (children: Seq[Expression]) => new BloomFilterAggregate(children(0), children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_might_contain"),
        new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
        (children: Seq[Expression]) => BloomFilterMightContain(children(0), children(1))
      )
    )
  }
}
