package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r15 oracle GENERATORS (KMeansOracle / ModelOracle /
  * HllOracle) at the points where they could silently break before the
  * driver gate sees them:
  * - HllOracle extracts its constants from the live Spark helper via
  *   reflection — a Spark upgrade that renames those fields must fail
  *   HERE, loudly, not emit garbage SQL;
  * - the generated SQL must materialize the multiply-referenced CTEs
  *   (DuckDB inlines by default; un-materialized, the quantizer replay
  *   re-evaluates ~27× and the compare times out — measured);
  * - generator constants must track the engine constants they replay
  *   (Iters/Eta/caps interpolate into the SQL text).
  */
class OracleGenSpec extends AnyFunSuite {

  test("HllOracle extracts live Spark HLL++ constants and emits coherent SQL") {
    val sql = graft.operators.HllOracle.sql
    // rsd 0.02 -> p = 12, m = 4096 (the HLL++ precision derivation);
    // the register loop and tables must reflect exactly that.
    assert(sql.contains("range(0, 4096)"), "m = 4096 registers at rsd 0.02")
    assert(sql.contains("4503599627370496"), "idxShift divisor = 2^52 for p = 12")
    assert(sql.contains("list_prepend(0.0::DOUBLE"), "zInverse fold is 0.0-seeded in register order")
    assert(sql.contains("floor(h.estimate + 0.5)"), "Java Math.round semantics, not half-away")
    assert("AS MATERIALIZED".r.findAllIn(sql).size >= 4, "state CTEs must be materialized")
  }

  test("KMeansOracle tracks the engine fit constants and materializes round state") {
    val sql = graft.similarity.KMeansOracle.annIvfSql
    assert(sql.contains(s"WHERE f.step < ${graft.similarity.IvfAnn.LloydIters}"),
      "Lloyd round count interpolates")
    assert(sql.contains(s"GREATEST(4096, 32 * k)"), "trainCapFor contract")
    assert((1 to graft.similarity.IvfAnn.MaxSplitRounds).forall(r => sql.contains(s"splits$r AS MATERIALIZED")),
      "every balance round's splits CTE is materialized")
    assert(sql.contains("acorp AS MATERIALIZED"), "corpus assignment is materialized")
    val pq = graft.similarity.KMeansOracle.annIvfPqSql
    assert((0 until graft.similarity.IvfPq.NumSubspaces).forall(j => pq.contains(s"pqfit$j AS (")),
      "one codebook-fit recursion per subspace")
  }

  test("ModelOracle tracks the engine trainer constants") {
    val sql = graft.operators.ModelOracle.trainPredictSql
    assert(sql.contains(s"WHERE g.step < ${graft.operators.Model.Iters}"), "GD round count interpolates")
    assert(sql.contains(s"<= ${graft.operators.Model.TrainCap}"), "bounded-sample cap interpolates")
    assert(sql.contains(s"${graft.operators.Model.Quant.toLong}.0"), "2^24 quantization grid interpolates")
    assert(sql.contains("0.5 + 0.5 * "), "rational sigmoid link present")
    for (f <- graft.operators.Model.FeatureCols)
      assert(sql.contains(s"event_type = '$f'"), s"feature column $f in the pivot replay")
  }
}
