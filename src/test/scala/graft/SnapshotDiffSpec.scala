package graft

import org.apache.spark.sql.functions._

/** Snapshot diff: the planted v1/v2 slices must be recovered exactly
  * and the diff must stay delta-sized.
  */
class SnapshotDiffSpec extends SparkSpec {

  test("corpusDiff recovers exactly the planted added/removed/changed sets") {
    val ids = Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0)).toSet
    val inV1 = ids.filter(_ % 23 != 3)
    val inV2 = ids.filter(_ % 29 != 5)
    val expected = Map(
      "added"   -> inV2.diff(inV1),
      "removed" -> inV1.diff(inV2),
      "changed" -> inV1.intersect(inV2).filter(_ % 17 == 2))
    val out = SparkEntry.queries("q_corpus_diff")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = out.groupBy(_._2).map { case (s, rows) => s -> rows.map(_._1).toSet }
    assert(got == expected.filter(_._2.nonEmpty),
      s"diff mismatch: extra=${got.keySet.diff(expected.keySet)}")
    for ((status, want) <- expected if want.nonEmpty)
      assert(got(status) == want, s"$status: got ${got(status).size} want ${want.size}")
    // delta-sized: unchanged docs never emitted
    val unchanged = inV1.intersect(inV2).filterNot(_ % 17 == 2)
    assert(out.map(_._1).toSet.intersect(unchanged).isEmpty, "unchanged docs leaked into the diff")
  }

  test("corpusDiff joins on hashes, not document text") {
    // The full-outer join must never carry the text column — each side
    // projects to (doc_id, sha2, source) before the exchange. The walk
    // descends through AQE wrappers (their children list is empty).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def joins(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => Seq(j)
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => Seq(j)
        case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _                        => p.children
      }
      self ++ kids.flatMap(joins)
    }
    val js = joins(SparkEntry.queries("q_corpus_diff")(spark, sfDir)
      .queryExecution.executedPlan)
    assert(js.nonEmpty, "snapshot diff should be a shuffled join on doc_id")
    for (j <- js; side <- j.children)
      assert(!side.output.map(_.name).contains("text"),
        s"join input carries raw text: ${side.output.map(_.name)}")
  }
}
