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

  test("snapshotMerge reconstructs v2 exactly from v1 plus the delta") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.filter(_._1 % 29 != 5).map { case (id, text, src) =>
      (id, if (id % 17 == 2) text + " rev2" else text, src)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q_snapshot_merge")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == expected, s"merge output diverges from direct v2 (got ${got.size} rows, want ${expected.size})")
  }

  test("corpusDrift flags the planted revision token as a top mover") {
    val out = SparkEntry.queries("q_corpus_drift")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length <= graft.sources.SnapshotDiff.DriftTopK)
    assert(out.map(_._1).distinct.length == out.length, "duplicate tokens in the report")
    assert(out.forall { case (_, r1, r2, d) => d == r2 - r1 }, "drift must be the signed rate delta")
    // 'rev2' exists only in the v2 snapshot: rate1 must be 0 and the
    // mover list must surface it (it is the one genuinely new token).
    val rev2 = out.find(_._1 == "rev2")
    assert(rev2.nonEmpty, s"planted revision token missing from movers: ${out.map(_._1).toSeq}")
    assert(rev2.get._2 == 0 && rev2.get._4 > 0, s"rev2 drift malformed: $rev2")
  }
}
