package graft

/** Plan-shape gates: the properties that decide whether a plan survives
  * a 1000-executor cluster, asserted on the actual executed plans.
  */
class PlanShapeSpec extends SparkSpec {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
  import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  /** Recursive collect that descends through AQE wrappers (a leaf node
    * to TreeNode.collect) and subquery plans.
    */
  private def collectBnlj(p: SparkPlan): Seq[BroadcastNestedLoopJoinExec] = {
    val self = p match { case j: BroadcastNestedLoopJoinExec => Seq(j); case _ => Nil }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _                        => p.children ++ p.subqueries
    }
    self ++ kids.flatMap(collectBnlj)
  }

  test("no CartesianProduct or unbounded BroadcastNestedLoopJoin in any query plan") {
    for ((name, fn) <- SparkEntry.queries) {
      val exec = fn(spark, sfDir).queryExecution.executedPlan
      assert(!exec.toString.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      // Only BOUNDED broadcast sides are allowed, checked on the BUILD
      // side subtree itself (not anywhere in the whole plan): a keyless
      // aggregate (guaranteed single row — the scalar-subquery plan
      // Spark itself produces; any physical flavor — struct-typed
      // aggregates plan as SortAggregate/ObjectHashAggregate, same
      // one-row bound) or a driver-local LocalTableScan whose size is
      // fixed by construction (the IVF centroid frame, ≤ MaxCells
      // rows). Anything else (an unbounded build side) is a 100 TB
      // killer.
      for (j <- collectBnlj(exec)) {
        val build = j.buildSide match {
          case BuildLeft  => j.left
          case BuildRight => j.right
        }
        val buildStr = build.toString
        val keylessAgg = buildStr.contains("HashAggregate(keys=[]") ||
          buildStr.contains("SortAggregate(key=[]") ||
          buildStr.contains("ObjectHashAggregate(keys=[]")
        assert(
          keylessAgg || buildStr.contains("LocalTableScan"),
          s"$name plans a BroadcastNestedLoopJoin with an unbounded build side:\n$buildStr"
        )
      }
    }
  }

  test("q_filter_project pushes filter and prunes columns at the parquet scan") {
    val plan = executedPlan("q_filter_project")
    assert(plan.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(plan.contains("l_returnflag"), "filter column not pushed")
    // Pruned read schema: none of the untouched wide columns.
    assert(!plan.contains("l_comment"), "scan reads unprojected columns")
  }

  test("q_join_broadcast broadcasts the dim side") {
    assert(executedPlan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_multi_join_agg broadcasts only true dims, not fact-scale customer") {
    val optimized = SparkEntry
      .queries("q_multi_join_agg")(spark, sfDir)
      .queryExecution
      .optimizedPlan
      .toString
    // Exactly two explicit hints (nation, region); customer joins without
    // one (AQE may still broadcast it at tiny SF — a runtime decision,
    // not a plan-forced OOM at 100 TB).
    val analyzed = SparkEntry
      .queries("q_multi_join_agg")(spark, sfDir)
      .queryExecution
      .analyzed
      .toString
    val hints = "UnresolvedHint|ResolvedHint".r.findAllIn(analyzed).size
    assert(hints == 2, s"expected exactly 2 broadcast hints (nation, region), got $hints:\n$analyzed")
    assert(optimized.nonEmpty)
  }

  test("q_topk_global plans TakeOrderedAndProject (no global sort of the full table)") {
    assert(executedPlan("q_topk_global").contains("TakeOrderedAndProject"))
  }

  test("window queries partition by high-cardinality keys (no single-partition global window)") {
    for (name <- Seq("q_window_running", "q_window_moving", "q_asof_lookback")) {
      val plan = executedPlan(name)
      assert(plan.contains("windowspecdefinition(user_id"),
        s"$name window does not partition by user_id")
    }
  }

  test("composite and SCD queries scan the fact table exactly once") {
    // The design claim (SURVEY §2 rows 41/42): all event-grain work in
    // these queries shares one scan + one user_id shuffle — the plan
    // must not re-read the parquet per window/aggregate subtree.
    for (name <- Seq("q_stats_history_composite", "q_scd_history")) {
      val plan = executedPlan(name)
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans == 1, s"$name scans the fact table $scans times")
    }
    assert(executedPlan("q_stats_history_composite").contains("windowspecdefinition(user_id"))
  }

  test("corpus-scale join sides carry no forced broadcast hints") {
    // The line-frequency and pair-verify sides grow with the corpus; a
    // hint would force an executor-memory broadcast at 100 TB. AQE may
    // still broadcast at toy SF — a runtime decision, which is the
    // point: only true dims and bounded frames get hints.
    for (name <- Seq("q_line_dedup", "q_dedup_delta", "q_semdedup")) {
      val analyzed = SparkEntry.queries(name)(spark, sfDir).queryExecution.analyzed.toString
      val hints = "UnresolvedHint|ResolvedHint".r.findAllIn(analyzed).size
      assert(hints == 0, s"$name forces $hints broadcast hint(s) on a corpus-scale side")
    }
  }

  test("q_semdedup self-join is cell-keyed (equi), never all-pairs") {
    val optimized = SparkEntry.queries("q_semdedup")(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("cell"), "cell key missing from the join")
    val exec = SparkEntry.queries("q_semdedup")(spark, sfDir).queryExecution.executedPlan.toString
    assert(!exec.contains("CartesianProduct") && !exec.contains("BroadcastNestedLoopJoin"),
      "semdedup fell back to an all-pairs join shape")
  }

  test("whole-stage codegen covers the agg pipeline of q_agg_group") {
    // AQE shows codegen spans only in the final plan — execute THIS df
    // (a write would clone the plan and leave df's own unexecuted).
    val df = SparkEntry.queries("q_agg_group")(spark, sfDir)
    df.collect()
    // Codegen'd operators carry the "*(stageId)" prefix in the final plan.
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("*(1)"), s"no whole-stage-codegen span in:\n$finalPlan")
  }
}
