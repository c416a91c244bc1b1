package graft

import graft.operators.{Bucketing, Skew}
import graft.sources.ParquetSink
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Proofs of the scale mechanisms at the plan level: salted aggregation
  * equivalence, bucketed shuffle-free joins, partition pruning.
  */
class ScaleShapeSpec extends SparkSpec {

  test("salted aggregation equals the direct aggregation") {
    val events = Tables.events(spark, sfDir).select("event_type", "value")
    val direct = events.groupBy(col("event_type").as("k"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    val salted = Skew.saltedSumCount(events, col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSet
    assert(salted == direct)
  }

  test("bucketed join runs without a shuffle on either side") {
    // Tiny test tables would auto-broadcast and bypass the bucket layout;
    // force the big-table planning path the mechanism exists for.
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      val ord = Tables.orders(spark, sfDir).select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
      for (t <- Seq("li_bucketed", "ord_bucketed")) {
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(s"spark-warehouse/$t")
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(loc)
        }
      }
      Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey")
      Bucketing.writeBucketed(ord, "ord_bucketed", "l_orderkey")
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a bucketed join, got:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // And it still returns the right rows.
      assert(joined.count() == li.join(ord, "l_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("multi-frame window queries share shuffles: one exchange per distinct partition key") {
    // q_stats_availability evaluates 5 counters over 3 window specs and
    // 2 distinct partition keys, yet plans ONE exchange: hashpartitioning
    // on user_id already co-locates (user_id, event_type) groups, so
    // EnsureRequirements satisfies the per-type window with a sort, not a
    // second shuffle. q_recurrent_delta's 3 frames share one (user_id,
    // event_type) sort+shuffle. A regression that splits frames into
    // extra shuffles multiplies the dominant cost at 100 TB.
    def exchanges(name: String): Int = {
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      // hashpartitioning exchanges only: the final presentation orderBy
      // plans a rangepartitioning exchange that's irrelevant here
      "Exchange hashpartitioning".r.findAllIn(plan).length
    }
    assert(exchanges("q_stats_availability") == 1,
      "stats availability must evaluate all counters with one shuffle")
    assert(exchanges("q_recurrent_delta") == 1,
      "recurrent delta must evaluate delta2/3/4 over one shuffle")
  }

  test("lineDedup never shuffles line strings: every exchange keys on hashes or ids") {
    // The frequency agg and boilerplate join key on xxhash64(line) longs;
    // the only string-bearing exchange is the doc_id join back to the
    // staged chunk frame. An exchange partitioned on the raw `line`
    // string would move ~LineWords x more bytes per row at 100 TB.
    val df = SparkEntry.queries("q_line_dedup")(spark, sfDir)
    df.collect()
    // deepPlan, not the bare executedPlan string (r20): AQE's final
    // rendering elides the hash-keyed exchanges behind materialized
    // query stages and the staged chunk frame's cached body — the
    // invariant held but the flat string no longer showed it.
    val plan = deepPlan(df)
    assert(!plan.contains("hashpartitioning(line#") && !plan.contains("hashpartitioning(line,"),
      s"a shuffle keys on the raw line string:\n$plan")
    assert("hashpartitioning\\((lh|doc_id)#".r.findAllIn(plan).nonEmpty,
      s"expected hash/doc_id-keyed exchanges:\n$plan")
  }

  test("calibratedQuality: calibration windows run on the bounded score frame, never the corpus") {
    // The cum-sum window must be partitioned by source OVER THE
    // (source, score4) COUNT frame — a window over corpus rows
    // partitioned only by a handful of sources would funnel whole
    // sources through single tasks at 100 TB.
    // pre-execution plan: AQE's final rendering elides subtrees behind
    // query-stage nodes, hiding the window from the string
    val plan = SparkEntry.queries("q_quality_calibrate")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(source"),
      s"calibration window must partition by source:\n$plan")
    // the window's input is the aggregated count frame, so the plan has
    // an aggregate on (source, score4) feeding it
    assert(plan.contains("score4"), s"score quantization missing:\n$plan")
    // both calibration-side joins broadcast back to the doc stream
    assert("BroadcastHashJoin|BroadcastExchange".r.findAllIn(plan).nonEmpty,
      s"calibration tables must broadcast:\n$plan")
  }

  test("tokenBudgetMix: cum-sum windows stay bucketed; budgets broadcast to the scan") {
    val plan = SparkEntry.queries("q_token_budget_mix")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the within-source running sum must partition by (source, bucket),
    // never by source alone — a per-source window funnels whole sources
    // through single tasks at 100 TB
    assert(plan.contains("windowspecdefinition(source"), s"two-level window missing:\n$plan")
    assert("windowspecdefinition\\(source#\\d+, blk#".r.findAllIn(plan).nonEmpty,
      s"local cum-sum must partition by (source, blk):\n$plan")
    assert("BroadcastHashJoin|BroadcastExchange".r.findAllIn(plan).nonEmpty,
      s"budget table must broadcast:\n$plan")
  }

  test("curriculumOrder: rank windows partition by (tier, bucket), never globally over docs") {
    val plan = SparkEntry.queries("q_curriculum_order")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(tier_rank#\\d+L?, blk#".r.findAllIn(plan).nonEmpty,
      s"per-tier rank must window within shuffle buckets:\n$plan")
  }

  test("keepBest: the representative window partitions by cluster_id (bounded groups)") {
    val plan = SparkEntry.queries("q_dedup_keep_best")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(cluster_id"),
      s"keeper selection must window within clusters, not globally:\n$plan")
  }

  test("dsirSelect: model tables broadcast, token shuffles key on hashes, no corpus-scale window") {
    val df = SparkEntry.queries("q_dsir_select")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the two model joins and both totals must broadcast back to the
    // candidate token stream — a shuffle join against a vocabulary-scale
    // table would re-shuffle the corpus twice at 100 TB
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(plan).size >= 3,
      s"model/total joins must broadcast:\n$plan")
    // token-keyed exchanges move xxhash64 longs, never token strings
    assert(!plan.contains("hashpartitioning(tok#") && !plan.contains("hashpartitioning(tok,"),
      s"an exchange keys on the raw token string:\n$plan")
    assert(!plan.contains("windowspecdefinition"),
      s"DSIR needs no window at all — rank machinery crept back in:\n$plan")
  }

  test("vocabTopKCms: the rescore joins broadcast; no full-vocabulary exchange on strings") {
    val df = SparkEntry.queries("q_vocab_topk_cms")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("BroadcastHashJoin".r.findAllIn(plan).nonEmpty,
      s"shortlist rescore must broadcast-join the corpus scan:\n$plan")
  }

  test("snapshotMerge: the delta anti-join broadcasts; no corpus-wide shuffle of v1") {
    val df = SparkEntry.queries("q_snapshot_merge")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"v1 must stream through a broadcast anti-join on the delta keys:\n$plan")
  }

  test("phraseMine: score joins broadcast the unigram tables") {
    val df = SparkEntry.queries("q_phrase_mine")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"both unigram joins must broadcast:\n$plan")
  }

  test("diversitySample and knnGraph: ranking windows stay cell-bounded, never global") {
    for (name <- Seq("q_diversity_sample", "q_knn_graph")) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert("windowspecdefinition\\((cell|q_id)".r.findAllIn(plan).nonEmpty,
        s"$name: ranking window must partition by cell/q_id:\n$plan")
      assert(!"windowspecdefinition\\(\\s*(rnk|cos)".r.findAllIn(plan).hasNext,
        s"$name: found an unpartitioned window:\n$plan")
      spark.catalog.clearCache()
    }
  }

  test("partitioned layout prunes partitions at the scan") {
    val path = Files.createTempDirectory("graft_prune").toString + "/events"
    ParquetSink.writePartitioned(
      Tables.events(spark, sfDir).select("event_id", "event_type", "value"),
      path, Seq("event_type"))
    val scan = spark.read.parquet(path).filter(col("event_type") === "error")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("event_type"),
      s"partition filter not pushed:\n$plan")
    val errors = Tables.events(spark, sfDir).filter(col("event_type") === "error").count()
    assert(scan.count() == errors)
  }
}
