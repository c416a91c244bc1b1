package graft

import java.nio.file.Files

/** Pins the 100 TB deployment mode of graft.Staging: with
  * `spark.graft.scratch` set, every staged index is written to scratch
  * parquet and re-read instead of persisted to executor storage — and a
  * staged query's rows must be identical in both modes.
  */
class StagingSpec extends SparkSpec {

  test("scratch-parquet staging returns identical rows to persist mode and writes staged dirs") {
    val q = SparkEntry.queries("q_dedup_jaccard_prefix")
    val persistRows = q(spark, sfDir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val dir = Files.createTempDirectory("graft_scratch").toString
    spark.conf.set("spark.graft.scratch", dir)
    try {
      val scratchRows = q(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(scratchRows == persistRows, "scratch mode must not change query results")
      val staged = new java.io.File(dir).listFiles().filter(_.getName.startsWith("stage_"))
      assert(staged.nonEmpty, "scratch mode must write staged parquet dirs")
      assert(staged.forall(d => new java.io.File(d, "_SUCCESS").exists()),
        "every staged dir must be a committed parquet write")
    } finally {
      spark.conf.unset("spark.graft.scratch")
    }
  }

  test("persist mode: AQE cache by default, columnar cache on explicit opt-in, conf restored") {
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    spark.catalog.clearCache()
    val key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    assert(spark.conf.get(key) == "true",
      "the session default must keep AQE in cached plans (r16: static " +
        "estimates broadcast corpus-scale join sides under the staged " +
        "pair verifies)")
    def cachedPlanOf(df: org.apache.spark.sql.DataFrame, columnar: Boolean): String = {
      val staged = Staging.staged(df, "aqe_scope_probe", columnarCache = columnar)
      staged.count()
      // Fresh Dataset: `staged`'s own QueryExecution was memoized before
      // the cache registration, so cache substitution only shows in a
      // NEW plan that references the staged subtree.
      val plans = staged.select("*").queryExecution.optimizedPlan
        .collect { case r: InMemoryRelation => r.cachedPlan.toString }
      assert(plans.nonEmpty, "staged frame must be cached")
      plans.mkString("\n")
    }
    // AQE only wraps plans with at least one exchange — probe with an
    // aggregation so the AdaptiveSparkPlan node is observable.
    // Spark 4.1 keeps AQE in every cached plan; what the conf gates at
    // registration is ADAPTIVE_EXECUTION_APPLY_FINAL_STAGE_SHUFFLE_
    // OPTIMIZATIONS inside the cached compile (CacheManager.
    // getOrCloneSessionWithConfigsOff) — observable as the final
    // stage's AQEShuffleRead coalesce once materialized. Probe with an
    // aggregation so there is a final-stage shuffle to optimize.
    val scan = Tables.documents(spark, sfDir).groupBy("source").count()
    // Default registration (session conf true): final-stage shuffle
    // optimizations stay on in the cached plan.
    val default = cachedPlanOf(scan, columnar = false)
    assert(default.contains("AQEShuffleRead"),
      s"default staged frame must keep final-stage shuffle optimizations in its cache:\n$default")
    spark.catalog.clearCache()
    // Explicit columnarCache: registered (and compile-pinned) under
    // conf false — the regime the decade A/B measured 14x cheaper on
    // build-dominated scans (q_substr_dedup 76.3 -> 7.1 s at 500k, r17).
    val columnar = cachedPlanOf(scan, columnar = true)
    assert(!columnar.contains("AQEShuffleRead"),
      s"columnarCache staged frame must compile its cache without final-stage shuffle optimizations:\n$columnar")
    assert(spark.conf.get(key) == "true",
      "the scoped conf must be restored to the session default after the staged persist")
    spark.catalog.clearCache()
  }

  test("scratch conf takes precedence per-session and unsetting restores persist mode") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    assert(Staging.scratchDir(df).isEmpty, "no scratch configured by default in tests")
    spark.conf.set("spark.graft.scratch", "/tmp/somewhere")
    try assert(Staging.scratchDir(df).contains("/tmp/somewhere"))
    finally spark.conf.unset("spark.graft.scratch")
    assert(Staging.scratchDir(df).isEmpty)
  }
}
