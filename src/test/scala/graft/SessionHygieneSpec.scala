package graft

/** Permanent tripwire for the r12 checkpoint-leak class: a
  * checkpoint-heavy query (the CC loop localCheckpoints per round) must
  * leave ZERO residual persisted blocks once the harness's per-query
  * `clearCache()` has run — `Staging.releaseCheckpoint` exists because
  * local-checkpoint blocks are not CacheManager entries and would
  * otherwise survive for the session's lifetime, taxing every later
  * query (~1.3-1.4× measured in r12). The spec runs the same cleanup
  * ritual Verify/Bench run, then audits the BlockManager directly and
  * re-times a cheap probe query against its pre-leak floor.
  */
class SessionHygieneSpec extends SparkSpec {

  private def runAs(name: String): Unit = {
    // Exactly the harness shape: materialize, then clearCache.
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
  }

  private def probeSecs(): Double =
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      SparkEntry.queries("q_agg_group")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

  test("checkpoint-heavy queries leave no residual persisted RDDs and no probe slowdown") {
    spark.catalog.clearCache()
    // Blocks left by OTHER suites sharing this JVM are not ours to
    // adjudicate — snapshot and exclude them.
    val pre = spark.sparkContext.getPersistentRDDs.keySet
    runAs("q_agg_group") // warmup (JIT/codegen)
    val before = probeSecs()
    // The checkpoint-heavy family: CC loop (per-round localCheckpoints),
    // delta CC over super-edges, plus the staging-heavy prefix index.
    Seq("q_dedup_clusters", "q_cluster_delta", "q_dedup_jaccard_prefix")
      .foreach(runAs)
    val residual = spark.sparkContext.getPersistentRDDs.filterNot {
      case (id, _) => pre.contains(id)
    }
    assert(residual.isEmpty,
      s"residual persisted RDDs after harness cleanup: " +
        residual.map { case (id, r) => s"$id:${r.name}(${r.getStorageLevel})" }.mkString(", "))
    val after = probeSecs()
    assert(after <= before * 1.5 + 0.5,
      f"probe query slowed after checkpoint-heavy queries: $before%.2fs -> $after%.2fs")
  }
}
