package graft

import org.apache.spark.sql.functions._

/** Relational / window operator semantics on sf0.001, cross-checked
  * in-engine (the DuckDB oracle gate covers engine-vs-engine; these
  * cover operator-vs-definition).
  */
class OperatorsSpec extends SparkSpec {

  test("q_agg_group totals reconcile with ungrouped totals") {
    val grouped = SparkEntry.queries("q_agg_group")(spark, sfDir)
    val total = grouped.agg(sum("count_order")).head.getLong(0)
    val raw = Tables.lineitem(spark, sfDir).count()
    assert(total == raw, "grouped counts must partition the table")
  }

  test("q_anti_join and q_semi_join partition the part table") {
    val anti = SparkEntry.queries("q_anti_join")(spark, sfDir)
    val semi = SparkEntry.queries("q_semi_join")(spark, sfDir)
    val parts = Tables.part(spark, sfDir).count()
    assert(anti.count() + semi.count() == parts, "anti ∪ semi must cover part exactly")
    assert(anti.count() > 0, "anti join must be non-vacuous")
    assert(
      anti.select("p_partkey").intersect(semi.select("p_partkey")).count() == 0,
      "anti and semi must be disjoint"
    )
  }

  test("q_topk_per_group returns at most 3 rows per segment, ranked") {
    val df = SparkEntry.queries("q_topk_per_group")(spark, sfDir)
    val bad = df.groupBy("c_mktsegment").count().filter(col("count") > 3).count()
    assert(bad == 0)
    val perSeg = df.groupBy("c_mktsegment").agg(collect_list("rn").as("rns")).collect()
    perSeg.foreach(r =>
      assert(r.getSeq[Long](1).sorted == (1L to r.getSeq[Long](1).size), "ranks must be 1..k")
    )
  }

  test("q_streaks: max streaks bounded by event count, positive") {
    val df = SparkEntry.queries("q_streaks")(spark, sfDir)
    val events = Tables.events(spark, sfDir).groupBy("user_id").count()
    val joined = df.join(events, "user_id")
    assert(joined.filter(col("max_win_streak") + col("max_loss_streak") > col("count")).count() == 0)
    assert(df.filter(col("max_win_streak") < 0 || col("max_loss_streak") < 0).count() == 0)
  }

  test("q_sessionize: session event counts sum to total events per user") {
    val sessions = SparkEntry.queries("q_sessionize")(spark, sfDir)
    val perUser = sessions.groupBy("user_id").agg(sum("n_events").as("n"))
    val events = Tables.events(spark, sfDir).groupBy("user_id").count()
    val mismatch = perUser
      .join(events, "user_id")
      .filter(col("n") =!= col("count"))
      .count()
    assert(mismatch == 0, "sessionization must not drop or duplicate events")
  }

  test("q_range_join: every error event appears exactly once") {
    val rj = SparkEntry.queries("q_range_join")(spark, sfDir)
    val errors = Tables.events(spark, sfDir).filter(col("event_type") === "error").count()
    assert(rj.count() == errors)
    assert(rj.select("event_id").distinct().count() == errors)
  }

  test("approx distinct tracks exact within the configured rsd") {
    val exact = SparkEntry.queries("q_distinct_agg")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q_distinct_agg_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.1, s"$k: approx $a vs exact $n")
    }
  }

  test("approx percentiles track exact within tolerance") {
    val exact = SparkEntry.queries("q_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = SparkEntry.queries("q_percentiles_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, p50) =>
      assert(math.abs(approx(k) - p50) / math.max(p50, 1e-9) < 0.05,
        s"$k p50: approx ${approx(k)} vs exact $p50")
    }
  }

  test("q_zscore_normalize: znorm has ~zero mean") {
    val df = SparkEntry.queries("q_zscore_normalize")(spark, sfDir)
    val mean = df.agg(avg("znorm")).head.getDouble(0)
    assert(math.abs(mean) < 1e-3, s"mean znorm should be ~0, got $mean")
  }

  test("q_rollup: grand total row equals table count") {
    val df = SparkEntry.queries("q_rollup")(spark, sfDir)
    val grand = df.filter(col("rname") === "ALL" && col("nname") === "ALL").head.getLong(2)
    assert(grand == Tables.customer(spark, sfDir).count())
  }

  test("driver contract: every oracle key names a query; rows-only set is exactly the documented one") {
    // A typo'd oracle key silently downgrades its query to rows-only in
    // the driver's gate — pin both directions.
    val unknown = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    val documented = Set(
      // The irreducible two (late r15 — everything else graduated):
      //
      // Greenwald-Khanna percentile summaries: the sketch STATE depends
      // on insertion and merge ORDER — unlike HLL registers (replayed,
      // HllOracle) it is not a function of the input SET, so no
      // engine-independent replay can exist; the error-bound spec vs
      // the exact operator stands in:
      "q_percentiles_approx",
      // binary decode (disclosed stub; spec-verified plumbing):
      "q_multimodal_pipeline")
    // Departure log, so each graduation stays auditable:
    // r13: q_doc_fingerprint (rolling hash as HUGEINT recursive CTE).
    // r14: q_dedup_minhash_lsh/q_dedup_simhash (XXH64 replay,
    //      MinHashOracle); q_embed_neardup_lsh/q_ann_lsh (plane table +
    //      order-identical dots, LshOracle).
    // r15: q_bpe_train (bounded-lexicon recursion, BpeTrainOracle);
    //      q_ann_ivf/q_knn_graph/q_semdedup/q_diversity_sample/
    //      q_ann_ivfpq (deterministic KMeansFit + full quantizer
    //      replay, KMeansOracle); q_model_lr/q_model_eval
    //      (rational-sigmoid GD + order-free int64 gradient sums,
    //      ModelOracle); q_distinct_agg_approx (HLL++ registers are an
    //      order-free function of the value set, HllOracle).
    assert(rowsOnly == documented,
      s"rows-only drift: extra=${rowsOnly.diff(documented)} missing=${documented.diff(rowsOnly)}")
  }

  test("driver contract: no oracle-backed query emits nested (array/map/struct) columns") {
    // The driver's compare sorts rows via pandas sort_values over ALL
    // columns; ndarray cells are unhashable and the row ERRs (r8:
    // q_tokenize_bpe, q_pack_boundaries). Nested outputs must be
    // serialized (array_join / array_to_string) on both engine sides.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sfDir).schema
      val nested = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      if (nested.nonEmpty) Some(s"$name(${nested.mkString(",")})") else None
    }
    assert(offenders.isEmpty,
      s"oracle-backed queries with nested output columns (driver gate would ERR): $offenders")
  }

  test("bench aliases really share their target's plan") {
    for ((alias, target) <- Bench.Aliases) {
      assert(SparkEntry.queries.contains(alias) && SparkEntry.queries.contains(target),
        s"alias $alias -> $target must name real queries")
      val a = SparkEntry.queries(alias)(spark, sfDir).queryExecution.analyzed.canonicalized
      val t = SparkEntry.queries(target)(spark, sfDir).queryExecution.analyzed.canonicalized
      assert(a == t, s"$alias is benched as an alias of $target but plans differently")
      spark.catalog.clearCache()
    }
  }
}
