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

  test("approx percentiles land within half a bucket of the rank-order statistic") {
    // The histogram returns the midpoint of the bucket CONTAINING the
    // ceil(q·n)-th order statistic, so |approx − orderstat| ≤ w/2 with
    // w = ((hi−lo) div B + 1)/100 in value units — assert that exact
    // construction bound per group and percentile. (The interpolated
    // q_percentiles operator differs from the order statistic by up to
    // one inter-value gap at small n, so it is NOT the right yardstick
    // for a tight bound — the order statistic is.)
    val approx = SparkEntry.queries("q_percentiles_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byGroup = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    byGroup.foreach { case (k, vs) =>
      val n = vs.length
      val w = ((math.round(vs.last * 100) - math.round(vs.head * 100)) / operators.Windows.ApproxBuckets + 1) / 100.0
      val (a50, a90, a99) = approx(k)
      def orderStat(num: Long, den: Long): Double = vs(((num * n + den - 1) / den - 1).toInt)
      Seq(("p50", a50, orderStat(1, 2)), ("p90", a90, orderStat(9, 10)),
        ("p99", a99, orderStat(99, 100))).foreach { case (tag, a, e) =>
        assert(math.abs(a - e) <= w / 2 + 0.011,
          s"$k $tag: approx $a vs order-stat $e (w $w, n $n)")
      }
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
    // r17: EMPTY — q_multimodal_pipeline, the last rows-only row,
    // graduated (header bytes re-synthesized from the generator's own
    // hex constants; checksum polynomial rolled in HUGEINT mod-2^64
    // over header + text bytes — BinaryPipeline.pipelineSql).
    val documented = Set.empty[String]
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
    // r17: q_multimodal_pipeline — n_bytes is a per-format constant
    //      header length + utf-8 body length, and the checksum
    //      polynomial replays over header bytes re-synthesized from
    //      the generator's shared hex constants (ascii-guarded).
    // r16: q_percentiles_approx — NOT by replaying Greenwald-Khanna
    //      (whose summary state depends on insertion/merge order and
    //      is provably irreplayable) but by REPLACING the sketch with
    //      a fixed-grid integer bucket histogram: per-bucket counts
    //      are a commutative monoid, so the operator itself became
    //      order-free, deterministic, and exactly replayable.
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
