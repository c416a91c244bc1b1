package graft

import org.apache.spark.sql.functions._

/** Incremental coarse-index maintenance (r17): the delta merge's
  * full-re-assignment contract, the published-mode no-refit shape, and
  * the report's integer arithmetic. The DuckDB oracle
  * (`KMeansOracle.ivfDeltaSql`) re-proves the contract cross-engine
  * every round; this spec pins it inline plus the plan shape the
  * oracle can't see.
  */
class IvfDeltaSpec extends SparkSpec {
  import graft.similarity.IvfAnn
  import graft.dedup.Dedup.{DeltaBatchMod, DeltaBatchRem}

  private def reportOf(asg: org.apache.spark.sql.DataFrame) =
    asg
      .withColumn("is_batch", pmod(col("vec_id"), lit(DeltaBatchMod)) === DeltaBatchRem)
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(
        count(when(!col("is_batch"), 1)).as("n_settled"),
        count(when(col("is_batch"), 1)).as("n_batch"),
        count(lit(1)).as("n_total"))
      .withColumn("growth_bp",
        when(col("n_settled") > 0, expr("(n_batch * 10000) div n_settled")))

  test("ivfDelta: merged membership equals full re-assignment against the frozen settled centroids") {
    spark.catalog.clearCache()
    val all = IvfAnn.stagedUnit(
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
        .withColumn("norm", sqrt(expr("graft_dot(e, e)"))))
    val isBatch = pmod(col("vec_id"), lit(DeltaBatchMod)) === DeltaBatchRem
    val quant = IvfAnn.balancedQuantizerOf(spark, all.filter(!isBatch))
    val full = reportOf(quant.assign(spark, all).select(col("vec_id"), col("cell")))
      .collect().map(_.toSeq).toSet
    val delta = IvfAnn.ivfDelta(spark, sfDir).collect()
    assert(delta.map(_.toSeq).toSet == full,
      "delta-merged per-cell report must equal the full re-assignment")
    // Conservation: every vector lands in exactly one cell.
    val nAll = all.count()
    val nBatch = all.filter(isBatch).count()
    assert(delta.map(_.getLong(3)).sum == nAll, "n_total conservation")
    assert(delta.map(_.getLong(2)).sum == nBatch, "n_batch conservation")
    // The refit-trigger arithmetic recomputes from its own integers.
    delta.foreach { r =>
      if (r.getLong(1) > 0)
        assert(r.getLong(4) == r.getLong(2) * 10000 / r.getLong(1), s"growth_bp: $r")
      else assert(r.isNullAt(4), s"growth_bp must be NULL for settled-empty cells: $r")
    }
    spark.catalog.clearCache()
  }

  test("published mode: quantizer structure published once, delta re-run assigns only the batch") {
    spark.catalog.clearCache()
    val inline = IvfAnn.ivfDelta(spark, sfDir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val root = java.nio.file.Files.createTempDirectory("graft_ivf_art").toString
    spark.conf.set("spark.graft.artifacts", root)
    try {
      val published = IvfAnn.ivfDelta(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(published == inline, "published-mode merge differs from inline")
      // The deployable state is all there: routing structure, not just
      // the probe-facing centroid table.
      Seq("ivf_settled_base", "ivf_settled_planes", "ivf_settled_remap",
        "ivf_settled_centroids", "ivf_settled_assignments").foreach { a =>
        assert(new java.io.File(s"$root/$a").exists(), s"$a not published")
      }
      spark.catalog.clearCache()
      val again = IvfAnn.ivfDelta(spark, sfDir)
      assert(again.collect().map(_.toSeq).toSeq == inline)
      // The re-run consumes the committed settled assignments; the only
      // corpus work left is the batch slice's assignment pass.
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val scans = again.queryExecution.analyzed.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.mkString(",")
          case _ => ""
        }
      }
      assert(scans.exists(_.contains("ivf_settled_assignments")),
        s"re-run must consume the published settled assignments; scans: $scans")
      assert(scans.exists(_.contains("embeddings.parquet")),
        "batch slice still reads the corpus")
      // No settled-slice re-assignment: the settled side is a published
      // read, so no Filter in the plan may carry the negated batch
      // predicate NOT(pmod(vec_id, m) = r). Asserted on the analyzed
      // TREE (a rendered-string match breaks on any plan-print change).
      import org.apache.spark.sql.catalyst.expressions.{EqualTo, Not, Pmod}
      import org.apache.spark.sql.catalyst.plans.logical.Filter
      val settledFilters = again.queryExecution.analyzed.collect {
        case f: Filter if f.condition.exists {
          case Not(EqualTo(p: Pmod, _)) => true
          case _ => false
        } => f
      }
      assert(settledFilters.isEmpty,
        s"settled slice must come from the published index, not a re-assignment: $settledFilters")

      // Mixed hit/miss reconstruction: prune ONE artifact (the planes)
      // and re-run — the recomputed piece must splice consistently with
      // the published rest, which is only true because the fit is a
      // pure function of the fingerprinted inputs (the determinism
      // contract `settledQuantizerFor`'s scaladoc pins).
      def rmRec(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmRec)
        f.delete(): Unit
      }
      rmRec(new java.io.File(s"$root/ivf_settled_planes"))
      spark.catalog.clearCache()
      val mixed = IvfAnn.ivfDelta(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(mixed == inline, "partially-pruned artifact set must reconstruct identically")
    } finally {
      spark.conf.unset("spark.graft.artifacts")
      spark.catalog.clearCache()
      def rmRec(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmRec)
        f.delete(): Unit
      }
      rmRec(new java.io.File(root))
    }
  }
}
