package graft

import org.apache.spark.sql.functions._

/** The refit POLICY loop (r19): ivfDelta publishes the per-cell growth
  * report; `ivfRefit` is the consumer that decides — and, when due in
  * artifacts mode, performs — the scheduled refit the frozen-centroid
  * delta contract defers to. This spec pins (1) the decision
  * arithmetic against the report it consumes, (2) that the standing
  * ingest-slice convention actually crosses the threshold (so the due
  * path is exercised every round, not just in crafted corpora), and
  * (3) the loop itself: threshold crossed → refit → the whole-corpus
  * probe artifacts are committed → a probe consumer SERVES them (no
  * retrain) with results identical to a fresh inline build.
  */
class IvfRefitSpec extends SparkSpec {
  import graft.similarity.IvfAnn

  test("refit decision recomputes from the delta report's own integers and is due on the standing batch slice") {
    spark.catalog.clearCache()
    val report = IvfAnn.ivfDelta(spark, sfDir).collect()
    val settled = report.map(_.getLong(1)).sum
    val batch = report.map(_.getLong(2)).sum
    val growth = batch * 10000 / settled
    val maxCell = report.filter(!_.isNullAt(4)).map(_.getLong(4)).max
    val hot = report.count(r => !r.isNullAt(4) && r.getLong(4) >= IvfAnn.RefitHotCellBp).toLong
    val fresh = report.count(_.getLong(1) == 0).toLong
    val due = growth >= IvfAnn.RefitGrowthBp || hot > 0

    val r = IvfAnn.ivfRefit(spark, sfDir).collect()(0)
    assert(r.getLong(r.fieldIndex("total_settled")) == settled)
    assert(r.getLong(r.fieldIndex("total_batch")) == batch)
    assert(r.getLong(r.fieldIndex("growth_bp")) == growth)
    assert(r.getLong(r.fieldIndex("max_cell_growth_bp")) == maxCell)
    assert(r.getLong(r.fieldIndex("hot_cells")) == hot)
    assert(r.getLong(r.fieldIndex("new_cells")) == fresh)
    assert(r.getBoolean(r.fieldIndex("refit_due")) == due)
    // The ingest-slice convention (1/10 of ids) sits just above the
    // 10% threshold BY DESIGN — the due path runs every round.
    assert(due, s"standing batch slice must cross RefitGrowthBp: growth=$growth")
    spark.catalog.clearCache()
  }

  test("threshold crossed -> refit republishes the probe artifacts -> consumers serve them identically to a fresh build") {
    spark.catalog.clearCache()
    // Fresh inline build (no artifacts root): the parity baseline.
    val baseline = IvfAnn.knnGraph(spark, sfDir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val root = java.nio.file.Files.createTempDirectory("graft_refit_art").toString
    spark.conf.set("spark.graft.artifacts", root)
    try {
      // The policy step runs the refit (due on this corpus, see above).
      IvfAnn.ivfRefit(spark, sfDir).collect(): Unit
      Seq("ivf_centroids", "ivf_assignments").foreach { a =>
        val d = new java.io.File(s"$root/$a")
        assert(d.exists(), s"refit must publish $a")
        val fps = d.listFiles().filter(_.getName.startsWith("fp="))
        assert(fps.nonEmpty && fps.forall(fp => new java.io.File(fp, "_SUCCESS").exists()),
          s"refit's $a publish must be committed")
      }
      spark.catalog.clearCache()
      // The probe consumer now SERVES the refit's artifacts: it must
      // consume both (no retrain) and return the fresh-build answer.
      val consumed = scala.collection.mutable.Set.empty[String]
      graft.sources.Artifacts.onBeforeConsume = (name, _) => { consumed += name: Unit }
      val served =
        try IvfAnn.knnGraph(spark, sfDir).collect().map(_.toSeq).toSeq
        finally graft.sources.Artifacts.onBeforeConsume = (_, _) => ()
      assert(consumed.contains("ivf_centroids") && consumed.contains("ivf_assignments"),
        s"consumer must read the refit-published index, consumed: $consumed")
      assert(served == baseline,
        "index served from the refit's artifacts must equal the fresh inline build")
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
