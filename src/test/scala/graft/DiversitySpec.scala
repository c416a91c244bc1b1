package graft

import org.apache.spark.sql.functions._

/** Diversity sampling: fixed-budget, every-cell coverage, deterministic,
  * and measurably more spread out than a crawl-order prefix.
  */
class DiversitySpec extends SparkSpec {

  test("diversitySample respects quotas, covers every cell, and is deterministic") {
    val out = SparkEntry.queries("q_diversity_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.nonEmpty && out.length <= n.toInt)
    // budget respected up to the per-cell floor of 1 (empty cells add
    // nothing; tiny cells can push the total past the nominal budget)
    val cells = out.map(_._2).distinct.length
    assert(out.length <= graft.similarity.Diversity.Budget + cells,
      s"selection blew the budget: ${out.length} picks, $cells cells")
    // within-cell ranks are dense from 1 (most-representative first)
    out.groupBy(_._2).foreach { case (c, rows) =>
      val rs = rows.map(_._3).sorted.toSeq
      assert(rs == (1L to rs.length).toSeq, s"cell $c ranks not dense: $rs")
    }
    // every NON-EMPTY cell of the assignment is represented: the quota
    // floor is 1, so coverage must be total
    spark.catalog.clearCache()
    val again = SparkEntry.queries("q_diversity_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq, "selection is not deterministic across rebuilds")
  }

  test("diversitySample ranks most-representative first within each cell") {
    // Output-only invariant: centroid_dot must be non-increasing along
    // the within-cell rank walk (rank 1 IS the cell's representative).
    val out = SparkEntry.queries("q_diversity_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.groupBy(_._1).foreach { case (c, rows) =>
      val walk = rows.sortBy(_._2).map(_._3)
      assert(walk.zip(walk.tail).forall { case (a, b) => a >= b },
        s"cell $c: centroid_dot increases along the rank walk")
    }
  }

  test("diversitySample flattens density on planted imbalanced clusters") {
    import spark.implicits._
    // The real embeddings are isotropic (no cluster structure —
    // verified), so the density-flattening claim is pinned on planted
    // data: a dense cluster (600 points) and a sparse one (60), tight
    // around orthogonal centers. The selection must pick the sparse
    // cluster at a HIGHER RATE than the dense one (√-quota flattening)
    // and spread picks wider than a crawl-order prefix, which drowns in
    // the dense cluster.
    val rnd = new scala.util.Random(11)
    val dim = 16
    def point(center: Int, id: Long): (Long, Array[Double]) = {
      val v = Array.tabulate(dim)(i =>
        (if (i == center) 4d else 0d) + rnd.nextGaussian() * 0.3)
      (id, v)
    }
    val rows = (0L until 600L).map(point(0, _)) ++ (600L until 660L).map(point(1, _))
    val vectors = rows.toDF("vec_id", "e")
      .withColumn("norm", org.apache.spark.sql.functions.sqrt(
        org.apache.spark.sql.functions.expr("graft_dot(e, e)")))
    val picks = graft.similarity.Diversity.diversitySampleOf(spark, vectors)
      .collect().map(_.getLong(0))
    val dense = picks.count(_ < 600L).toDouble
    val sparse = picks.count(_ >= 600L).toDouble
    assert(sparse > 0, "sparse cluster got no picks")
    val denseRate = dense / 600d
    val sparseRate = sparse / 60d
    assert(sparseRate > denseRate,
      s"no density flattening: sparse rate $sparseRate <= dense rate $denseRate")
    // diversity vs crawl order: mean pairwise cosine of the selection
    // must undercut a prefix of the same size (the prefix is all-dense,
    // so its vectors are mutually near-parallel)
    val unitOf = rows.toMap.view.mapValues { v =>
      val nrm = math.sqrt(dot2(v, v)); v.map(_ / nrm)
    }.toMap
    def meanPairCos(ids: Seq[Long]): Double = {
      val us = ids.map(unitOf)
      val pairs = for (i <- us.indices; j <- (i + 1) until us.length) yield dot2(us(i), us(j))
      pairs.sum / pairs.length
    }
    val sel = picks.toSeq.sorted
    val prefix = (0L until sel.length.toLong).toSeq
    assert(meanPairCos(sel) < meanPairCos(prefix),
      s"selection not more spread than the crawl prefix")
  }

  private def dot2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0d; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
