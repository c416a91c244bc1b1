package graft.tools

import org.apache.spark.sql.functions._
import graft.similarity.{IvfAnn, Knn}

/** Recall-vs-candidate-volume sweep for the IVF coarse probe — the
  * measured evidence behind the `numProbesFor` policy (VERDICT r17
  * flagged the probe's recall at 0.500 on sf0.1; five queries ride the
  * probe, so the knob is set from a published curve, not a guess).
  *
  * For each sf dir: build the balanced index ONCE, compute the exact
  * brute-force top-k ONCE, then for each nprobe value compute the IVF
  * top-k via the explicit-nprobe `probeCells` overload and report
  * micro-recall@k plus the probed candidate volume (the cost axis — the
  * within-cell exact-scoring rows, which is what actually scales as
  * n·nprobe·n/cells). Output: one `SWEEP` line per (dir, nprobe).
  *
  * Usage: IvfSweep <sfDir> [<sfDir> ...]
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(16)
    for (dir <- args) {
      val (v, q) = IvfAnn.indexOf(spark, Knn.vectors(spark, dir))
      val assigned = graft.Staging.staged(
        q.assign(spark, v).select(col("vec_id"), col("e"), col("norm"), col("cell")),
        "ivf_sweep_assigned")
      val cellSizes = assigned.groupBy("cell").count()
        .agg(max("count").as("mx"), avg("count").as("av")).collect()(0)
      val brute = Knn.bruteTopK(spark, dir)
        .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"INDEX dir=$dir n=${v.count()}%d cells=${q.k}%d " +
        f"maxCell=${cellSizes.getLong(0)}%d avgCell=${cellSizes.getDouble(1)}%.1f" +
        f" currentNprobe=${IvfAnn.numProbesFor(q.k)}%d")
      for (np <- Seq(4, 8, 12, 16, 24, 32, 48, 64).filter(_ <= q.k)) {
        val probes = IvfAnn.probeCells(
          spark,
          v.filter(col("vec_id") < Knn.NumQueries)
            .select(col("vec_id").as("q_id"), col("e").as("qe"),
              col("norm").as("qn"), col("u")),
          q.index, np)
          .select("q_id", "qe", "qn", "cell")
        val scored = probes
          .join(assigned.toDF("nbr_id", "ce", "cn", "cell2"),
            col("cell2") === col("cell") && col("nbr_id") =!= col("q_id"))
        val nCand = scored.count()
        val ivf = IvfAnn.topKPerQuery(
          scored.withColumn("cos", expr("graft_dot(qe, ce)") / (col("qn") * col("cn"))))
          .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = ivf.intersect(brute).size.toDouble / brute.size
        println(f"SWEEP dir=$dir nprobe=$np%d recall=$recall%.4f candidates=$nCand%d")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
