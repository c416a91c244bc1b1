package graft.tools

import org.apache.spark.sql.functions._

/** Phase decomposition of the kNN-graph wall at a given scale: index
  * build (train+assign), probe ranking, candidate join + score, and
  * the native-WindowGroupLimit top-k — so optimization effort lands on
  * the measured dominant term instead of the assumed one.
  */
object KnnPhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = args.headOption.getOrElse("target/testdata/sf1")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val (assignedRaw, idx) = timed("train") {
      val p = graft.similarity.IvfAnn.coarseFor(spark, dir)
      p._2.centroids.count() // force the fit
      p
    }
    val assigned = graft.Staging.staged(assignedRaw, "phase_assigned")
    timed("assign")(assigned.write.format("noop").mode("overwrite").save())
    val probes = timed("probe_rank") {
      val p = graft.Staging.staged(
        graft.similarity.IvfAnn.probeCells(
          spark,
          assigned.select(col("vec_id").as("q_id"), col("e").as("qe"),
            col("norm").as("qn"), col("u")),
          idx),
        "phase_probes")
      p.write.format("noop").mode("overwrite").save()
      p
    }
    val scored = probes
      .join(assigned.select(col("vec_id").as("nbr_id"), col("e").as("ce"),
          col("norm").as("cn"), col("cell").as("cell2")),
        col("cell2") === col("cell") && col("nbr_id") =!= col("q_id"))
      .withColumn("cos", expr("graft_dot(qe, ce)") / (col("qn") * col("cn")))
    timed("join_score")(scored.write.format("noop").mode("overwrite").save())
    timed("topk")(graft.similarity.IvfAnn.topKPerQuery(scored)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
