package graft.similarity
object DiagY {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = "target/testdata/g50k"
    spark.conf.set("spark.graft.artifacts", "target/diag_artifacts")
    def t[A](n: String)(f: => A): A = { val t0 = System.nanoTime; val r = f; println(s"DIAG $n: ${(System.nanoTime-t0)/1e9} s"); r }
    t("warmup knnGraph (publishes)"){ IvfAnn.knnGraph(spark, dir).write.format("noop").mode("overwrite").save() }
    spark.catalog.clearCache()
    t("timed knnGraph full"){ IvfAnn.knnGraph(spark, dir).write.format("noop").mode("overwrite").save() }
    spark.catalog.clearCache()
    // piecewise
    val (assignedRaw, idx) = t("coarseFor"){ IvfAnn.coarseFor(spark, dir) }
    val assigned = t("stage assigned"){ val a = graft.Staging.staged(assignedRaw, "diag_asg"); a.count(); a }
    val probes = IvfAnn.probeCells(spark,
      assigned.select(org.apache.spark.sql.functions.col("vec_id").as("q_id"),
        org.apache.spark.sql.functions.col("e").as("qe"),
        org.apache.spark.sql.functions.col("norm").as("qn"),
        org.apache.spark.sql.functions.col("u")), idx)
    t("probes count"){ println("DIAG nprobes=" + probes.count()) }
    val scored = probes.select("q_id","qe","qn","cell")
      .join(assigned.select(
        org.apache.spark.sql.functions.col("vec_id").as("nbr_id"),
        org.apache.spark.sql.functions.col("e").as("ce"),
        org.apache.spark.sql.functions.col("norm").as("cn"),
        org.apache.spark.sql.functions.col("cell").as("cell2")),
        org.apache.spark.sql.functions.col("cell2") === org.apache.spark.sql.functions.col("cell") &&
        org.apache.spark.sql.functions.col("nbr_id") =!= org.apache.spark.sql.functions.col("q_id"))
    t("candidates count"){ println("DIAG ncand=" + scored.count()) }
    spark.stop()
  }
}
