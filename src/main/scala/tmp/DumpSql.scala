package tmp
object DumpSql {
  def main(args: Array[String]): Unit = {
    val out = new java.io.File("/tmp/kmsql"); out.mkdirs()
    def w(n: String, s: String) = {
      val p = new java.io.PrintWriter(s"/tmp/kmsql/$n.sql"); p.print(s); p.close()
    }
    w("semdedup", graft.similarity.KMeansOracle.semdedupSql)
    w("ann_ivf", graft.similarity.KMeansOracle.annIvfSql)
    w("knn_graph", graft.similarity.KMeansOracle.knnGraphSql)
    w("diversity", graft.similarity.KMeansOracle.diversitySql)
    w("ann_ivfpq", graft.similarity.KMeansOracle.annIvfPqSql)
    w("model_lr", graft.operators.ModelOracle.trainPredictSql)
    w("model_eval", graft.operators.ModelOracle.evalSql)
    w("hll", graft.operators.HllOracle.sql)
    // fresh engine outputs for the model family
    val spark = graft.GraftSession.local(8)
    graft.operators.Model.trainPredict(spark, "/root/testdata/sf0.01").write.mode("overwrite").parquet("/tmp/kmsql/eng_model_lr")
    graft.operators.Model.evalTable(spark, "/root/testdata/sf0.01").write.mode("overwrite").parquet("/tmp/kmsql/eng_model_eval")
  }
}
