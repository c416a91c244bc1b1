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
  }
}
