package graft.tools

/** Measurement tool (r19 optimization round): dump `explain("formatted")`
  * for every declared query to one file per query, plus a one-line
  * plan-shape summary (Exchange count, join strategies, codegen spans)
  * to stdout. Plans are the PRE-execution formatted plans (AQE initial)
  * — the judge-checkable artifact `plans/r19/<q>_{before,after}.txt`
  * asks for exactly this shape. Usage:
  *   runMain graft.tools.ExplainDump <sfDir> <outDir> [q1,q2,...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = new java.io.File(args.lift(1).getOrElse("/tmp/plans"))
    out.mkdirs()
    val only = args.lift(2).map(_.split(",").toSet)
    val spark = graft.GraftSession.local()
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(new java.io.File(out, s"$n.txt"))
        try w.write(plan) finally w.close()
        def c(s: String) = plan.split('\n').count(_.contains(s))
        // exchange = real exchanges only (ReusedExchange lines also
        // contain "Exchange" and would inflate the count, r19 advice)
        println(s"SHAPE $n exchange=${c("Exchange") - c("ReusedExchange")} reused=${c("ReusedExchange")} " +
          s"smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")} shj=${c("ShuffledHashJoin")} " +
          s"bnlj=${c("BroadcastNestedLoopJoin")} cart=${c("CartesianProduct")} " +
          s"wscg=${c("WholeStageCodegen")} scan=${c("Scan parquet")} imr=${c("InMemoryTableScan")}")
      } catch {
        case e: Throwable => println(s"SHAPE $n ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      } finally {
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
