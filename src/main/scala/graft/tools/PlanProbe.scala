package graft.tools

/** Scratch diagnostic: run one query once and print every executed
  * plan node with its populated SQL metrics (rows, bytes), walking
  * into AQE query stages — the instrument for attributing which
  * exchange inflates at a decade point (r16 third-decade work).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/d50k")
    val name = args.lift(1).getOrElse("q_dedup_jaccard_prefix")
    args.lift(2).foreach(_.split(",").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      // set before session spin-up via system props so core confs apply
      System.setProperty(k, v)
    })
    val spark = graft.GraftSession.local()
    args.lift(2).foreach(_.split(",").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      try spark.conf.set(k, v) catch { case _: Exception => () }
    })
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"WALL: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val seen = new java.util.IdentityHashMap[SparkPlan, Boolean]()
    def walk(p: SparkPlan, depth: Int): Unit = {
      if (seen.containsKey(p)) return
      seen.put(p, true)
      val interesting = p.metrics.filter { case (k, m) =>
        m.value > 0 && (k.contains("numOutputRows") || k.contains("dataSize") ||
          k.contains("shuffleBytesWritten") || k.contains("bytesWritten") ||
          k.contains("recordsWritten") || k.contains("spillSize") ||
          k.contains("numPartitions") || k.contains("peakMemory"))
      }
      val ms = interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
      println("  " * depth + p.nodeName + (if (ms.nonEmpty) s"  [$ms]" else ""))
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: QueryStageExec => walk(q.plan, depth + 1)
        case im: InMemoryTableScanExec =>
          im.relation.cachedPlan match { case cp => walk(cp, depth + 1) }
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
