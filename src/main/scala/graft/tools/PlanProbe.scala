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

    // The noop write runs its own QueryExecution — walking
    // df.queryExecution.executedPlan would visit nodes that never ran
    // (all-zero metrics, unexecuted AQE initial plan). Capture the QE
    // the write actually executed via a listener and walk that.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    @volatile var executedQe: Option[QueryExecution] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        executedQe = Some(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        executedQe = Some(qe)
    }
    spark.listenerManager.register(listener)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"WALL: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // listener callbacks are async — poll until the write's QE lands
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (executedQe.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    spark.listenerManager.unregister(listener)

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
    executedQe match {
      case Some(qe) => walk(qe.executedPlan, 0)
      case None =>
        println("WARN: no executed QueryExecution captured; falling back to the " +
          "dataframe's own (possibly unexecuted) plan — metrics may be zero")
        walk(df.queryExecution.executedPlan, 0)
    }
    spark.stop()
  }
}
