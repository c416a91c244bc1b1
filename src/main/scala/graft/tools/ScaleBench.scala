package graft.tools

/** Reproducible harness for the SURVEY §6 scale-trajectory rows —
  * committed (r15) so the decade measurements stop being ad-hoc scratch
  * mains: same ritual every time (untimed warmup pass that also lands
  * the artifact publishes, then per-query MINIMUM of two timed passes,
  * published-artifacts mode — the production consumer shape, matching
  * graft.Bench's discipline), one JSON line out.
  *
  * Usage:
  *   sbt "runMain graft.tools.ScaleBench <corpusDir> [q1,q2,...]"
  * where corpusDir holds GenScale output (documents.parquet +
  * embeddings.parquet). Default query set = the heavy dedup/ANN family
  * measured across decades.
  */
object ScaleBench {

  val DefaultQueries: Seq[String] = Seq(
    "q_dedup_jaccard_prefix", "q_dedup_clusters", "q_substr_dedup",
    "q_cluster_delta", "q_knn_graph")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/testdata/sf1")
    val names = args.lift(1).filter(_.nonEmpty)
      .map(_.split(",").toSeq).getOrElse(DefaultQueries)
    val spark = graft.GraftSession.local()
    // Optional third arg: comma-list of k=v session confs (e.g. force
    // the distributed CC path with spark.graft.cc.driverEdgeCap=0).
    args.lift(2).foreach(_.split(",").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    val artDir = new java.io.File(s"target/scalebench_artifacts")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (artDir.exists()) rm(artDir)
    spark.conf.set("spark.graft.artifacts", artDir.toString)

    // Per-task shuffle-read ceiling: the evidence that a hot key (a
    // viral window/bucket in adversarial corpora) cannot concentrate a
    // corpus-scale occurrence list on one reducer — the caps bound the
    // per-task maximum, not just the total.
    val maxShuffleRead = new java.util.concurrent.atomic.AtomicLong(0)
    val maxPeakMem = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          maxShuffleRead.accumulateAndGet(m.shuffleReadMetrics.totalBytesRead, Math.max(_, _))
          maxPeakMem.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
        }
      }
    })

    def runOne(name: String): Unit = {
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    // Untimed warmup: JIT/codegen + artifact publishes land here.
    names.foreach(runOne)
    val timings = names.map { name =>
      maxShuffleRead.set(0); maxPeakMem.set(0)
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        runOne(name)
        (System.nanoTime() - t0) / 1e9
      }.min
      (name, t, maxShuffleRead.get, maxPeakMem.get)
    }
    val qj = timings.map { case (n, t, _, _) => s""""$n": ${f"$t%.3f"}""" }.mkString(", ")
    val sj = timings.map { case (n, _, s, p) =>
      s""""$n": {"max_task_shuffle_read_mb": ${f"${s / 1048576.0}%.1f"}, "max_task_peak_mem_mb": ${f"${p / 1048576.0}%.1f"}}"""
    }.mkString(", ")
    println(s"""{"dir": "$dir", "queries": {$qj}, "task_ceilings": {$sj}}""")
    spark.stop()
  }
}
