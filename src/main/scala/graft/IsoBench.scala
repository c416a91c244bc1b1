package graft

/** Isolated per-query re-measure harness: warmup + min-of-3 for each
  * named query, published-artifacts mode, one query at a time.
  *
  * The full `Bench` measures every query in one session; when a line
  * there looks regressed, this answers "is it the plan or the host?"
  * without the cross-query contamination a shared run can suffer
  * (r11's committed bench recorded 45.5 s for a query that measures
  * 1.7–2.1 s isolated — min-of-k inside one loaded session is not a
  * defense against a systematically loaded session).
  *
  * Usage: `runMain graft.IsoBench q_cluster_delta q_knn_graph` with
  * `SPARK_GRAFT_SF_DIR` set (defaults to sf0.1).
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Args of the form k=v are session-conf overrides (set before any
    // plan compiles), everything else is a query name — the A/B lever
    // for conf experiments on a warm min-of-3 (r19).
    val (confs, names) = args.partition(_.contains("="))
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      System.setProperty(k, v)
    }
    val spark = graft.GraftSession.local()
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      // Loud application (r19 advice): a silently-failed override makes
      // an A/B read as "no effect" — print the effective value and warn
      // when it differs from the requested one.
      try {
        spark.conf.set(k, v)
        val eff = spark.conf.getOption(k).getOrElse("<unset>")
        if (eff == v) println(s"CONF $k=$eff")
        else println(s"CONF WARNING $k requested=$v effective=$eff")
      } catch {
        case e: Exception => println(s"CONF WARNING $k=$v FAILED TO SET: ${e.getMessage}")
      }
    }
    val artDir = new java.io.File("target/iso_artifacts")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (artDir.exists()) rm(artDir)
    spark.conf.set("spark.graft.artifacts", artDir.toString)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      run() // warmup (JIT + codegen + artifact publish, untimed)
      val ts = (1 to 3).map(_ => run())
      println(f"ISO $name%-24s min=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
