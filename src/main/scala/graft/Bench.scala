package graft
/** Per-round benchmark. Materializes each query with a noop-format write
  * (a `.count()` lets Catalyst drop final sorts and prune projected
  * expressions — much of the work would never execute), runs one untimed
  * warmup pass so JVM/codegen warmup isn't charged to the first query in
  * map order, takes the per-query MINIMUM of two timed passes (the
  * machine shares a host; min-of-k is the standard defense against
  * transient contention), and reports failures as -1 rather than a fake
  * timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    def runOne(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] FAILED $name: $e"); false
      }
    // Warmup: full untimed pass (JIT + codegen caches + parquet footers).
    SparkEntry.queries.foreach { case (name, fn) => runOne(name, fn) }
    def timedPass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = runOne(name, fn)
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val p1 = timedPass()
    val p2 = timedPass()
    val results = SparkEntry.queries.keys.map { name =>
      val (a, b) = (p1(name), p2(name))
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A failed query poisons the headline total (-1): summing only the
    // survivors would let a round "speed up" by breaking a slow query.
    val total = if (results.values.exists(_ < 0)) -1.0 else results.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
