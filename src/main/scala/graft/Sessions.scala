package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory. Local defaults mirror what a cluster
  * deployment would set per-job: AQE on (runtime coalesce + skew-join
  * splitting), shuffle partitions sized to the local core count rather
  * than the 200 default.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
