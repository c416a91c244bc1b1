package graft

import java.nio.file.Files

/** Pins the 100 TB deployment mode of graft.Staging: with
  * `spark.graft.scratch` set, every staged index is written to scratch
  * parquet and re-read instead of persisted to executor storage — and a
  * staged query's rows must be identical in both modes.
  */
class StagingSpec extends SparkSpec {

  test("scratch-parquet staging returns identical rows to persist mode and writes staged dirs") {
    val q = SparkEntry.queries("q_dedup_jaccard_prefix")
    val persistRows = q(spark, sfDir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val dir = Files.createTempDirectory("graft_scratch").toString
    spark.conf.set("spark.graft.scratch", dir)
    try {
      val scratchRows = q(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(scratchRows == persistRows, "scratch mode must not change query results")
      val staged = new java.io.File(dir).listFiles().filter(_.getName.startsWith("stage_"))
      assert(staged.nonEmpty, "scratch mode must write staged parquet dirs")
      assert(staged.forall(d => new java.io.File(d, "_SUCCESS").exists()),
        "every staged dir must be a committed parquet write")
    } finally {
      spark.conf.unset("spark.graft.scratch")
    }
  }

  test("scratch conf takes precedence per-session and unsetting restores persist mode") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    assert(Staging.scratchDir(df).isEmpty, "no scratch configured by default in tests")
    spark.conf.set("spark.graft.scratch", "/tmp/somewhere")
    try assert(Staging.scratchDir(df).contains("/tmp/somewhere"))
    finally spark.conf.unset("spark.graft.scratch")
    assert(Staging.scratchDir(df).isEmpty)
  }
}
