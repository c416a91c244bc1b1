package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.Artifacts

/** Race matrix for the staging-dir + rename publish protocol (r15):
  * the deployment story claims last-writer-wins atomicity — a committed
  * `fp=` directory is never mutated in place, a loser's staging bytes
  * are discarded, a crashed (marker-less) publish is invisible to
  * consumers and repaired by the next producer. Each scenario here
  * injects one interleaving and pins the observable contract.
  */
class ArtifactsRaceSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_art_race").toString

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def computeDf = {
    import spark.implicits._
    (1L to 100L).map(i => (i, i * 2)).toDF("k", "v")
  }

  private def publish(root: String): org.apache.spark.sql.DataFrame = {
    spark.conf.set("spark.graft.artifacts", root)
    try Artifacts.publishedOrCompute(
      spark, "race_tbl", "v1", Seq(s"$sfDir/region.parquet"))(computeDf)
    finally spark.conf.unset("spark.graft.artifacts")
  }

  test("two concurrent publishers: both read correct rows, one committed dir, no staging residue") {
    val root = freshRoot()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // Both threads race the same fingerprint. conf is session-global, so
    // set it once outside the race instead of per-thread.
    spark.conf.set("spark.graft.artifacts", root)
    val fps = try {
      val fut = Future.sequence((1 to 2).map(_ => Future {
        Artifacts.publishedOrCompute(
          spark, "race_tbl", "v1", Seq(s"$sfDir/region.parquet"))(computeDf)
          .agg(sum("v")).first().getLong(0)
      }))
      Await.result(fut, 120.seconds)
    } finally spark.conf.unset("spark.graft.artifacts")
    assert(fps.forall(_ == 10100L), s"racers read $fps")
    val tblDir = new java.io.File(s"$root/race_tbl")
    val children = tblDir.listFiles().map(_.getName).toSeq
    assert(children.count(_.startsWith("fp=")) == 1,
      s"expected exactly one committed fingerprint dir, got $children")
    assert(!children.exists(_.startsWith(".staging-")),
      s"loser's staging dir must be discarded, got $children")
    assert(new java.io.File(tblDir, children.find(_.startsWith("fp=")).get + "/_SUCCESS").exists())
  }

  test("crashed publish (marker-less fp= dir) is repaired by the next producer") {
    val root = freshRoot()
    // Fabricate the crash: a destination directory with partial bytes
    // and NO _SUCCESS — exactly what a producer dying between parquet
    // task commits and job commit leaves after a premature rename.
    val fp = Artifacts.fingerprint(spark, "v1", Seq(s"$sfDir/region.parquet"))
    val crashed = new java.io.File(Artifacts.artifactPath(root, "race_tbl", fp))
    assert(crashed.mkdirs())
    Files.writeString(crashed.toPath.resolve("part-garbage.parquet"), "not parquet")
    val got = publish(root).agg(sum("v")).first().getLong(0)
    assert(got == 10100L, "repaired artifact must serve the recomputed rows")
    assert(new java.io.File(crashed, "_SUCCESS").exists(), "repair must commit")
    assert(!new java.io.File(crashed, "part-garbage.parquet").exists(),
      "crashed bytes must not survive inside the committed dir")
  }

  test("consumer during publish: in-flight staging is invisible; committed dir is never mutated") {
    val root = freshRoot()
    val fp = Artifacts.fingerprint(spark, "v1", Seq(s"$sfDir/region.parquet"))
    // A foreign producer's staging dir is in flight:
    val staging = new java.io.File(s"$root/race_tbl/.staging-$fp-deadbeef")
    assert(staging.mkdirs())
    Files.writeString(staging.toPath.resolve("part-inflight.parquet"), "half-written")
    // A consumer arriving now must not read it — it computes + publishes
    // its own copy and the staging dir is simply ignored.
    val got = publish(root).agg(sum("v")).first().getLong(0)
    assert(got == 10100L)
    val committedDir = new java.io.File(Artifacts.artifactPath(root, "race_tbl", fp))
    assert(new java.io.File(committedDir, "_SUCCESS").exists())
    // Committed content is immutable thereafter: a second publish call
    // must leave every file untouched (same names, same mtimes).
    val before = committedDir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    val again = publish(root).agg(sum("v")).first().getLong(0)
    assert(again == 10100L)
    val after = committedDir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "committed fp= dir was mutated by a repeat publish")
  }

  test("losing the rename race discards the loser's bytes, keeps the winner's") {
    val root = freshRoot()
    // Winner commits first.
    val first = publish(root).agg(sum("v")).first().getLong(0)
    assert(first == 10100L)
    val fp = Artifacts.fingerprint(spark, "v1", Seq(s"$sfDir/region.parquet"))
    val committedDir = new Path(Artifacts.artifactPath(root, "race_tbl", fp))
    val files = fs.listStatus(committedDir).map(s => s.getPath.getName -> s.getModificationTime).toMap
    // Loser: same fingerprint, arrives after the winner's commit (the
    // post-compute exists-check branch). Its publish must be a pure read.
    val second = publish(root).agg(sum("v")).first().getLong(0)
    assert(second == 10100L)
    val filesAfter = fs.listStatus(committedDir).map(s => s.getPath.getName -> s.getModificationTime).toMap
    assert(filesAfter == files)
  }
}
