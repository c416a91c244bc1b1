package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.Artifacts

/** Retention half of the artifacts contract (r16): fingerprint-keyed
  * directories accumulate as inputs change, so a deployment prunes —
  * keep the latest N commits, never an in-flight staging dir — and a
  * consumer that loses its directory to a racing prune must fall back
  * to a loud recompute, never an opaque reader failure. The race
  * windows are driven with the same injected-interleaving discipline as
  * `ArtifactsRaceSpec`, via the `onBeforeConsume` hook that sits in the
  * exact commit-check → schema-read gap the fallback defends.
  */
class ArtifactsPruneSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_art_prune").toString

  private def computeDf = {
    import spark.implicits._
    (1L to 100L).map(i => (i, i * 2)).toDF("k", "v")
  }

  private def withRoot[A](root: String)(f: => A): A = {
    spark.conf.set("spark.graft.artifacts", root)
    try f
    finally spark.conf.unset("spark.graft.artifacts")
  }

  private def publish(name: String, version: String): Long =
    Artifacts.publishedOrCompute(
      spark, name, version, Seq(s"$sfDir/region.parquet"))(computeDf)
      .agg(sum("v")).first().getLong(0)

  private def fpDirs(root: String, name: String): Seq[String] =
    Option(new java.io.File(s"$root/$name").listFiles())
      .map(_.map(_.getName).toSeq.sorted).getOrElse(Nil)

  test("pruneKeepLatest keeps the N most recently committed fingerprints by commit time") {
    val root = freshRoot()
    withRoot(root) {
      for (v <- Seq("v1", "v2", "v3")) assert(publish("ret_tbl", v) == 10100L)
      // Commit recency is the marker mtime; pin distinct instants so the
      // ordering under test is the one the sweep actually sorts on
      // (three sub-millisecond publishes could otherwise tie).
      val fps = Seq("v1", "v2", "v3")
        .map(v => Artifacts.fingerprint(spark, v, Seq(s"$sfDir/region.parquet")))
      fps.zipWithIndex.foreach { case (fp, i) =>
        val marker = new java.io.File(s"$root/ret_tbl/fp=$fp", "_SUCCESS")
        assert(marker.setLastModified(1000000L + i * 60000L))
      }
      assert(Artifacts.pruneKeepLatest(spark, "ret_tbl", 2) == 1)
      assert(fpDirs(root, "ret_tbl") == Seq(s"fp=${fps(1)}", s"fp=${fps(2)}").sorted,
        "the oldest commit must be the one retired")
      // idempotent: nothing left over the retention count
      assert(Artifacts.pruneKeepLatest(spark, "ret_tbl", 2) == 0)
    }
  }

  test("prune never touches an in-flight staging dir; crashed marker-less dirs are eligible") {
    val root = freshRoot()
    withRoot(root) {
      assert(publish("ret_tbl", "v1") == 10100L)
      // A concurrent producer is mid-write:
      val staging = new java.io.File(s"$root/ret_tbl/.staging-ffff-cafebabe")
      assert(staging.mkdirs())
      Files.writeString(staging.toPath.resolve("part-inflight.parquet"), "half")
      // And an old producer crashed after a premature rename:
      val crashed = new java.io.File(s"$root/ret_tbl/fp=deadbeefdeadbeef")
      assert(crashed.mkdirs())
      Files.writeString(crashed.toPath.resolve("part-garbage.parquet"), "junk")
      assert(Artifacts.pruneKeepLatest(spark, "ret_tbl", 1) == 1,
        "exactly the crashed dir is stale (committed dir within retention)")
      val left = fpDirs(root, "ret_tbl")
      assert(left.exists(_.startsWith(".staging-")),
        s"in-flight staging dir must survive every prune, got $left")
      assert(!left.contains("fp=deadbeefdeadbeef"), "crashed dir must be retired")
      assert(left.count(_.startsWith("fp=")) == 1)
      // keepFp flavor inherits the same guard
      val keep = Artifacts.fingerprint(spark, "v1", Seq(s"$sfDir/region.parquet"))
      assert(Artifacts.prune(spark, "ret_tbl", keep) == 0)
      assert(fpDirs(root, "ret_tbl").exists(_.startsWith(".staging-")))
    }
  }

  test("consumer racing a prune of its dir recomputes loudly and republishes") {
    val root = freshRoot()
    withRoot(root) {
      assert(publish("race_prune", "v1") == 10100L)
      val fp = Artifacts.fingerprint(spark, "v1", Seq(s"$sfDir/region.parquet"))
      val dir = new Path(Artifacts.artifactPath(root, "race_prune", fp))
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var fired = 0
      // Interleave the prune into the commit-check → read window, once.
      Artifacts.onBeforeConsume = (name, _) =>
        if (name == "race_prune" && fired == 0) { fired += 1; fs.delete(dir, true): Unit }
      try {
        assert(publish("race_prune", "v1") == 10100L,
          "racing consumer must serve correct rows via the recompute path")
      } finally Artifacts.onBeforeConsume = (_, _) => ()
      assert(fired == 1, "injected prune did not fire — window not exercised")
      assert(new java.io.File(Artifacts.artifactPath(root, "race_prune", fp), "_SUCCESS").exists(),
        "the loud recompute must republish the artifact")
      // and the republished artifact serves the next consumer normally
      assert(publish("race_prune", "v1") == 10100L)
    }
  }

  test("retention racing even the fresh publish: computed plan served inline, rows correct") {
    val root = freshRoot()
    withRoot(root) {
      val fp = Artifacts.fingerprint(spark, "v1", Seq(s"$sfDir/region.parquet"))
      val dir = new Path(Artifacts.artifactPath(root, "degenerate", fp))
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // A pathological sweeper (keepLatest=0 misconfiguration) deletes
      // the dir EVERY time a consumer reaches the read window — the
      // read-back after republish loses too, so the contract's last
      // resort is the computed plan itself.
      Artifacts.onBeforeConsume = (name, _) =>
        if (name == "degenerate") fs.delete(dir, true): Unit
      try {
        assert(publish("degenerate", "v1") == 10100L,
          "correctness must not depend on retention policy")
      } finally Artifacts.onBeforeConsume = (_, _) => ()
    }
  }

  test("pruneAll sweeps every artifact name under the root with one retention count") {
    val root = freshRoot()
    withRoot(root) {
      for (n <- Seq("a_tbl", "b_tbl"); v <- Seq("v1", "v2")) assert(publish(n, v) == 10100L)
      // distinct commit instants per name (same rationale as above)
      for (n <- Seq("a_tbl", "b_tbl")) {
        Seq("v1", "v2").zipWithIndex.foreach { case (v, i) =>
          val fp = Artifacts.fingerprint(spark, v, Seq(s"$sfDir/region.parquet"))
          assert(new java.io.File(s"$root/$n/fp=$fp", "_SUCCESS")
            .setLastModified(2000000L + i * 60000L))
        }
      }
      val removed = Artifacts.pruneAll(spark, keepLatest = 1)
      assert(removed == Map("a_tbl" -> 1, "b_tbl" -> 1), s"got $removed")
      val keep = Artifacts.fingerprint(spark, "v2", Seq(s"$sfDir/region.parquet"))
      for (n <- Seq("a_tbl", "b_tbl"))
        assert(fpDirs(root, n) == Seq(s"fp=$keep"), s"$n: ${fpDirs(root, n)}")
    }
  }
}
