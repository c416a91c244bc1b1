package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

/** Asserts the bounded-global-window invariant SURVEY §5 claims and the
  * r17 verdict asked to have PROVEN rather than stated: every `Window`
  * with an EMPTY partition spec in any declared query's optimized plan
  * runs over a deliberately tiny frame (dictionary-sized aggregates,
  * top-k outputs, bucket-count frames) — never over a
  * corpus-proportional one. An unpartitioned window moves its whole
  * input to ONE task (`WindowExec` warns exactly this), so a
  * corpus-scale hit is the classic silent scale-killer: correct at
  * fixture SF, single-task OOM at 100 TB.
  *
  * Evidence is MEASURED, not asserted from reading the code: the spec
  * executes each global window's CHILD subtree (the frame the single
  * task would materialize) and bounds its row count at three corpus
  * scales — both committed fixtures plus, when generated, the 50k-doc
  * decade corpus. The third point is what gives the bound teeth: the
  * construction caps (ShuffleBuckets=1024 blk dictionaries, the
  * 3×1024 tier frame) are UNSATURATED at fixture scale, so fixture
  * counts alone cannot distinguish a capped dictionary from a
  * corpus-proportional frame — at 50k docs a proportional frame
  * (docs/2 = 25k rows) blows the absolute bound outright while every
  * capped frame saturates below it.
  *
  * Known √N family, measured inside the bound at every tested scale
  * and disclosed in the scaladoc at the sites: the dense_rank frames
  * over DISTINCT COUNT VALUES in freqRank/bigramLm quality. k distinct
  * counts need k(k+1)/2 ≤ total occurrences, so the frame is
  * Θ(min(|vocab|, √(2N))) — not constant, but at 10¹³ tokens that is
  * ~4.5M short rows ≈ tens of MB on one task: a disclosed
  * serialization point, not a blow-up (measured here: 35 → 108 rows
  * across a 10× corpus step ≈ the predicted √10).
  */
class WindowBoundSpec extends SparkSpec {

  /** §5's documented bound for "deliberately tiny" single-task frames. */
  val MaxFrame = 4096L

  private def globalWindowFrames(dir: String, name: String): Seq[(String, Long)] = {
    val df = SparkEntry.queries(name)(spark, dir)
    val frames = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w.child
    }
    val counted = frames.zipWithIndex.map { case (child: LogicalPlan, i) =>
      (s"$name#$i", spark.sessionState.executePlan(child).toRdd.count())
    }
    spark.catalog.clearCache()
    counted
  }

  test("every unpartitioned Window frame is ≤4096 rows and does not scale with the corpus") {
    val small = SparkEntry.queries.keys.toSeq.sorted.flatMap(globalWindowFrames(sfDir, _))
    assert(small.nonEmpty, "inventory empty — the plan walk stopped matching Window nodes")
    info(s"${small.size} global-window sites at sf0.001 across ${small.map(_._1.takeWhile(_ != '#')).distinct.size} queries")
    small.foreach { case (site, n) =>
      info(s"  $site: $n rows")
      assert(n <= MaxFrame, s"$site: global window over $n rows at sf0.001 (> $MaxFrame)")
    }
    val smallBySite = small.toMap
    val hitQueries = small.map(_._1.takeWhile(_ != '#')).distinct
    val big = hitQueries.flatMap(globalWindowFrames("/root/testdata/sf0.1", _))
    big.foreach { case (site, n) =>
      val s = smallBySite.getOrElse(site, -1L)
      info(s"  $site: $s rows at sf0.001 -> $n at sf0.1")
      assert(n <= MaxFrame, s"$site: global window over $n rows at sf0.1 (> $MaxFrame)")
    }
  }

  test("global-window frames saturate below the bound at the 50k-doc decade corpus") {
    // The saturation point: at 50k docs every blk/tier dictionary is
    // FULL (1024 / 3072 rows) and a corpus-proportional frame would
    // hold tens of thousands — the scale where the absolute bound
    // separates the two regimes. Runs only when the decade corpus has
    // been generated (scripts/decade.sh gen50k); the fixture-scale
    // bounds above always run.
    val dir = "target/testdata/sf1"
    assume(new java.io.File(s"$dir/documents.parquet").exists(),
      s"decade corpus not generated at $dir")
    // Re-derive the inventory (never a hardcoded list that can go
    // stale), then run each hit against the decade corpus. GenScale
    // generates documents+embeddings only, so queries over the TPC-H
    // tables skip with an info line — today every global-window site
    // lives in a documents/embeddings query, and a future TPC-H-side
    // site still gets its fixture-scale bound from the test above.
    val hitQueries = SparkEntry.queries.keys.toSeq.sorted
      .flatMap(globalWindowFrames(sfDir, _)).map(_._1.takeWhile(_ != '#')).distinct
    val frames = hitQueries.flatMap { q =>
      scala.util.Try(globalWindowFrames(dir, q)) match {
        case scala.util.Success(fs) => fs
        case scala.util.Failure(_) => info(s"  $q: skipped (needs tables GenScale does not emit)"); Nil
      }
    }
    assert(frames.nonEmpty)
    frames.foreach { case (site, n) =>
      info(s"  $site: $n rows at 50k docs")
      assert(n <= MaxFrame, s"$site: global window over $n rows at 50k docs (> $MaxFrame)")
    }
  }
}
