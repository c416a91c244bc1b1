package graft

import graft.sources.PullIngest
import graft.sources.PullIngest.Limit
import org.apache.spark.sql.functions._

/** The throttled pull-ingestion front door: greedy multi-window
  * scheduling per API key (no window of any limit ever over-issues),
  * transient failures landing as NULL payloads, the repair rescan
  * converging to the complete corpus, and the RateMonitor composition
  * reporting rates that respect the configured limits.
  */
class PullIngestSpec extends SparkSpec {

  private val limits = Seq(Limit(3, 2), Limit(10, 20))

  test("greedy schedule: no window of any limit over-issues, per key independently") {
    import spark.implicits._
    val reqs = (for (k <- Seq("key_a", "key_b"); i <- 0 until 50)
      yield (k, i.toLong + (if (k == "key_b") 1000L else 0L), 0L))
      .toDF("api_key", "req_id", "attempt")
    val sched = PullIngest.schedule(reqs, limits)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(sched.length == 100, "every request gets an issue tick")
    // per key: brute-force every window of every limit
    sched.groupBy(_._1).foreach { case (k, rows) =>
      val ticks = rows.map(_._4).sorted
      for (Limit(n, w) <- limits; t0 <- ticks) {
        val inWin = ticks.count(t => t >= t0 && t < t0 + w)
        assert(inWin <= n, s"$k: ${inWin} issues in window [$t0, ${t0 + w}) exceeds $n per $w")
      }
      // greedy = earliest-feasible: the schedule is also TIGHT — the
      // steady-state rate is the binding limit's rate (3 per 2 ticks
      // binds early; 10 per 20 binds at depth), so 50 requests must
      // finish within a small factor of the 10-per-20 bound.
      assert(ticks.max <= 20L * (50 / 10 + 1),
        s"$k: schedule is needlessly sparse (last tick ${ticks.max})")
      // per-key sequences are independent and identically paced
    }
    val byKey = sched.groupBy(_._1).view.mapValues(_.map(r => (r._3, r._4)).sorted.toSeq).toMap
    assert(byKey("key_a") == byKey("key_b"),
      "keys with identical queues must pace identically and independently")
  }

  test("max-plus recurrence: t(i) = max_j(t(i-n_j) + w_j) holds exactly") {
    import spark.implicits._
    val reqs = (0 until 40).map(i => ("k", i.toLong, 0L)).toDF("api_key", "req_id", "attempt")
    val got = PullIngest.schedule(reqs, limits)
      .orderBy("req_seq").collect().map(_.getLong(4)).toSeq
    val expect = scala.collection.mutable.ArrayBuffer.empty[Long]
    (0 until 40).foreach { i =>
      val t = limits.map { case Limit(n, w) =>
        if (i >= n) expect(i - n) + w else 0L
      }.max
      expect += t
    }
    assert(got == expect.toSeq, s"schedule deviates from the greedy recurrence: $got vs $expect")
  }

  test("ingestion rounds: transient failures land NULL, repair converges, parity with direct fetch") {
    import spark.implicits._
    val reqs = (0 until 60).map(i => (if (i % 2 == 0) "key_a" else "key_b", i.toLong))
      .toDF("api_key", "req_id")
    val (landed, ledger) = PullIngest.ingest(spark, reqs, limits)
    // repair converged: nothing incomplete, one row per request
    assert(PullIngest.incompleteRecords(landed).count() == 0, "repair did not converge")
    assert(landed.count() == 60 && landed.select("req_id").distinct().count() == 60)
    // parity with a direct (unthrottled, attempt-1) fetch: same payloads
    val direct = reqs.withColumn("attempt", lit(1L))
      .withColumn("payload", PullIngest.fetchedPayload)
      .select("req_id", "payload").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = landed.select("req_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == direct, "throttled+repaired corpus must equal the direct fetch")
    // the ledger shows the failures: every hash%5==0 request has an
    // attempt-0 NULL and an attempt-1 success, everything else one row
    val attempts = ledger.groupBy("req_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val failing = reqs.select(col("req_id"))
      .filter(pmod(xxhash64(col("req_id")), lit(5)) === 0)
      .collect().map(_.getLong(0)).toSet
    attempts.foreach { case (id, n) =>
      assert(n == (if (failing(id)) 2L else 1L), s"req $id: $n ledger rows")
    }
    // retries issue strictly AFTER every first-round request of their
    // key (tail-of-queue backoff)
    val firstRoundMax = ledger.filter(col("attempt") === 0).agg(max("issue_tick")).head().getLong(0)
    val retryMin = ledger.filter(col("attempt") === 1).agg(min("issue_tick")).head().getLong(0)
    assert(retryMin > firstRoundMax, "retries must join the tail of the schedule")
    // and the full ledger still violates no window of any limit
    val all = ledger.select("api_key", "issue_tick").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    all.groupBy(_._1).foreach { case (k, rows) =>
      val ticks = rows.map(_._2).sorted
      for (Limit(n, w) <- limits; t0 <- ticks)
        assert(ticks.count(t => t >= t0 && t < t0 + w) <= n,
          s"$k: ledger bursts past $n per $w at $t0")
    }
  }

  test("RateMonitor composition: windowed request rates never exceed the window's limit") {
    import spark.implicits._
    val reqs = (0 until 80).map(i => ("k", i.toLong)).toDF("api_key", "req_id")
    val (_, ledger) = PullIngest.ingest(spark, reqs, limits)
    for (Limit(n, w) <- limits) {
      val rates = PullIngest.monitorRates(ledger, w)
        .collect().map(_.getLong(3))
      assert(rates.nonEmpty && rates.forall(_ <= n),
        s"monitor reports a window over $n per $w: ${rates.max}")
    }
  }
}
