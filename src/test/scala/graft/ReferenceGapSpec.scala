package graft

import org.apache.spark.sql.functions._

/** Specs for the reference-shaped operators: role elimination, fight
  * attribute merge, multi-window lookback.
  */
class ReferenceGapSpec extends SparkSpec {

  test("role assignment covers every lineitem exactly once with priority elimination") {
    val roles = SparkEntry.queries("q_role_assign")(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    assert(roles.count() == li.count(), "every lineitem gets exactly one role")
    // Each order has exactly one bulk pick; budget/discount exist only
    // when the order has enough remaining items.
    val perOrder = roles.groupBy("l_orderkey")
      .agg(
        sum(when(col("role") === "bulk", 1).otherwise(0)).as("n_bulk"),
        sum(when(col("role") === "budget", 1).otherwise(0)).as("n_budget"),
        count(lit(1)).as("n")
      )
    assert(perOrder.filter(col("n_bulk") =!= 1).count() == 0, "exactly one bulk per order")
    assert(perOrder.filter(col("n") >= 2 && col("n_budget") =!= 1).count() == 0,
      "exactly one budget when the order has >= 2 items")
    // Elimination: the bulk pick is the per-order max quantity. The output
    // carries only id columns and (orderkey, linenumber, partkey) is not
    // guaranteed unique, so compare the max over matching rows.
    val maxQ = li.groupBy("l_orderkey").agg(max("l_quantity").as("max_q"))
    val bulkRows = SparkEntry.queries("q_role_assign")(spark, sfDir)
      .filter(col("role") === "bulk")
      .join(li, Seq("l_orderkey", "l_linenumber", "l_partkey"))
      .groupBy("l_orderkey")
      .agg(max("l_quantity").as("picked_q"))
      .join(maxQ, "l_orderkey")
    assert(bulkRows.filter(col("picked_q") =!= col("max_q")).count() == 0,
      "bulk pick must be the argmax of quantity")
  }

  test("fight attr merge: zero-involvement anchors survive with null merges") {
    val m = SparkEntry.queries("q_range_attr_merge")(spark, sfDir)
    val errors = Tables.events(spark, sfDir).filter(col("event_type") === "error").count()
    assert(m.count() == errors, "left join keeps all anchors")
    assert(m.filter(col("n_clicks") === 0 && col("max_click").isNotNull).count() == 0,
      "no merge attributes without involvement")
    assert(m.filter(col("n_clicks") > 0 && col("max_click").isNull).count() == 0,
      "involved anchors must carry merged attributes")
  }

  test("fight outcomes partition all error events by kind") {
    val o = SparkEntry.queries("q_fight_outcomes")(spark, sfDir)
    val total = o.agg(sum(col("solo_n") + col("skirmish_n") + col("team_n"))).head.getLong(0)
    val errors = Tables.events(spark, sfDir).filter(col("event_type") === "error").count()
    assert(total == errors)
    assert(o.filter(col("solo_wins") > col("solo_n")).count() == 0)
  }

  test("split assignment is deterministic, total, and roughly 80/10/10") {
    val s = SparkEntry.queries("q_split_assign")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(s.count() == docs)
    val frac = s.filter(col("split") === "train").count().toDouble / docs
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac out of band")
    val again = SparkEntry.queries("q_split_assign")(spark, sfDir)
    assert(s.exceptAll(again).count() == 0, "split must be deterministic")
  }

  test("multi-window lookback: longer windows never see fewer events") {
    val m = SparkEntry.queries("q_lookback_multiwindow")(spark, sfDir)
    // avg_7d null implies no 7d history; then avg_14d may still exist.
    // Check the count monotonicity indirectly: whenever avg_7d exists,
    // avg_14d and avg_21d must exist too (supersets).
    assert(m.filter(col("avg_7d").isNotNull && col("avg_14d").isNull).count() == 0)
    assert(m.filter(col("avg_14d").isNotNull && col("avg_21d").isNull).count() == 0)
    assert(m.filter(col("n_7d") < 0).count() == 0)
  }

  test("sequence packing is a gapless concatenation layout built without a corpus-scale global window") {
    val p = SparkEntry.queries("q_seq_pack")(spark, sfDir)
    val rows = p.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // contiguity: each doc starts exactly where the previous one ended
    val sorted = rows.sortBy(_._1)
    assert(sorted.head._3 == 0L, "stream starts at offset 0")
    sorted.sliding(2).foreach {
      case Array((_, n0, off0, _, _), (id1, _, off1, _, _)) =>
        assert(off1 == off0 + n0, s"gap/overlap before doc $id1")
      case _ =>
    }
    rows.foreach { case (_, _, off, pack, pOff) =>
      assert(pOff >= 0 && pOff < graft.operators.SeqPack.PackBudget)
      assert(pack == off / graft.operators.SeqPack.PackBudget)
    }
    // the only partition-less window runs over the tiny block frame: the
    // corpus-scale window must be partitioned by blk
    val plan = p.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(blk"),
      "per-doc running sum must be partitioned by block")
  }

  test("pack boundaries list every doc exactly once, aligned with the packed layout") {
    val packed = SparkEntry.queries("q_seq_pack")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))) // doc, pack, off
    def nums(s: String): Seq[Long] =
      if (s.isEmpty) Seq.empty else s.split(" ").toSeq.map(_.toLong)
    val bounds = SparkEntry.queries("q_pack_boundaries")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), nums(r.getString(2)), nums(r.getString(3))))
    assert(bounds.map(_._2).sum == packed.length, "boundary lists must cover every doc once")
    val expected = packed.groupBy(_._2)
    for ((pack, n, offs, docs) <- bounds) {
      assert(offs.length == n && docs.length == n, s"pack $pack arrays misaligned")
      assert(offs.forall(o => o >= 0 && o < graft.operators.SeqPack.PackBudget))
      assert(offs == offs.sorted, s"pack $pack offsets unsorted")
      val exp = expected(pack).map(p => (p._3, p._1)).sorted
      assert(offs.zip(docs) == exp.toSeq, s"pack $pack boundaries diverge from the layout")
    }
  }

  test("source mix balances every source to roughly the smallest source's size") {
    val mix = SparkEntry.queries("q_source_mix")(spark, sfDir)
    val perSource = mix.groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val original = Tables.documents(spark, sfDir).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.keySet == original.keySet, "every source survives")
    val minN = original.values.min
    perSource.foreach { case (s, kept) =>
      // hash buckets are ~uniform: each source lands within a loose band
      // of the smallest source's size, and never above its own count
      assert(kept <= original(s), s"source $s kept more than it has")
      assert(kept <= minN * 1.5 && kept >= minN * 0.5,
        s"source $s kept $kept, expected ~$minN")
    }
    val again = SparkEntry.queries("q_source_mix")(spark, sfDir)
    assert(mix.exceptAll(again).count() == 0, "mix must be deterministic")
  }

  test("source mix never fully eliminates a source, even at extreme skew") {
    // 20000:50 skew — far past the old 1% granularity cliff (100x) where
    // a giant source's rate rounded to zero and the source vanished. The
    // per-mille clamp guarantees rate >= 1 permille for every source.
    import spark.implicits._
    val docs = ((1L to 20000L).map(i => (i, "crawl")) ++ (1L to 50L).map(i => (100000L + i, "books")))
      .toDF("doc_id", "source")
    val kept = graft.operators.Splits.sourceMixOf(docs)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == Set("crawl", "books"), s"a source was eliminated: $kept")
    // the giant source is downweighted hard (floor(50*1000/20000) = 2
    // permille -> ~40 rows expected), the small source keeps everything
    // (rate 1000 permille)
    assert(kept("crawl") <= 100, s"crawl kept ${kept("crawl")} rows, expected ~40 (2 permille)")
    assert(kept("books") == 50, s"books must keep all rows, kept ${kept("books")}")
  }

  test("pack efficiency report reconciles with a driver-side per-split repack") {
    val rep = SparkEntry.queries("q_pack_efficiency")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))
      .toMap
    assert(rep.keySet == Set("train", "valid", "test"))
    val splitOf = SparkEntry.queries("q_split_assign")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val toks = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "cast(size(split(text, '\\\\s+')) as long) AS n").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val B = graft.operators.SeqPack.PackBudget
    for ((split, (nPacks, nDocs, total, dpp, nStrad, sRate, tailFill)) <- rep) {
      val ds = toks.filter(t => splitOf(t._1) == split).sortBy(_._1)
      assert(nDocs == ds.length, s"$split n_docs")
      assert(total == ds.map(_._2).sum, s"$split total_tokens")
      var off = 0L; var strad = 0L; var lastPack = 0L
      ds.foreach { case (_, n) =>
        if (off % B + n > B) strad += 1
        lastPack = off / B
        off += n
      }
      assert(nPacks == lastPack + 1, s"$split n_packs")
      assert(nStrad == strad, s"$split n_straddlers")
      assert(dpp == math.floor(nDocs.toDouble / nPacks * 10000 + 0.5) / 10000, s"$split docs_per_pack")
      assert(sRate == math.floor(strad.toDouble / nDocs * 10000 + 0.5) / 10000, s"$split straddle_rate")
      assert(tailFill == math.floor((total % B).toDouble / B * 10000 + 0.5) / 10000, s"$split tail_fill")
    }
  }

  test("docShuffle is a permutation in exact hash order, decorrelated from doc_id order") {
    val s = SparkEntry.queries("q_doc_shuffle")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = s.length
    assert(s.map(_._3).sorted.sameElements(0L until n), "positions must be a 0..n-1 permutation")
    // position order IS (shuffle_key, doc_id) order — the two-level
    // bucket ranking must equal the naive global sort
    val expected = s.sortBy(r => (r._2, r._1)).map(_._1)
    val got = s.sortBy(_._3).map(_._1)
    assert(got.sameElements(expected), "bucketed ranking diverged from global hash order")
    // and the shuffle actually decorrelates: doc_id order != position order
    assert(!got.sameElements(got.sorted), "shuffled order degenerated to doc_id order")
    // plan shape: the corpus-scale window must be partitioned by the
    // key bucket; only the tiny bucket-count frame gets a global window
    val plan = SparkEntry.queries("q_doc_shuffle")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(blk"),
      "per-bucket ranking must be partitioned by blk")
  }

  test("docShuffle epoch salts produce decorrelated orders (rank correlation ~0)") {
    import graft.operators.SeqPack
    // Two epochs = two salts: the permutations must be mutually
    // decorrelated, or "reshuffling" between epochs would feed the
    // model nearly the same context-window neighborhoods again.
    val a = SeqPack.docShuffle(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = SeqPack.docShuffle(spark, sfDir, salt = 271828L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a.keySet == b.keySet)
    val n = a.size.toDouble
    val ranks = a.keys.toSeq.map(k => (a(k).toDouble, b(k).toDouble))
    val (ma, mb) = (ranks.map(_._1).sum / n, ranks.map(_._2).sum / n)
    val cov = ranks.map { case (x, y) => (x - ma) * (y - mb) }.sum
    val (va, vb) = (ranks.map(r => math.pow(r._1 - ma, 2)).sum,
      ranks.map(r => math.pow(r._2 - mb, 2)).sum)
    val rho = cov / math.sqrt(va * vb)
    assert(math.abs(rho) < 0.1, s"salted orders correlate: spearman rho = $rho")
    // same salt, same order: the shuffle is reproducible run-to-run
    val a2 = SeqPack.docShuffle(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a2 == a, "docShuffle must be deterministic for a fixed salt")
  }

  test("temperature mixing damps by sqrt: between hard flatten and no mixing") {
    import spark.implicits._
    // Same 20000:50 skew as the hard-flatten test: α=1/2 keeps
    // sqrt(50/20000) = 5% of the giant source (~1000 rows) where the
    // hard flatten keeps 2 permille (~40) — damped, not crushed.
    val docs = ((1L to 20000L).map(i => (i, "crawl")) ++ (1L to 50L).map(i => (100000L + i, "books")))
      .toDF("doc_id", "source")
    val kept = graft.operators.Splits.sourceTemperatureOf(docs)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("books") == 50, s"smallest source must keep ALL rows (rate 1000 permille), kept ${kept("books")}")
    assert(kept("crawl") >= 700 && kept("crawl") <= 1300,
      s"crawl kept ${kept("crawl")} rows, expected ~1000 (50 permille = sqrt damping)")
    val again = graft.operators.Splits.sourceTemperatureOf(docs)
    assert(graft.operators.Splits.sourceTemperatureOf(docs).exceptAll(again).count() == 0,
      "temperature mix must be deterministic")
  }

  test("token-budget mixing buys tokens, not documents: sqrt-damped budgets, exact cutoff") {
    import spark.implicits._
    // 20000-token crawl (2000 docs × 10) vs 200-token books (50 × 4):
    // budgets ≈ √(T_min·T_s) → books keeps everything (budget = own
    // total), crawl keeps √(200/20000) = 10% of its TOKENS.
    val docs = ((1L to 2000L).map(i => (i, "crawl", 10L)) ++
      (1L to 50L).map(i => (100000L + i, "books", 4L)))
      .toDF("doc_id", "source", "n_tokens")
    val kept = graft.operators.Splits.tokenBudgetMixOf(docs)
    val bySource = kept.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("tok"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bySource("books") == ((50L, 200L)), s"smallest source keeps ALL tokens: ${bySource("books")}")
    // budget_crawl = 20000·floor(sqrt(200e6/20000))/1000 = 2000 tokens
    // exactly; 10-token docs tile it as exactly 200 kept docs.
    assert(bySource("crawl") == ((200L, 2000L)), s"crawl must keep exactly its 2000-token budget: ${bySource("crawl")}")
    // strictly-before semantics: cum_before of every kept doc < budget
    assert(kept.filter(col("source") === "crawl" && col("cum_before") >= 2000L).count() == 0)
    val again = graft.operators.Splits.tokenBudgetMixOf(docs)
    assert(kept.exceptAll(again).count() == 0, "token-budget mix must be deterministic")
  }

  test("source upsampling repeats small sources toward the sqrt share, capped, largest untouched") {
    import spark.implicits._
    // 20000:50 skew: target epochs for books = sqrt(20000/50) = 20,
    // capped at UpsampleMaxEpochs; crawl (the largest) stays at 1 copy.
    val docs = ((1L to 20000L).map(i => (i, "crawl")) ++ (1L to 50L).map(i => (100000L + i, "books")))
      .toDF("doc_id", "source")
    val up = graft.operators.Splits.sourceUpsampleOf(docs)
    val copies = up.groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(copies("crawl") == 20000,
      s"largest source must keep exactly one copy per doc, got ${copies("crawl")}")
    assert(copies("books") == 50 * graft.operators.Splits.UpsampleMaxEpochs,
      s"books wants 20 epochs, cap is ${graft.operators.Splits.UpsampleMaxEpochs}, got ${copies("books")}")
    // copy ids are dense per doc: 0..n_copies-1
    val perDoc = up.groupBy("doc_id").agg(count(lit(1)).as("n"), max("copy_id").as("mx"))
    assert(perDoc.filter(col("mx") =!= col("n") - 1).count() == 0, "copy ids must be dense from 0")
    // a mild 300:100 skew exercises the FRACTIONAL path: sqrt(3) ≈ 1.732
    // epochs → mean copies between the floor and ceil, not at either
    val mild = ((1L to 300L).map(i => (i, "big")) ++ (1L to 100L).map(i => (10000L + i, "small")))
      .toDF("doc_id", "source")
    val mildUp = graft.operators.Splits.sourceUpsampleOf(mild)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mildUp("big") == 300)
    assert(mildUp("small") > 100 && mildUp("small") < 200,
      s"fractional epochs must land strictly between 1x and 2x, got ${mildUp("small")}")
    // determinism
    val again = graft.operators.Splits.sourceUpsampleOf(docs)
    assert(up.exceptAll(again).count() == 0 && again.exceptAll(up).count() == 0)
  }

  test("stats availability: counters are consistent subsets, zero for no-history players") {
    val a = SparkEntry.queries("q_stats_availability")(spark, sfDir)
    assert(a.count() == Tables.events(spark, sfDir).count(), "one availability row per event")
    // predicate counts can never exceed the window total, the stricter
    // predicate never exceeds the looser one, and the 21d window always
    // contains the 7d one
    assert(a.filter(col("n_high_7d") > col("n_counted_7d")).count() == 0)
    assert(a.filter(col("n_counted_7d") > col("n_7d")).count() == 0)
    assert(a.filter(col("n_same_type_7d") > col("n_7d")).count() == 0)
    assert(a.filter(col("n_21d") < col("n_7d")).count() == 0)
    // a user's first event has zero history under every counter (0, not NULL)
    val first = a.orderBy("event_id").groupBy("user_id").agg(min("event_id").as("event_id"))
    val firstRows = a.join(first, Seq("user_id", "event_id"), "left_semi")
    assert(firstRows.filter(col("n_21d") =!= 0 || col("n_high_7d").isNull).count() == 0)
  }

  test("recurrent delta: null until n predecessors exist, then the exact trailing mean") {
    val d = SparkEntry.queries("q_recurrent_delta")(spark, sfDir).collect()
    // reconstruct per-(user, type) sequences from the source and verify
    // the frame semantics row by row
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3).getTime, r.getDouble(4)))
    val seqs = events.groupBy(e => (e._2, e._3)).map { case (k, es) =>
      k -> es.sortBy(e => (e._4, e._1)).map(e => (e._1, math.floor(e._5 * 100 + 0.5).toLong))
    }
    val expect = seqs.values.flatMap { seq =>
      seq.zipWithIndex.map { case ((id, _), i) =>
        def mean(n: Int): Option[Double] =
          if (i >= n) Some(math.floor(seq.slice(i - n, i).map(_._2).sum.toDouble / (n * 100.0) * 10000 + 0.5) / 10000)
          else None
        id -> (mean(2), mean(3), mean(4))
      }
    }.toMap
    assert(d.length == events.length)
    d.foreach { r =>
      val (e2, e3, e4) = expect(r.getLong(0))
      def got(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      assert(got(4) == e2 && got(5) == e3 && got(6) == e4,
        s"event ${r.getLong(0)}: got (${got(4)}, ${got(5)}, ${got(6)}), want ($e2, $e3, $e4)")
    }
  }
}
