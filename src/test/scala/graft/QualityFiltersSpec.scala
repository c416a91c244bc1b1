package graft

import graft.dedup.LineDedup
import graft.functions.QualityFilters
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators: PII redaction, Gopher rule gate, and
  * line-level boilerplate dedup.
  */
class QualityFiltersSpec extends SparkSpec {

  test("redact scrubs every PII class and leaves surrounding text intact") {
    import spark.implicits._
    val cases = Seq(
      ("mail me at jane.doe+spam@sub.example.co.uk today",
        "mail me at <EMAIL> today"),
      ("call 555-867-5309 or 555-123-4567.", "call <PHONE> or <PHONE>."),
      ("host 192.168.0.1 and 10.0.0.255 up", "host <IP> and <IP> up"),
      // a phone is not an IP, an IP is not a phone
      ("555-867-5309 vs 10.0.0.1", "<PHONE> vs <IP>"),
      // email with digits does not leak a phone/IP match afterwards
      ("u123@h1.example.com", "<EMAIL>"),
      ("no pii here at all", "no pii here at all"))
      .toDF("raw", "expected")
    val out = cases.withColumn("got", QualityFilters.redact(col("raw")))
    val bad = out.filter(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("piiRedact finds exactly the planted PII and leaves none behind") {
    val out = SparkEntry.queries("q_pii_redact")(spark, sfDir)
    val n = out.count()
    assert(n == Tables.documents(spark, sfDir).count())
    // exactly one planted instance of each class per doc, none invented
    assert(out.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1 || col("n_ips") =!= 1).count() == 0)
    // the redacted text carries the markers and no residual match
    assert(out.filter(!col("clean_text").contains("<EMAIL>") ||
      !col("clean_text").contains("<PHONE>") ||
      !col("clean_text").contains("<IP>")).count() == 0)
    for (p <- Seq(QualityFilters.EmailPattern, QualityFilters.PhonePattern, QualityFilters.Ipv4Pattern))
      assert(out.filter(size(regexp_extract_all(col("clean_text"), lit(p), lit(0))) > 0).count() == 0,
        s"residual PII matching $p")
  }

  test("redact never throws and stays idempotent on adversarial inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alphabet = "ab1.-@ \té世 :/%+_"
    val fuzz = (1 to 200).map { i =>
      (i.toLong, (0 until rnd.nextInt(80)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    } ++ Seq(
      (900L, "@" * 50), (901L, "." * 50), (902L, "1" * 50),
      (903L, "a@b.cd" * 20), (904L, "1.2.3.4" * 20), (905L, "555-123-4567555-123-4567"))
    val df = fuzz.toDF("id", "raw")
      .withColumn("once", QualityFilters.redact(col("raw")))
      .withColumn("twice", QualityFilters.redact(QualityFilters.redact(col("raw"))))
    assert(df.count() == fuzz.size.toLong)
    assert(df.filter(col("once") =!= col("twice")).count() == 0, "redaction not idempotent under fuzz")
  }

  test("redact is idempotent: markers never re-match any PII pattern") {
    val out = SparkEntry.queries("q_pii_redact")(spark, sfDir)
      .select(col("doc_id"), col("clean_text"))
      .withColumn("twice", QualityFilters.redact(col("clean_text")))
    assert(out.filter(col("twice") =!= col("clean_text")).count() == 0,
      "second redaction pass changed already-clean text")
  }

  test("gopher gate and report card are single-scan: one documents read, no joins") {
    // The modal-word rule is computed scan-locally (topWordRun), so the
    // whole gate — and the report card riding it — must plan exactly ONE
    // file scan and zero joins; a second scan or a doc_id self-join is a
    // 2x corpus read at 100 TB.
    for (name <- Seq("q_quality_gopher", "q_corpus_report", "q_quality_sample")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // AQE: the final plan (with scans) exists only after execution
      val plan = finalPlanString(df)
      val scans = plan.sliding("FileScan".length).count(_ == "FileScan")
      assert(scans == 1, s"$name plans $scans file scans, expected 1:\n$plan")
      assert(!plan.contains("Join"), s"$name plans a join:\n$plan")
    }
  }

  // AQE toString appends an "== Initial Plan ==" copy of every node;
  // only the final section reflects what actually ran.
  private def finalPlanString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)

  test("c4Quality catches exactly the planted violations") {
    val out = SparkEntry.queries("q_quality_c4")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(out.count() == docs)
    // each rule fails exactly on its planted residue class
    assert(out.filter(col("pass_url") === (col("doc_id") % 13 === 0)).count() == 0)
    assert(out.filter(col("pass_brace") === (col("doc_id") % 11 === 0)).count() == 0)
    assert(out.filter(col("pass_lorem") === (col("doc_id") % 7 === 0)).count() == 0)
    assert(out.filter(col("pass_badword") === (col("doc_id") % 17 === 0)).count() == 0)
    assert(out.filter(col("keep") =!= (col("pass_url") && col("pass_brace") &&
      col("pass_lorem") && col("pass_badword"))).count() == 0)
    // and it is scan-local too
    val df = SparkEntry.queries("q_quality_c4")(spark, sfDir)
    df.collect()
    val plan = finalPlanString(df)
    assert(plan.sliding("FileScan".length).count(_ == "FileScan") == 1 &&
      !plan.contains("Join"), s"q_quality_c4 is not single-scan scan-local:\n$plan")
  }

  test("corpusReport subtotals are consistent with the per-doc gate") {
    val rep = SparkEntry.queries("q_corpus_report")(spark, sfDir)
    val grand = rep.filter(col("lang") === "ALL" && col("source") === "ALL").collect()
    assert(grand.length == 1)
    val q = SparkEntry.queries("q_quality_gopher")(spark, sfDir)
    assert(grand.head.getAs[Long]("n_docs") == q.count())
    // per-lang rows sum to the grand total
    val perLang = rep.filter(col("lang") =!= "ALL" && col("source") === "ALL")
      .agg(sum("n_docs")).head.getLong(0)
    assert(perLang == q.count(), "lang subtotals do not cover the corpus")
    assert(rep.filter(col("keep_rate") < 0 || col("keep_rate") > 1).count() == 0)
  }

  test("qualitySample keeps clean docs whole and downweights by rule-pass count") {
    val s = SparkEntry.queries("q_quality_sample")(spark, sfDir)
    val q = SparkEntry.queries("q_quality_gopher")(spark, sfDir)
    // every fully-passing doc survives (rate 1000 permille covers all buckets)
    val clean = q.filter(col("keep")).select("doc_id")
    assert(clean.exceptAll(s.select("doc_id")).count() == 0, "a keep=true doc was sampled out")
    // kept rows carry consistent rate bands and in-rate buckets
    assert(s.filter(col("bucket") >= col("rate_pm")).count() == 0)
    assert(s.filter(col("n_pass") === 4 && col("rate_pm") =!= 1000).count() == 0)
    // the sample is a strict subset when any doc fails a rule
    assert(s.count() < q.count() || q.filter(!col("keep")).count() == 0)
  }

  test("gopherQuality rules are internally consistent and keep is their conjunction") {
    val q = SparkEntry.queries("q_quality_gopher")(spark, sfDir)
    assert(q.filter(col("stop_hits") > col("n_words")).count() == 0)
    assert(q.filter(col("top_word_n") > col("n_words")).count() == 0)
    assert(q.filter(col("keep") =!=
      (col("pass_wc") && col("pass_mwl") && col("pass_stop") && col("pass_rep"))).count() == 0)
    // the gate must actually discriminate on this corpus (some docs
    // under 50 words, some with thin stopword coverage)
    val kept = q.filter(col("keep")).count()
    assert(kept > 0 && kept < q.count(), s"vacuous gate: kept $kept of ${q.count()}")
  }

  test("lineDedup matches a plain-Scala model on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 4) {
      // small vocab + short lines force cross-doc chunk collisions;
      // lengths straddle the 10-word line width (incl. sub-line docs)
      val banner = Seq.fill(LineDedup.LineWords)("z").mkString(" ")
      val docs = (1L to 40L).map { id =>
        val n = 1 + rnd.nextInt(25)
        val body = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
        // ~30% of docs open with a 10-word banner — the aligned
        // boilerplate line the operator exists to strip
        (id, if (rnd.nextInt(10) < 3) s"$banner $body" else body)
      }
      // plain-Scala model
      val chunked = docs.map { case (id, text) =>
        id -> text.split(" ").grouped(LineDedup.LineWords).map(_.mkString(" ")).toVector
      }.toMap
      val df = chunked.values.flatMap(_.distinct).groupBy(identity).map { case (l, v) => l -> v.size }
      val boiler = df.filter(_._2 >= LineDedup.BoilerplateDf).keySet
      val expected = chunked.map { case (id, lines) =>
        (id, lines.size.toLong, lines.count(boiler.contains).toLong,
          lines.filterNot(boiler.contains).mkString(" "))
      }.toSeq.sortBy(_._1)
      val got = LineDedup.lineDedupOf(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      assert(got == expected, s"trial $trial diverged from the model")
      assert(expected.exists(_._3 > 0), s"trial $trial generated no boilerplate (weak trial)")
    }
  }

  test("lineDedup removes exactly the cross-doc boilerplate lines and reassembles in order") {
    val docs = Tables.documents(spark, sfDir)
    val out = SparkEntry.queries("q_line_dedup")(spark, sfDir)
    assert(out.count() == docs.count())
    // untouched docs reassemble to their original text verbatim — the
    // order-restoring sort inside the aggregate is what this pins
    val joined = out.join(docs, "doc_id")
    assert(joined.filter(col("n_removed") === 0 && col("clean_text") =!= col("text")).count() == 0,
      "an untouched doc did not round-trip")
    // removed + kept accounts for every line
    val lines = LineDedup.lines(docs)
    val nLines = lines.groupBy("doc_id").count()
    assert(out.join(nLines, "doc_id").filter(col("n_lines") =!= col("count")).count() == 0)
    // n_removed matches an independently computed boilerplate count
    val boiler = lines.select("doc_id", "line").distinct()
      .groupBy("line").agg(count(lit(1)).as("df"))
      .filter(col("df") >= LineDedup.BoilerplateDf)
    val expectedRemoved = lines.join(boiler.select("line"), "line")
      .groupBy("doc_id").agg(count(lit(1)).as("exp_removed"))
    assert(out.join(expectedRemoved, "doc_id")
      .filter(col("n_removed") =!= col("exp_removed")).count() == 0)
    assert(out.filter(col("n_removed") > 0).count() > 0, "corpus has boilerplate; none was removed")
    // full reassembly check, recomputed independently in plain Scala on
    // every doc that lost lines (fixed 10-word chunks, drop df>=3 lines,
    // rejoin in order)
    val boilerSet = boiler.select("line").collect().map(_.getString(0)).toSet
    val touched = out.filter(col("n_removed") > 0)
      .join(docs.select("doc_id", "text"), "doc_id")
      .select("doc_id", "text", "clean_text").collect()
    for (r <- touched) {
      val expected = r.getString(1).split(" ").grouped(LineDedup.LineWords)
        .map(_.mkString(" ")).filterNot(boilerSet.contains).mkString(" ")
      assert(r.getString(2) == expected, s"doc ${r.getLong(0)} reassembled wrong")
    }
  }

  test("freqRankQuality scores by corpus-frequency rank and the band discriminates") {
    import org.apache.spark.sql.functions._
    val q = QualityFilters.freqRankQuality(spark, sfDir)
    val rows = q.collect()
    assert(rows.length == Tables.documents(spark, sfDir).count(), "every doc gets a score")
    // a doc of globally common tokens must outrank (lower mean rank)
    // a doc of rare ones — sanity of the rank direction: the min- and
    // max-scored docs differ, and the band actually splits the corpus
    val keeps = rows.map(_.getBoolean(3)).toSet
    assert(keeps == Set(true, false),
      s"keep band vacuous at ${QualityFilters.FreqRankKeepMax}: all ${rows.head.getBoolean(3)}")
    // rank floor: mean rank can never go below 1 (the modal token)
    assert(rows.forall(_.getDouble(2) >= 1.0))
    // determinism (dense_rank ties share ranks — no order dependence)
    val again = QualityFilters.freqRankQuality(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // shuffle hygiene: no corpus-scale exchange carries raw token
    // strings — every shuffle in the plan moves hashed longs / doc
    // aggregates only (strings stay inside their scan stage)
    assertNoStringShuffles(q, "freqRankQuality")
  }

  /** Walks the executed plan (through AQE wrappers and subqueries) and
    * fails on any shuffle exchange whose output carries a StringType
    * column — the repo's shuffle-hygiene gate for token-keyed plans.
    */
  private def assertNoStringShuffles(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    def stringShuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = {
      val self = p match {
        case e: ShuffleExchangeExec if e.output.exists(_.dataType == StringType) => Seq(e)
        case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _                        => p.children ++ p.subqueries
      }
      self ++ kids.flatMap(stringShuffles)
    }
    val offending = stringShuffles(df.queryExecution.executedPlan)
    assert(offending.isEmpty,
      s"$what exchanges carrying strings: ${offending.map(_.output.map(_.name).mkString(","))}")
  }

  test("bigramLmQuality: per-doc bigram coverage, OOV penalty bound, discriminating band") {
    import org.apache.spark.sql.functions._
    val q = QualityFilters.bigramLmQuality(spark, sfDir)
    val rows = q.collect()
    // every doc with ≥2 tokens scores, with exactly n_tokens-1 bigrams
    val nToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length == nToks.count(_._2 >= 2), "every multi-token doc must score")
    for (r <- rows)
      assert(r.getLong(1) == nToks(r.getLong(0)) - 1L, s"doc ${r.getLong(0)} bigram count")
    // mean rank is bounded by the worst case: every bigram OOV
    assert(rows.forall(_.getDouble(2) >= 1.0))
    // the band discriminates on this corpus (mid-distribution constant)
    val keeps = rows.map(_.getBoolean(3)).toSet
    assert(keeps == Set(true, false),
      s"keep band vacuous at ${QualityFilters.BigramKeepMax}")
    // determinism
    val again = QualityFilters.bigramLmQuality(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // same shuffle-hygiene gate as the unigram filter: bigram strings
    // never leave their scan stage
    assertNoStringShuffles(q, "bigramLmQuality")
  }

  test("calibratedQuality keeps ~the target permille of EVERY source, ties in-or-out together") {
    import org.apache.spark.sql.functions._
    val q = QualityFilters.calibratedQuality(spark, sfDir)
    val rows = q.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.length == Tables.documents(spark, sfDir).count())
    val target = QualityFilters.CalibrateKeepPermille / 1000.0
    for ((src, grp) <- rows.groupBy(_._2)) {
      val n = grp.length
      val kept = grp.count(_._4)
      // never above the quantile; below only by at most the boundary
      // tie group (which drops whole)
      assert(kept <= target * n + 1e-9, s"$src kept $kept of $n — above the quantile")
      val boundaryTie = grp.groupBy(_._3).values.map(_.length).max
      assert(kept >= target * n - boundaryTie,
        s"$src kept $kept of $n with max tie group $boundaryTie — below the quantile band")
      // calibration is per-source: every kept doc scores ≤ every
      // dropped doc within the SAME source
      val keptMax = grp.filter(_._4).map(_._3).maxOption.getOrElse(Double.MinValue)
      val dropMin = grp.filterNot(_._4).map(_._3).minOption.getOrElse(Double.MaxValue)
      assert(keptMax <= dropMin, s"$src: kept score $keptMax above dropped score $dropMin")
    }
    // the per-source thresholds actually differ (this is what a fixed
    // global constant cannot do)
    val thresholds = rows.groupBy(_._2).view.mapValues(g =>
      g.filter(_._4).map(_._3).maxOption.getOrElse(-1.0)).values.toSet
    assert(thresholds.size > 1, "all sources calibrated to one threshold — vacuous")
  }

  test("scoreTiers partitions every source into ordered thirds, ties share a tier") {
    import org.apache.spark.sql.functions._
    val rows = QualityFilters.scoreTiers(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.length == Tables.documents(spark, sfDir).count())
    assert(rows.map(_._4).toSet == Set("head", "middle", "tail"),
      "all three tiers must be populated on this corpus")
    for ((src, grp) <- rows.groupBy(_._2)) {
      val n = grp.length
      // tiers are ordered by score: every head score ≤ every middle ≤ every tail
      for (Seq(lo, hi) <- Seq("head", "middle", "tail").sliding(2)) {
        val loMax = grp.filter(_._4 == lo).map(_._3).maxOption.getOrElse(Double.MinValue)
        val hiMin = grp.filter(_._4 == hi).map(_._3).minOption.getOrElse(Double.MaxValue)
        assert(loMax <= hiMin, s"$src: $lo max $loMax above $hi min $hiMin")
      }
      // thirds up to tie-group granularity
      val headN = grp.count(_._4 == "head")
      assert(headN <= n / 3 + 1e-9, s"$src head oversized: $headN of $n")
      // equal scores never straddle tiers
      for ((_, tieGrp) <- grp.groupBy(_._3))
        assert(tieGrp.map(_._4).toSet.size == 1, s"$src: a tie group straddles tiers")
    }
  }

  test("curriculumOrder anneals head→middle→tail with each tier internally shuffled") {
    val rows = SparkEntry.queries("q_curriculum_order")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = rows.length.toLong
    assert(rows.map(_._3).sorted.toSeq == (0L until n).toSeq, "pos must be a dense permutation 0..n-1")
    // the anneal: every head pos < every middle pos < every tail pos
    val byTier = rows.groupBy(_._2)
    for (Seq(lo, hi) <- Seq("head", "middle", "tail").sliding(2)) {
      val loMax = byTier.get(lo).map(_.map(_._3).max).getOrElse(Long.MinValue)
      val hiMin = byTier.get(hi).map(_.map(_._3).min).getOrElse(Long.MaxValue)
      assert(loMax < hiMin, s"$lo positions must all precede $hi")
    }
    // within a tier the walk order must NOT be doc_id order (that would
    // reintroduce crawl-order correlation): the head tier's doc_id
    // sequence along pos has inversions.
    val headWalk = byTier("head").sortBy(_._3).map(_._1)
    assert(headWalk.zip(headWalk.tail).exists { case (a, b) => a > b },
      "head tier walks in doc_id order — shuffle key not applied")
  }

  test("dsirSelect scores every candidate and no target docs leak through") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val target = docs.filter { case (id, lang) => lang == "en" && id % 4 == 1 }.keySet
    val out = SparkEntry.queries("q_dsir_select")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val scored = out.map(_._1).toSet
    assert(scored == docs.keySet.diff(target),
      "every non-target doc must be scored; target docs must not appear")
    assert(out.forall { case (_, n, _, _) => n > 0 }, "token counts must be positive")
    assert(out.forall { case (_, _, s, k) => k == (s >= graft.functions.Dsir.KeepMin) },
      "keep must be exactly the score threshold")
    // No separation assertion here ON PURPOSE: the synthetic generator's
    // lang label does not shift token rates (all langs draw the same
    // 31-word pool uniformly — verified), so real-data scores sit near
    // zero and this query's job is the cross-engine exactness gate. The
    // selection semantics are pinned by the planted-corpus test below.
  }

  test("dsirSelect separates target-like candidates on a corpus with real divergence") {
    import spark.implicits._
    // Planted corpora with genuinely different token distributions: the
    // "domain" dialect leans on vocab A, the "crawl" dialect on vocab B,
    // with shared stopwords so the tables overlap like real corpora.
    val rnd = new scala.util.Random(7)
    val shared = Vector("the", "a", "of")
    val vocabA = Vector("atlas", "axiom", "amber", "arrow", "anvil")
    val vocabB = Vector("basalt", "bravo", "bison", "briar", "banner")
    def doc(lean: Vector[String], other: Vector[String]): String =
      Seq.fill(40)(rnd.nextInt(10) match {
        case d if d < 3 => shared(rnd.nextInt(shared.length))
        case d if d < 9 => lean(rnd.nextInt(lean.length))
        case _          => other(rnd.nextInt(other.length))
      }).mkString(" ")
    // ids: 0-19 target (domain sample), 20-49 domain-like candidates,
    // 50-99 crawl-like candidates.
    val rows = (0L until 100L).map { id =>
      val domainLike = id < 50
      (id, if (domainLike) doc(vocabA, vocabB) else doc(vocabB, vocabA))
    }
    val docs = rows.toDF("doc_id", "text")
    val out = graft.functions.Dsir
      .dsirSelectOf(docs, col("doc_id") < 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(out.map(_._1).toSet == (20L until 100L).toSet, "all candidates scored, no target leak")
    val (domain, crawl) = out.partition(_._1 < 50)
    val dMean = domain.map(_._2).sum / domain.length
    val cMean = crawl.map(_._2).sum / crawl.length
    assert(dMean > cMean, s"domain-like candidates must outscore crawl-like: $dMean vs $cMean")
    // the keep gate itself must separate, not just the raw means
    val dKeep = domain.count(_._3).toDouble / domain.length
    val cKeep = crawl.count(_._3).toDouble / crawl.length
    assert(dKeep > 0.9 && cKeep < 0.1,
      s"keep gate must separate the dialects: domain=$dKeep crawl=$cKeep")
    // the scores are symmetric evidence: flipping the target to a crawl
    // sample must flip the ordering with the same machinery
    val flipped = graft.functions.Dsir
      .dsirSelectOf(docs, col("doc_id") >= 80)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val (fCrawl, fDomain) = flipped.partition(_._1 >= 50)
    assert(fCrawl.map(_._2).sum / fCrawl.length > fDomain.map(_._2).sum / fDomain.length,
      "flipped target must flip the ordering")
  }

  test("curation funnel is monotone and each stage matches its component operator") {
    import org.apache.spark.sql.functions._
    val funnel = SparkEntry.queries("q_curation_run")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(funnel.map(t => (t._1, t._2)).toSeq ==
      Seq((0L, "ingest"), (1L, "c4_gate"), (2L, "gopher_gate"), (3L, "dedup"), (4L, "calibrate")))
    // docs and tokens can only fall through the funnel
    funnel.sliding(2).foreach { case Array(hi, lo) =>
      assert(lo._3 <= hi._3 && lo._4 <= hi._4, s"funnel not monotone: $hi -> $lo")
    }
    val docs = Tables.documents(spark, sfDir)
    assert(funnel(0)._3 == docs.count())
    assert(funnel(0)._4 == docs.agg(sum(size(split(col("text"), " ")))).head.getLong(0))
    // stage flags re-derived from the standalone component queries
    val c4Keep = graft.functions.QualityFilters.c4Quality(spark, sfDir)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(funnel(1)._3 == c4Keep.size.toLong)
    val gopherKeep = graft.functions.QualityFilters.gopherQuality(spark, sfDir)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = c4Keep.intersect(gopherKeep)
    assert(funnel(2)._3 == s2.size.toLong)
    // dedup stage = one survivor per cluster among the gated docs
    val clusters = graft.dedup.Clusters.dedupClusters(spark, sfDir)
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val survivors = s2.groupBy(clusters).values.map(_.min).toSet
    assert(funnel(3)._3 == survivors.size.toLong)
    spark.catalog.clearCache()
  }
}
