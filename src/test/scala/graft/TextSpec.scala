package graft

import graft.functions.{FingerprintExpr, TextFunctions}
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  test("token count equals driver-side split length") {
    val rows = Tables.documents(spark, sfDir).select("doc_id", "text").limit(50).collect()
    val counted = SparkEntry.queries("q_token_count")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(counted(r.getLong(0)) == r.getString(1).split("\\s+").length.toLong)
    }
  }

  test("BPE pre-tokenizer count matches a driver-side regex and never undercounts whitespace tokens") {
    val rows = Tables.documents(spark, sfDir).select("doc_id", "text").limit(50).collect()
    val counted = SparkEntry.queries("q_token_count_bpe")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val p = java.util.regex.Pattern.compile(TextFunctions.BpePattern)
    rows.foreach { r =>
      val m = p.matcher(r.getString(1))
      var n = 0L
      while (m.find()) n += 1
      assert(counted(r.getLong(0))._2 == n, s"doc ${r.getLong(0)} bpe count mismatch")
      // a whitespace token splits into >= 1 pre-tokens
      assert(counted(r.getLong(0))._2 >= counted(r.getLong(0))._1)
    }
  }

  test("tfidf search returns descending positive scores for docs containing query tokens") {
    val hits = SparkEntry.queries("q_tfidf_search")(spark, sfDir).collect()
    assert(hits.nonEmpty && hits.length <= 50)
    assert(hits.forall(_.getAs[Double]("score") > 0))
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "scores must be non-increasing")
  }

  test("bm25 scores are ranked, positive, and saturation-capped (unlike raw tf-idf)") {
    val hits = SparkEntry.queries("q_bm25_search")(spark, sfDir).collect()
    assert(hits.nonEmpty && hits.length <= 50)
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "scores must be non-increasing")
    // The BM25 cap: tf·(k1+1)/(tf + …) < k1+1, so no doc can score
    // above (k1+1)·Σ idf — the saturation property raw tf·idf lacks.
    // Re-derive the 3 query idf4s exactly as the operator does.
    val docs = Tables.documents(spark, sfDir)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val n = tf.select("doc_id").distinct().count()
    val idf4s = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc).limit(3)
      .collect().map(r => math.floor((n - r.getLong(1) + 0.5) / (r.getLong(1) + 0.5) * 10000 + 0.5))
    val cap = 2.2 * idf4s.sum / 10000.0
    assert(scores.forall(_ <= cap + 1e-9), s"score above the (k1+1)·Σidf saturation cap $cap")
  }

  test("quality score stays in [0,1] and penalizes stopword-heavy docs") {
    val q = SparkEntry.queries("q_text_quality")(spark, sfDir)
    assert(q.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    assert(q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
  }

  test("lang id predicts a known language with marker-count evidence") {
    val l = SparkEntry.queries("q_lang_id")(spark, sfDir)
    val langs = TextFunctions.LangMarkers.map(_._1).toSet
    assert(l.filter(!col("pred_lang").isin(langs.toSeq: _*)).count() == 0)
    assert(l.filter(col("n_hits") < 0).count() == 0)
    assert(l.count() == Tables.documents(spark, sfDir).count())
  }

  test("codegen fingerprint matches the reference implementation") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").limit(100).collect()
    val fps = SparkEntry.queries("q_doc_fingerprint")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { r =>
      assert(fps(r.getLong(0)) == FingerprintExpr.reference(r.getString(1)),
        s"codegen/reference mismatch for doc ${r.getLong(0)}")
    }
  }

  test("chunking covers every token with the configured overlap") {
    val chunks = SparkEntry.queries("q_doc_chunk")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // Per doc: ceil(n / stride) chunks; all but possibly the last have
    // ChunkTokens tokens; token coverage = no gaps (stride < window).
    val perDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_chunk_tokens").as("sum_tokens"),
        max("n_chunk_tokens").as("max_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    perDoc.foreach { case (id, nChunks, sumTokens, maxTokens) =>
      val n = docs(id)
      val expected = (n + TextFunctions.ChunkStride - 1) / TextFunctions.ChunkStride
      assert(nChunks == expected, s"doc $id: $nChunks chunks for $n tokens")
      assert(maxTokens <= TextFunctions.ChunkTokens)
      assert(sumTokens >= n, s"doc $id: chunks must cover all tokens (overlap makes sum >= n)")
    }
  }

  test("fingerprint expression survives both codegen and interpreted paths") {
    import spark.implicits._
    val df = Seq("", "a", "graft", "é中文").toDF("s")
      .select(expr("graft_fingerprint(s)").as("fp"))
    val expected = Seq("", "a", "graft", "é中文").map(FingerprintExpr.reference)
    assert(df.collect().map(_.getLong(0)).toSeq == expected)
  }

  test("doc repetition scores degenerate repeats high and unique text zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),   // one distinct 3-gram, 4 total
      (2L, "all words here are fully unique"), // no repeated 3-gram
      (3L, "a b")                              // too short: excluded
    ).toDF("doc_id", "text")
    val out = graft.functions.TextFunctions.docRepetitionOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == (4L, 1L, 0.75), s"degenerate doc: ${out(1L)}")
    assert(out(2L) == (4L, 4L, 0.0), s"unique doc: ${out(2L)}")
    // and over the real corpus the ratio is always a valid fraction
    val corpus = SparkEntry.queries("q_doc_repetition")(spark, sfDir)
    assert(corpus.filter(col("dup_ratio") < 0 || col("dup_ratio") > 1).count() == 0)
    assert(corpus.filter(col("n_distinct") > col("n_grams")).count() == 0)
  }

  test("CMS heavy hitters equal the exact top-k, and estimates never undercount") {
    val exact = SparkEntry.queries("q_vocab_topk")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaCms = SparkEntry.queries("q_vocab_topk_cms")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaCms == exact,
      s"CMS shortlist + exact rescore must emit exactly the true top-k")
    // the one-sided CMS guarantee, probed through the expression: every
    // token's estimate >= its exact corpus count
    import org.apache.spark.sql.functions.{call_function, explode, lit, split, xxhash64}
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), "\\s+")).as("token"))
      .select(col("token"), xxhash64(col("token")).as("tokh"))
    val sketch = toks
      .agg(call_function("count_min_sketch",
        col("tokh"),
        lit(graft.functions.TextFunctions.CmsEps),
        lit(graft.functions.TextFunctions.CmsConfidence),
        lit(graft.functions.TextFunctions.CmsSeed)).as("cms"))
      .head().getAs[Array[Byte]]("cms")
    val under = toks.groupBy("tokh").count()
      .withColumn("est", call_function("graft_cms_estimate", lit(sketch), col("tokh")))
      .filter(col("est") < col("count"))
      .count()
    assert(under == 0, s"$under tokens estimated BELOW their true count — CMS contract broken")
  }

  test("substr search equals a contains() scan, with exact hit counts") {
    val phrase = graft.functions.TextFunctions.SearchPhrase
    val expected = Tables.documents(spark, sfDir)
      .filter(col("text").contains(phrase))
      .select("doc_id", "text").collect()
      .map { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val toks = text.split(" ", -1)
        val hits = (0 to toks.length - 3)
          .count(i => toks.slice(i, i + 3).mkString(" ") == phrase)
        (id, hits.toLong)
      }.toMap
    val got = SparkEntry.queries("q_substr_search")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected, s"search mismatch: got=${got.size} want=${expected.size}")
    assert(got.nonEmpty, "phrase must hit at this SF (picked to hit at every SF)")
  }

  test("phrase mining matches a plain-Scala word2phrase model") {
    val texts = Tables.documents(spark, sfDir).select("text").collect().map(_.getString(0))
    val toks = texts.map(_.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nt = uni.values.sum
    val floor = graft.functions.TextFunctions.PhraseMinCount
    val delta = graft.functions.TextFunctions.PhraseDiscount
    val bi = toks.flatMap(t => t.zip(t.tail)).groupBy(identity).view
      .mapValues(_.size.toLong).filter(_._2 >= floor).toMap
    val scored = bi.toSeq.map { case ((w1, w2), cab) =>
      (s"$w1 $w2", cab, (1000L * (cab - delta) * nt) / (uni(w1) * uni(w2)))
    }
    val expected = scored
      .sortBy { case (p, _, s) => (-s, p) }
      .take(graft.functions.TextFunctions.PhraseTopK)
      .sortBy(_._1)
    val got = SparkEntry.queries("q_phrase_mine")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"phrase mining diverges: got=${got.take(3)} want=${expected.take(3)}")
  }

  test("graft_cms_estimate agrees between codegen and interpreted paths") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, lit, xxhash64}
    val items = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("v").select(xxhash64(col("v")).as("h"))
    val sketch = items
      .agg(call_function("count_min_sketch", col("h"), lit(0.001), lit(0.99), lit(7)).as("cms"))
      .head().getAs[Array[Byte]]("cms")
    val probe = Seq(1L, 2L, 3L, 4L).toDF("v").select(xxhash64(col("v")).as("h"))
      .withColumn("est", call_function("graft_cms_estimate", lit(sketch), col("h")))
    val viaCodegen = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // tiny sketch, tiny stream: estimates are exact here
    assert(viaCodegen.map(_._2) == Seq(1L, 2L, 3L, 0L), s"estimates off: $viaCodegen")
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(interpreted == viaCodegen, "codegen/interpreted estimate mismatch")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("graft_cms_estimate rejects a non-constant sketch argument") {
    import org.apache.spark.sql.functions.{call_function, col => c}
    val df = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.xxhash64(c("text")).as("h"))
      .withColumn("b", org.apache.spark.sql.functions.lit(Array[Byte](1, 2)))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      // sha2 of a column is binary-castable but NOT foldable — rejected
      df.withColumn("bad", call_function("graft_cms_estimate",
        org.apache.spark.sql.functions.sha2(c("h").cast("string"), 256).cast("binary"),
        c("h"))).collect()
    }
    assert(err.getMessage.contains("foldable literal"), s"wrong rejection: ${err.getMessage}")
  }
}
