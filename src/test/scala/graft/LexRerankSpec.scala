package graft

import org.apache.spark.sql.functions._

/** The lexical re-rank POLICY loop (r19) — `q_ivf_refit`'s twin for
  * the standing inverted index: `lexRerank` consumes the settled-vs-
  * batch dictionary drift (the signal `lexDelta`/`lexStats` publish
  * but nothing read) and, when due in artifacts mode, republishes the
  * whole-corpus quartet every BM25/TF-IDF/hybrid consumer reads. Pins
  * the decision arithmetic against independently derived dictionaries,
  * that the standing ingest slice crosses the threshold, and the loop:
  * due → quartet committed → a retrieval consumer SERVES it (no
  * re-tokenize) identically to a fresh inline build.
  */
class LexRerankSpec extends SparkSpec {
  import graft.similarity.LexIndex
  import graft.dedup.Dedup.{DeltaBatchMod, DeltaBatchRem}

  test("re-rank decision recomputes from independently derived dictionaries and is due on the standing batch slice") {
    spark.catalog.clearCache()
    val isBatch = pmod(col("doc_id"), lit(DeltaBatchMod)) === DeltaBatchRem
    def dict(docs: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
      LexIndex.tokenizedTf(docs)
        .groupBy("tok").agg(count(lit(1)).as("df"), sum("tf").as("ttf"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val s = dict(Tables.documents(spark, sfDir).filter(!isBatch))
    val b = dict(Tables.documents(spark, sfDir).filter(isBatch))
    val newTerms = b.keySet.diff(s.keySet).size.toLong
    val nDocsS = Tables.documents(spark, sfDir).filter(!isBatch).count()
    val nDocsB = Tables.documents(spark, sfDir).filter(isBatch).count()
    val docGrowth = nDocsB * 10000 / nDocsS
    val ttfGrowth = b.values.map(_._2).sum * 10000 / s.values.map(_._2).sum
    val top = s.toSeq.sortBy { case (tok, (df, _)) => (-df, tok) }.take(LexIndex.StatsTopK)
    val maxTop = top.map { case (tok, (df, _)) =>
      b.get(tok).map(_._1).getOrElse(0L) * 10000 / df
    }.max
    val due = docGrowth >= LexIndex.RerankGrowthBp || maxTop >= LexIndex.RerankHotTermBp

    val r = LexIndex.lexRerank(spark, sfDir).collect()(0)
    assert(r.getLong(r.fieldIndex("n_terms_settled")) == s.size.toLong)
    assert(r.getLong(r.fieldIndex("n_terms_new")) == newTerms)
    assert(r.getLong(r.fieldIndex("doc_growth_bp")) == docGrowth)
    assert(r.getLong(r.fieldIndex("ttf_growth_bp")) == ttfGrowth)
    assert(r.getLong(r.fieldIndex("max_top_df_growth_bp")) == maxTop)
    assert(r.getBoolean(r.fieldIndex("rerank_due")) == due)
    assert(due, s"standing batch slice must cross RerankGrowthBp: doc_growth=$docGrowth")
    spark.catalog.clearCache()
  }

  test("threshold crossed -> re-rank republishes the quartet -> retrieval serves it identically to a fresh build") {
    spark.catalog.clearCache()
    // hybridSearch is the index-BACKED retrieval consumer (bm25Search
    // stays inline by design, the timed build authority). Hybrid's
    // semantic leg deliberately DIFFERS between inline and artifacts
    // mode (exact scan vs IVF probe — the documented trade), so the
    // parity baseline is a CONSUMER-OWNED index build under its own
    // artifacts root, compared against serving the POLICY-published
    // root: same mode, only the publisher differs.
    val rootA = java.nio.file.Files.createTempDirectory("graft_rerank_base").toString
    def rmRec(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRec)
      f.delete(): Unit
    }
    spark.conf.set("spark.graft.artifacts", rootA)
    val baseline =
      try graft.similarity.Hybrid.hybridSearch(spark, sfDir).collect().map(_.toSeq).toSeq
      finally { spark.conf.unset("spark.graft.artifacts"); rmRec(new java.io.File(rootA)) }
    spark.catalog.clearCache()
    val root = java.nio.file.Files.createTempDirectory("graft_rerank_art").toString
    spark.conf.set("spark.graft.artifacts", root)
    try {
      LexIndex.lexRerank(spark, sfDir).collect(): Unit
      Seq("lex_postings", "lex_terms", "lex_doclens", "lex_totals").foreach { a =>
        val d = new java.io.File(s"$root/$a")
        assert(d.exists(), s"re-rank must publish $a")
        val fps = d.listFiles().filter(_.getName.startsWith("fp="))
        assert(fps.nonEmpty && fps.forall(fp => new java.io.File(fp, "_SUCCESS").exists()),
          s"re-rank's $a publish must be committed")
      }
      spark.catalog.clearCache()
      val consumed = scala.collection.mutable.Set.empty[String]
      graft.sources.Artifacts.onBeforeConsume = (name, _) => { consumed += name: Unit }
      val served =
        try graft.similarity.Hybrid.hybridSearch(spark, sfDir)
          .collect().map(_.toSeq).toSeq
        finally graft.sources.Artifacts.onBeforeConsume = (_, _) => ()
      assert(Seq("lex_postings", "lex_terms", "lex_doclens", "lex_totals")
        .forall(consumed.contains),
        s"consumer must read the re-ranked quartet, consumed: $consumed")
      assert(served == baseline,
        "retrieval served from the re-rank's quartet must equal the consumer's own fresh index build")
    } finally {
      spark.conf.unset("spark.graft.artifacts")
      spark.catalog.clearCache()
      rmRec(new java.io.File(root))
    }
  }
}
