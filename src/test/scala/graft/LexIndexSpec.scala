package graft

import org.apache.spark.sql.functions._

/** Lexical-index maintenance (r17): the delta merge's full-rebuild
  * contract, the published-mode consumption shape, and the health
  * report's planted-hot-term visibility (the `GenScaleSpec` pattern —
  * the report must SURFACE the pathology it exists to catch).
  */
class LexIndexSpec extends SparkSpec {
  import graft.similarity.LexIndex

  test("lexDelta: merged dictionary equals the full rebuild, for every merged frame") {
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sfDir)
    val fullTf = LexIndex.tokenizedTf(docs)
    val (_, fullTerms, fullDls, fullTotals) = LexIndex.derive(fullTf)
    // q_lex_delta's own output (terms) — the oracle re-proves this in
    // DuckDB; here it pins inline too.
    val merged = LexIndex.lexDelta(spark, sfDir).collect().map(_.toSeq).toSet
    assert(merged == fullTerms.collect().map(_.toSeq).toSet,
      "delta-merged term dictionary must equal the full rebuild")
    // The other three frames merge by the same monoid: batch docs are
    // new doc_ids, so postings/doclens union disjointly and totals add.
    import graft.dedup.Dedup.{DeltaBatchMod, DeltaBatchRem}
    val isBatch = pmod(col("doc_id"), lit(DeltaBatchMod)) === DeltaBatchRem
    val sTf = LexIndex.tokenizedTf(docs.filter(!isBatch))
    val bTf = LexIndex.tokenizedTf(docs.filter(isBatch))
    assert(sTf.unionByName(bTf).collect().map(_.toSeq).toSet ==
      fullTf.collect().map(_.toSeq).toSet, "postings upsert != full rebuild")
    val (_, _, sDls, sTotals) = LexIndex.derive(sTf)
    val (_, _, bDls, bTotals) = LexIndex.derive(bTf)
    assert(sDls.unionByName(bDls).collect().map(_.toSeq).toSet ==
      fullDls.collect().map(_.toSeq).toSet, "doclens upsert != full rebuild")
    val (st, bt, ft) = (sTotals.head(), bTotals.head(), fullTotals.head())
    assert(st.getLong(0) + bt.getLong(0) == ft.getLong(0), "n_docs merge")
    assert(st.getLong(1) + bt.getLong(1) == ft.getLong(1), "t_tok merge")
    spark.catalog.clearCache()
  }

  test("published mode: settled index published once, delta consumes the committed parquet") {
    spark.catalog.clearCache()
    val inline = LexIndex.lexDelta(spark, sfDir).collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    val root = java.nio.file.Files.createTempDirectory("graft_lex_art").toString
    spark.conf.set("spark.graft.artifacts", root)
    try {
      val published = LexIndex.lexDelta(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(published == inline, "published-mode merge differs from inline")
      assert(new java.io.File(s"$root/lex_settled_terms").exists(), "settled terms not published")
      assert(new java.io.File(s"$root/lex_settled_postings").exists(), "settled postings not published")
      spark.catalog.clearCache()
      // The daily re-run reads the lake-resident dictionary: the plan's
      // only corpus-text tokenize is the batch slice (the settled side
      // enters as a parquet scan of the published artifact).
      val again = LexIndex.lexDelta(spark, sfDir)
      assert(again.collect().map(_.toSeq).toSeq == inline)
      // The logical relation's file index carries the artifact path
      // (plan toString prints relations without locations, and AQE
      // hides physical stages from collect).
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val scans = again.queryExecution.analyzed.collect {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.mkString(",")
          case _ => ""
        }
      }
      assert(scans.exists(_.contains("lex_settled_terms")),
        s"re-run must consume the published settled dictionary; scans: $scans")
      // ... and the only corpus-text read is the batch slice: the
      // settled tokenize (a NOT-pmod filter over documents) must be
      // absent — the settled side enters as the published parquet.
      assert(scans.exists(_.contains("documents.parquet")), "batch slice still reads the corpus")
      val planStr = again.queryExecution.analyzed.toString
      assert(!planStr.contains("NOT (pmod"),
        "settled slice must come from the published index, not a corpus re-tokenize")
    } finally {
      spark.conf.unset("spark.graft.artifacts")
      spark.catalog.clearCache()
    }
  }

  test("lexStats: planted df-degenerate hot term surfaces at the top of the report") {
    import spark.implicits._
    // 200 docs; 30% carry the boilerplate token (the GenScale
    // adversarial shape), every doc carries a unique cold token — the
    // report must rank the hot term first with its exact df/mass.
    val docs = (0 until 200)
      .map(i => (i.toLong, if (i % 10 < 3) s"hotterm uniq$i" else s"uniq$i"))
      .toDF("doc_id", "text")
    val (_, terms, _, totals) = LexIndex.derive(LexIndex.tokenizedTf(docs))
    val rows = LexIndex.lexStatsOf(terms, totals).collect()
    assert(rows.length == LexIndex.StatsTopK)
    val top = rows.head
    assert(top.getString(0) == "hotterm", s"hot term must rank first: ${top}")
    assert(top.getLong(1) == 60L && top.getLong(2) == 60L)
    assert(top.getDouble(3) == 0.3, "df_frac = 60/200")
    // total tokens = 200 unique + 60 hot = 260
    assert(top.getDouble(4) == math.floor(60.0 / 260.0 * 10000 + 0.5) / 10000)
    // Every emitted fraction recomputes from its own integers.
    rows.foreach { r =>
      assert(r.getDouble(3) == math.floor(r.getLong(1).toDouble / 200.0 * 10000 + 0.5) / 10000)
    }
  }

  test("q_lex_stats over the fixture: fractions recompute, report is dictionary-bounded") {
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val tTok = docs.select(sum(size(split(col("text"), "\\s+")))).head.getLong(0)
    val rows = SparkEntry.queries("q_lex_stats")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= LexIndex.StatsTopK)
    rows.foreach { r =>
      assert(r.getDouble(3) ==
        math.floor(r.getLong(1).toDouble / nDocs * 10000 + 0.5) / 10000)
      assert(r.getDouble(4) ==
        math.floor(r.getLong(2).toDouble / tTok * 10000 + 0.5) / 10000)
    }
    // df is non-increasing down the report (the hottest-first contract).
    val dfs = rows.map(_.getLong(1))
    assert(dfs.zip(dfs.tail).forall { case (a, b) => a >= b })
    spark.catalog.clearCache()
  }
}
