package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** graft_bpe: the published-merge-table tokenizer. The reference model
  * here is intentionally a DIFFERENT algorithm from the Expression's —
  * it merges only the LEFTMOST occurrence of the best pair per
  * iteration (the oracle CTE's semantics) while the Expression merges
  * all occurrences per pass — so the fuzz parity test exercises the
  * monotone-table equivalence the oracle depends on, not just the
  * implementation against itself.
  */
class BpeSpec extends SparkSpec {

  private val rank = Bpe.Merges.zipWithIndex.map { case ((l, r), i) => (l, r) -> i }.toMap
  private val symId = Bpe.Merges.zipWithIndex.map { case ((l, r), i) => (l + r) -> (Bpe.MergeIdBase + i) }.toMap

  /** Leftmost-single-merge reference (independent of Bpe.encodePre). */
  private def refPre(pre: String): Seq[Int] = {
    var syms = pre.toCharArray.map(_.toString).toVector // ASCII/BMP-only fuzz corpus
    var continue = true
    while (continue) {
      val ranked = syms.indices.dropRight(1)
        .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
      if (ranked.isEmpty) continue = false
      else {
        val (_, i) = ranked.minBy { case (r, i) => (r, i) }
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
      }
    }
    syms.map(s => if (s.length == 1) s.charAt(0).toInt else symId(s))
  }

  private def refEncode(text: String): Seq[Int] =
    text.split(" ", -1).zipWithIndex.flatMap { case (w, i) =>
      refPre(if (i == 0) w else " " + w)
    }.toSeq

  test("published merge table is monotone and id-bijective") {
    // Monotonicity — every operand of merge k exists before k (single
    // codepoint or an earlier merge's product) — is the property that
    // makes merge-all and leftmost-single application equivalent, i.e.
    // the Spark/oracle agreement is by theorem, not coincidence.
    val produced = scala.collection.mutable.Set.empty[String]
    for (((l, r), k) <- Bpe.Merges.zipWithIndex) {
      for (op <- Seq(l, r))
        assert(op.codePointCount(0, op.length) == 1 || produced.contains(op),
          s"merge $k operand '$op' does not exist yet — table not monotone")
      assert(!produced.contains(l + r), s"merge $k re-produces '${l + r}' — ids ambiguous")
      produced += (l + r)
    }
  }

  test("BpeTrain reproduces the frozen published merge table from its training corpus") {
    // Provenance, checked rather than claimed: Bpe.Merges is the
    // trainer's EXACT output on the sf0.01 documents table under the
    // documented rule (most frequent pair first, ties to the
    // lexicographically smallest) — train → publish → apply is a closed
    // loop, and swapping either side breaks this spec loudly.
    val trained = graft.functions.BpeTrain.train(
      Tables.documents(spark, "/root/testdata/sf0.01"), Bpe.Merges.length)
    assert(trained == Bpe.Merges,
      "trainer no longer reproduces the published table — retrain and republish, or fix the trainer")
  }

  test("training on another corpus slice yields a monotone, collision-free, deterministic table") {
    val docs = Tables.documents(spark, sfDir)
    val trained = graft.functions.BpeTrain.train(docs, 48)
    assert(trained.length == 48, "corpus exhausted before requested merges")
    val produced = scala.collection.mutable.Set.empty[String]
    for (((l, r), k) <- trained.zipWithIndex) {
      for (op <- Seq(l, r))
        assert(op.codePointCount(0, op.length) == 1 || produced.contains(op),
          s"merge $k operand '$op' does not exist yet — trained table not monotone")
      assert(!produced.contains(l + r), s"merge $k re-produces '${l + r}'")
      produced += (l + r)
    }
    assert(graft.functions.BpeTrain.train(docs, 48) == trained, "training must be deterministic")
  }

  test("graft_bpe equals the leftmost-single-merge reference on corpus and fuzz inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefghijklmnoprstuvw "
    val fuzz = (1 to 300).map(i =>
      (i.toLong, (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)) ++
      Seq((900L, ""), (901L, " "), (902L, "  "), (903L, "aaaaaaa"), (904L, "ssssst"),
        (905L, "customer customer customer"), (906L, "xqz"), (907L, "a b  c"))
    val corpus = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
    val all = (fuzz ++ corpus).toDF("id", "text")
    val got = all.withColumn("ids", expr("graft_bpe(text)"))
      .select($"id", $"text", $"ids").as[(Long, String, Seq[Int])].collect()
    for ((id, text, ids) <- got)
      assert(ids == refEncode(text), s"id $id: '$text' -> $ids != ${refEncode(text)}")
  }

  test("tokenization is lossless: decode(encode(text)) == text, corpus-wide") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"text").as[String].collect()
    for (t <- docs) assert(Bpe.decode(Bpe.encode(t)) == t)
    // and the declared query's serialized ids decode too (the gate
    // contract space-joins the array; split it back before decoding)
    val q = SparkEntry.queries("q_tokenize_bpe")(spark, sfDir)
      .select($"doc_id", $"token_ids").as[(Long, String)].collect()
    val byId = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .as[(Long, String)].collect().toMap
    for ((id, idsStr) <- q) {
      val ids = if (idsStr.isEmpty) Array.empty[Int] else idsStr.split(" ").map(_.toInt)
      assert(Bpe.decode(ids) == byId(id), s"doc $id does not round-trip")
    }
  }

  test("graft_bpe codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq((1L, "slow scan of a customer table"), (2L, ""), (3L, "xqz zap")).toDF("id", "text")
    val viaCodegen = df.withColumn("ids", expr("graft_bpe(text)")).collect()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.withColumn("ids", expr("graft_bpe(text)")).collect()
      assert(viaCodegen.map(_.toString).toSeq == interpreted.map(_.toString).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("real token lengths compress below characters and above words") {
    val q = SparkEntry.queries("q_tokenize_bpe")(spark, sfDir)
    val stats = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("chars"),
        size(split(col("text"), " ")).cast("long").as("words"))
      .join(q.select(col("doc_id"), col("n_tokens")), "doc_id")
    // a BPE over a trained table must beat character-level encoding on
    // every doc and can never beat one-token-per-word on this vocab
    assert(stats.filter(col("n_tokens") >= col("chars")).count() == 0,
      "BPE failed to compress below character length")
    assert(stats.filter(col("n_tokens") < col("words")).count() == 0,
      "token count fell below pre-token count — impossible")
  }
}
