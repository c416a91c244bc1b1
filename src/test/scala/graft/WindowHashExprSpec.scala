package graft

import org.apache.spark.sql.functions._

class WindowHashExprSpec extends SparkSpec {
  import spark.implicits._

  /** The HOF composition the fused Expression replaced — kept as the
    * oracle it must match bit-for-bit.
    */
  private def composition(w: Int) = expr(
    s"CASE WHEN size(w) >= $w THEN " +
      s"transform(sequence(0, size(w) - $w), s -> xxhash64(slice(transform(w, t -> xxhash64(t)), s + 1, $w))) " +
      "ELSE cast(array() as array<bigint>) END")

  test("graft_window_hashes equals the transform/slice composition on the corpus") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("fast", expr("graft_window_hashes(w, 8)"))
      .withColumn("slow", composition(8))
    assert(docs.filter(not(col("fast") <=> col("slow"))).count() == 0,
      "fused window hashes diverge from the HOF composition")
    assert(docs.filter(size(col("fast")) > 0).count() > 0, "corpus must produce windows")
  }

  test("edge shapes: short docs, exact-width docs, null slots, multibyte unicode") {
    val rows = Seq(
      (1L, Seq("a", "b", "c").map(Option(_))),                          // shorter than width
      (2L, Seq("a", "b", "c", "d").map(Option(_))),                     // exactly width
      (3L, Seq("a", "b", "c", "d", "e").map(Option(_))),                // one extra window
      (4L, Seq(Some("a"), None, Some("c"), Some("d"), Some("e"))),      // null token slot
      (5L, Seq("日本語", "テキスト", "处理", "möéü", "𝄞clef").map(Option(_))) // multibyte UTF-8
    ).toDF("doc_id", "w")
    val out = rows
      .withColumn("fast", expr("graft_window_hashes(w, 4)"))
      .withColumn("slow", composition(4))
    val got = out.collect().map(r =>
      r.getLong(0) -> (r.getSeq[Long](2), r.getSeq[Long](3))).toMap
    got.foreach { case (id, (fast, slow)) =>
      assert(fast == slow, s"doc $id diverges: $fast vs $slow")
    }
    assert(got(1L)._1.isEmpty, "sub-width doc yields no windows")
    assert(got(2L)._1.length == 1 && got(3L)._1.length == 2, "window counts wrong")
  }

  test("codegen and interpreted evaluation agree") {
    val df = Seq((1L, (1 to 12).map(i => s"tok$i"))).toDF("doc_id", "w")
    val viaCodegen = df.withColumn("gh", expr("graft_window_hashes(w, 8)")).collect()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.withColumn("gh", expr("graft_window_hashes(w, 8)")).collect()
      assert(viaCodegen.map(_.toString).toSeq == interpreted.map(_.toString).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("a non-literal or out-of-range width is rejected loudly") {
    val df = Seq((1L, Seq("a", "b"), 2)).toDF("doc_id", "w", "k")
    val exNonLit = intercept[Exception] {
      df.selectExpr("graft_window_hashes(w, k)").collect()
    }
    assert(exNonLit.getMessage.contains("foldable int"), exNonLit.getMessage)
    val exZero = intercept[Exception] {
      df.selectExpr("graft_window_hashes(w, 0)").collect()
    }
    assert(exZero.getMessage.contains("out of range"), exZero.getMessage)
  }
}
