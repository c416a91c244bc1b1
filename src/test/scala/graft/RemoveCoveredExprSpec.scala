package graft

import org.apache.spark.sql.functions._

class RemoveCoveredExprSpec extends SparkSpec {
  import spark.implicits._

  /** The expand-then-probe composition the fused Expression replaced —
    * kept as the oracle it must match exactly.
    */
  private def composition(w: Int) = expr(
    s"filter(w, (t, i) -> NOT array_contains(" +
      s"array_distinct(flatten(transform(starts, s -> sequence(s, s + $w - 1)))), i))")

  test("graft_remove_covered equals the expand-then-probe composition on the corpus windows") {
    // Drive it with the REAL covered frame of the substr-dedup pipeline:
    // every doc's actual repeated-window starts at sf level.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("ghs", expr("graft_window_hashes(w, 8)"))
    val covered = docs
      .select(col("doc_id"), posexplode(col("ghs")).as(Seq("s", "gh")))
      .groupBy("gh")
      .agg(collect_list(struct(col("doc_id"), col("s"))).as("occ"))
      .filter(expr("size(array_distinct(transform(occ, o -> o.doc_id))) >= 2"))
      .select(explode(col("occ")).as("o"))
      .select(col("o.doc_id").as("doc_id"), col("o.s").as("s"))
      .groupBy("doc_id").agg(collect_list(col("s")).as("starts"))
    val both = docs
      .join(covered, Seq("doc_id"), "left")
      .withColumn("starts", coalesce(col("starts"), expr("cast(array() as array<int>)")))
      .withColumn("fast", expr("graft_remove_covered(w, starts, 8)"))
      .withColumn("slow", composition(8))
    assert(both.filter(not(col("fast") <=> col("slow"))).count() == 0,
      "fused removal diverges from the composition")
    assert(both.filter(size(col("starts")) > 0).count() > 0, "corpus must contain covered docs")
  }

  test("edge shapes: overlaps, duplicates, nulls, and out-of-range starts match the composition") {
    val rows = Seq(
      // overlapping + duplicate starts
      (1L, Seq("a", "b", "c", "d", "e", "f").map(Option(_)), Seq(Some(0), Some(2), Some(2))),
      // full coverage
      (2L, Seq("a", "b", "c").map(Option(_)), Seq(Some(0))),
      // null token inside and outside a covered span
      (3L, Seq(Some("a"), None, Some("c"), None, Some("e")), Seq(Some(1))),
      // start past the end and negative start: clamp, never crash
      (5L, Seq("a", "b", "c").map(Option(_)), Seq(Some(5), Some(-2))),
      // no starts at all
      (6L, Seq("a", "b").map(Option(_)), Seq.empty[Option[Int]])
    ).toDF("doc_id", "w", "starts")
    for (w <- Seq(1, 2, 3)) {
      val out = rows
        .withColumn("fast", expr(s"graft_remove_covered(w, starts, $w)"))
        .withColumn("slow", composition(w))
        .collect()
      out.foreach { r =>
        assert(r.getSeq[String](3) == r.getSeq[String](4),
          s"width $w doc ${r.getLong(0)}: ${r.getSeq[String](3)} vs ${r.getSeq[String](4)}")
      }
    }
    // A NULL starts SLOT is where the Expression deliberately diverges
    // from the composition: flatten-over-null nulls the whole covered
    // array there and the filter lambda then drops EVERY token — a
    // composition artifact, not a semantics anyone wants. The fused form
    // skips the null slot and honors the rest (the pipeline's
    // collect_list can't produce null slots, but a parquet round-trip of
    // a hand-assembled frame can).
    val nullSlot = Seq((4L, Seq("a", "b", "c", "d").map(Option(_)), Seq(Option.empty[Int], Some(1))))
      .toDF("doc_id", "w", "starts")
      .withColumn("fast", expr("graft_remove_covered(w, starts, 2)"))
      .head()
    assert(nullSlot.getSeq[String](3) == Seq("a", "d"),
      s"null start slot must be skipped, rest honored: ${nullSlot.getSeq[String](3)}")
  }

  test("codegen and interpreted evaluation agree") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i"), Seq(2, 7))).toDF("doc_id", "w", "starts")
    val viaCodegen = df.withColumn("c", expr("graft_remove_covered(w, starts, 3)")).collect()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.withColumn("c", expr("graft_remove_covered(w, starts, 3)")).collect()
      assert(viaCodegen.map(_.toString).toSeq == interpreted.map(_.toString).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(viaCodegen.head.getSeq[String](3) == Seq("t1", "t2", "t6", "t7"))
  }
}
