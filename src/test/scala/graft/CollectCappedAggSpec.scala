package graft

import org.apache.spark.sql.functions._

class CollectCappedAggSpec extends SparkSpec {
  import spark.implicits._

  test("graft_collect_capped equals collect_list (as a set) for under-cap groups") {
    val df = Seq(
      (1L, 10), (1L, 11), (1L, 12),
      (2L, 20),
      (3L, 30), (3L, 31)).toDF("k", "v").repartition(8)
    val capped = df.groupBy("k")
      .agg(expr("graft_collect_capped(v, 3)").as("occ"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    val plain = df.groupBy("k")
      .agg(collect_list("v").as("occ"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSet).toMap
    assert(capped == plain, s"under-cap groups must match collect_list: $capped vs $plain")
  }

  test("an over-cap group yields NULL deterministically, regardless of partitioning") {
    // Overflow depends only on the group's TOTAL count, never on how
    // rows split across map-side partials — the property that makes
    // cap-exclusion a well-defined query semantics rather than a
    // physical-plan artifact.
    val rows = (1 to 50).map(i => (1L, i)) ++ Seq((2L, 100), (2L, 101))
    for (parts <- Seq(1, 7, 32)) {
      val out = rows.toDF("k", "v").repartition(parts).groupBy("k")
        .agg(expr("graft_collect_capped(v, 10)").as("occ"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Int](1).toSet))).toMap
      assert(out(1L).isEmpty, s"parts=$parts: 50 > 10 must overflow to NULL")
      assert(out(2L).contains(Set(100, 101)), s"parts=$parts: under-cap group intact")
    }
  }

  test("exactly-cap does not overflow; cap+1 does; nulls are skipped like collect_list") {
    val df = (Seq.tabulate(5)(i => (1L, Some(i))) ++     // exactly cap
      Seq.tabulate(6)(i => (2L, Some(i))) ++             // cap + 1
      Seq((3L, Some(7)), (3L, Option.empty[Int])))       // null element skipped
      .toDF("k", "v").repartition(4)
    val out = df.groupBy("k")
      .agg(expr("graft_collect_capped(v, 5)").as("occ"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getSeq[Int](1).toSet))).toMap
    assert(out(1L).contains((0 until 5).toSet), "exactly cap elements are kept")
    assert(out(2L).isEmpty, "cap+1 overflows")
    assert(out(3L).contains(Set(7)), "null inputs do not count toward the cap")
  }

  test("struct elements survive the shuffle serialization round-trip") {
    val df = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 3))
      .toDF("k", "d", "s").repartition(3)
    val out = df.groupBy("k")
      .agg(expr("graft_collect_capped(struct(d, s), 100)").as("occ"))
      .select(col("k"), expr("transform(occ, o -> concat(o.d, ':', o.s))").as("pairs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(out == Map(1L -> Set("10:1", "11:2"), 2L -> Set("20:3")), s"got $out")
  }

  test("sort-based aggregation fallback round-trips buffers through serialize/deserialize") {
    // ObjectHashAggregateExec falls back to sort-based aggregation after
    // `fallbackThreshold` distinct keys per partition, and the sort path
    // serializes every in-flight buffer — at corpus scale (hundreds of
    // thousands of window hashes per partition) this IS the production
    // path, so pin it explicitly with a threshold of 2.
    val prev = spark.conf.getOption("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    try {
      val rows = (1 to 200).flatMap(k => (1 to (k % 7 + 1)).map(i => (k.toLong, k * 100 + i)))
      val out = rows.toDF("k", "v").repartition(4).groupBy("k")
        .agg(expr("graft_collect_capped(v, 5)").as("occ"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getSeq[Int](1).toSet))).toMap
      assert(out.size == 200)
      (1 to 200).foreach { k =>
        val expected = (1 to (k % 7 + 1)).map(i => k * 100 + i).toSet
        if (expected.size > 5) assert(out(k.toLong).isEmpty, s"key $k should overflow")
        else assert(out(k.toLong).contains(expected), s"key $k lost elements through the sort path")
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v)
      case None    => spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }
  }

  test("a non-literal or non-positive cap is rejected loudly") {
    val df = Seq((1L, 1)).toDF("k", "v")
    val exNonLit = intercept[Exception] {
      df.groupBy("k").agg(expr("graft_collect_capped(v, v)")).collect()
    }
    assert(exNonLit.getMessage.contains("integer literal cap"), exNonLit.getMessage)
    val exZero = intercept[Exception] {
      df.groupBy("k").agg(expr("graft_collect_capped(v, 0)")).collect()
    }
    assert(exZero.getMessage.contains("cap > 0"), exZero.getMessage)
  }
}
