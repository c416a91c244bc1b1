package graft

import org.apache.spark.sql.functions._

class SimHashExprSpec extends SparkSpec {

  /** The r3-r12 explode + 64-column ±1 vote aggregate — kept here as the
    * oracle the scan-local Expression must match bit-for-bit.
    */
  private def aggregateFingerprints(docs: org.apache.spark.sql.DataFrame) = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitAggs = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i")
    }
    val votes = toks.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val fp = (0 until 64)
      .map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    votes.select(col("doc_id"), fp.as("fp"))
  }

  test("graft_simhash equals the explode+vote-aggregate composition on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val fast = graft.dedup.Dedup.simhashFingerprints(docs)
    val slow = aggregateFingerprints(docs)
    assert(fast.count() == slow.count(), "fingerprint row counts diverge")
    val joined = fast.toDF("doc_id", "fast").join(slow.toDF("doc_id", "slow"), "doc_id")
    assert(joined.filter(col("fast") =!= col("slow")).count() == 0,
      "scan-local simhash diverges from the aggregate composition")
    assert(joined.count() > 0)
  }

  test("graft_simhash survives whole-stage codegen and interpreted eval identically") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),
      (3L, "a b a b a"),          // duplicate tokens: frequency-weighted votes
      (4L, ""),                   // split("", " ") = [""] — one empty token
      (5L, "solo")).toDF("doc_id", "text")
    val viaCodegen = df.withColumn("fp", expr("graft_simhash(split(text, ' '))")).collect()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.withColumn("fp", expr("graft_simhash(split(text, ' '))")).collect()
      assert(viaCodegen.map(_.toString).toSeq == interpreted.map(_.toString).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // identical texts → identical fingerprints; hamming to a different
    // text is positive
    val byId = viaCodegen.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(1L) == byId(2L))
    assert(java.lang.Long.bitCount(byId(1L) ^ byId(3L)) > 0)
  }

  test("graft_simhash null-slot vote matches xxhash64(null) = seed, and null text yields null") {
    import spark.implicits._
    // A nullable-element token array (the schema every parquet read
    // reports). xxhash64(null) skips the null field in its fold and
    // returns the bare seed 42 — the Expression votes with 42L for the
    // null slot, so it must equal the same array with null replaced by
    // any token whose hash is 42... instead pin directly against the
    // aggregate composition, which inherits xxhash64's null fold.
    val arr = Seq((1L, Seq(Some("a"), None, Some("b"))), (2L, Seq[Option[String]](None)))
      .toDF("doc_id", "toks")
    val fast = arr.withColumn("fp", expr("graft_simhash(toks)"))
    val slow = {
      val toks = arr.select(col("doc_id"), explode(col("toks")).as("tok"))
        .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      val bitAggs = (0 until 64).map { i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$i")
      }
      val votes = toks.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      val fp = (0 until 64)
        .map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
        .reduce((x, y) => x.bitwiseOR(y))
      votes.select(col("doc_id"), fp.as("fp"))
    }
    val j = fast.select(col("doc_id"), col("fp").as("fast"))
      .join(slow.toDF("doc_id", "slow"), "doc_id")
    assert(j.filter(col("fast") =!= col("slow")).count() == 0,
      "null-slot vote diverges from the xxhash64 null fold")
    // null text: explode(split(null)) dropped the doc; the filter in
    // simhashFingerprints preserves that contract
    val withNull = Seq((1L, "a b"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val fps = graft.dedup.Dedup.simhashFingerprints(withNull)
    assert(fps.count() == 1 && fps.head.getLong(0) == 1L)
  }

  test("graft_simhash matches the composition on randomized multibyte unicode tokens") {
    import spark.implicits._
    // The corpus identity test covers ASCII only; the hashing contract
    // (XXH64.hashUTF8String == xxhash64 over the UTF-8 bytes) must hold
    // on multibyte input too — 2/3/4-byte sequences exercise the
    // tail-handling paths of the hash.
    val rnd = new scala.util.Random(20260814)
    val pool: IndexedSeq[String] = IndexedSeq(
      "héllo", "naïve", "日本語", "データ", "обучение", "مرحبا", "🙂", "🚀🔥",
      "mix日本", "ö", "a", "ß", "çà", "한국어", "ข้อความ", "é") // combining accent
    val docs = (1L to 60L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(30))(pool(rnd.nextInt(pool.size))).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val fast = graft.dedup.Dedup.simhashFingerprints(df).toDF("doc_id", "fast")
    val slow = aggregateFingerprints(df).toDF("doc_id", "slow")
    val j = fast.join(slow, "doc_id")
    assert(j.count() == 60)
    assert(j.filter(col("fast") =!= col("slow")).count() == 0,
      "multibyte tokens diverge between scan-local and aggregate simhash")
  }
}
