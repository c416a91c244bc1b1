package graft

import org.apache.spark.sql.functions._

class MinHashExprSpec extends SparkSpec {

  test("graft_minhash equals the k-fold array_min(transform(xxhash64)) composition") {
    val k = graft.dedup.Dedup.MinHashK
    val sh = graft.dedup.Dedup.shingles(Tables.documents(spark, sfDir))
      .select(col("doc_id"), xxhash64(col("sg")).as("sg"))
      .groupBy("doc_id").agg(collect_list("sg").as("sh"))
    val hof = (0 until k).map(i => expr(s"array_min(transform(sh, s -> xxhash64(s, $i)))"))
    val both = sh
      .withColumn("fast", expr(s"graft_minhash(sh, $k)"))
      .withColumn("slow", array(hof: _*))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0,
      "codegen minhash diverges from the SQL composition")
    assert(both.count() > 0)
  }

  test("graft_minhash survives whole-stage codegen and interpreted eval identically") {
    import spark.implicits._
    val df = Seq((1L, Seq(7L, 8L, 9L)), (2L, Seq(7L))).toDF("id", "sh")
    val viaCodegen = df.withColumn("m", expr("graft_minhash(sh, 4)")).collect()
    // Force the TRUE interpreted path. Disabling wholeStage alone is not
    // enough — projections are still compiled per-expression via
    // GenerateUnsafeProjection, so nullSafeEval would stay uncovered.
    // factoryMode=NO_CODEGEN makes the projection factory use
    // InterpretedUnsafeProjection, which calls Expression#eval.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.withColumn("m", expr("graft_minhash(sh, 4)")).collect()
      assert(viaCodegen.map(_.toString).toSeq == interpreted.map(_.toString).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // Belt and braces: exercise nullSafeEval directly, no planner involved.
    val direct = graft.functions.MinHashExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(7L, 8L, 9L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)),
      org.apache.spark.sql.catalyst.expressions.Literal(4))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(direct.toSeq == viaCodegen(0).getSeq[Long](2))
    // shared-element property: doc 2's single shingle appears in doc 1's
    // set, so doc 1's mins are elementwise <= doc 2's
    val m = viaCodegen.map(r => r.getSeq[Long](2)).toSeq
    assert(m(0).zip(m(1)).forall { case (a, b) => a <= b })
  }

  test("graft_minhash stays bit-exact with the HOF composition on nullable-element arrays") {
    import spark.implicits._
    // Option[Long] elements → ArrayType(LongType, containsNull=true) — the
    // schema EVERY parquet read reports, so the scratch-staging mode feeds
    // exactly this shape (an analysis-time rejection here broke scratch
    // Verify in r8). Spark's xxhash64 skips null fields in its fold, so
    // xxhash64(null, i) = hashInt(i, seed) — the Expression must match
    // that, not read an undefined raw slot.
    val df = Seq(
      (1L, Seq(Some(7L), None, Some(9L))),
      (2L, Seq[Option[Long]](None)),
      (3L, Seq(Some(7L)))).toDF("id", "sh")
    val k = 4
    val hof = (0 until k).map(i => expr(s"array_min(transform(sh, s -> xxhash64(s, $i)))"))
    val both = df
      .withColumn("fast", expr(s"graft_minhash(sh, $k)"))
      .withColumn("slow", array(hof: _*))
      .collect()
    for (r <- both)
      assert(r.getSeq[Long](2) == r.getSeq[Long](3),
        s"row ${r.getLong(0)}: codegen ${r.getSeq[Long](2)} != composition ${r.getSeq[Long](3)}")
  }

  test("graft_minhash accepts a parquet-round-tripped (nullable-schema) staged frame") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("minhash_rt").toString
    Seq((1L, Seq(7L, 8L, 9L)), (2L, Seq(7L))).toDF("id", "sh")
      .write.mode("overwrite").parquet(dir)
    // parquet read-back always reports array elements nullable — this is
    // the exact shape scratch staging hands to graft_minhash
    val back = spark.read.parquet(dir)
    val direct = Seq((1L, Seq(7L, 8L, 9L)), (2L, Seq(7L))).toDF("id", "sh")
    val a = back.withColumn("m", expr("graft_minhash(sh, 8)")).select("id", "m")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = direct.withColumn("m", expr("graft_minhash(sh, 8)")).select("id", "m")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b, "round-tripped schema must not change minhash values")
  }
}
