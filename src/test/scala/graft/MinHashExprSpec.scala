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
    // force interpreted path
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.withColumn("m", expr("graft_minhash(sh, 4)")).collect()
      assert(viaCodegen.map(_.toString).toSeq == interpreted.map(_.toString).toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    // shared-element property: doc 2's single shingle appears in doc 1's
    // set, so doc 1's mins are elementwise <= doc 2's
    val m = viaCodegen.map(r => r.getSeq[Long](2)).toSeq
    assert(m(0).zip(m(1)).forall { case (a, b) => a <= b })
  }
}
