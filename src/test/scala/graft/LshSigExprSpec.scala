package graft

import org.apache.spark.sql.functions._

class LshSigExprSpec extends SparkSpec {

  /** The r3-r12 per-plane composition — 64 graft_dot columns against
    * literal plane arrays, OR-folded — kept as the oracle the fused
    * Expression must match bit-for-bit.
    */
  private def compositionSig(vecCol: String): org.apache.spark.sql.Column = {
    val bits = graft.functions.LshSigExpr.planes.zipWithIndex.map { case (plane, i) =>
      val planeSql = plane.mkString("array(", "D, ", "D)")
      val dot = expr(s"graft_dot($vecCol, $planeSql)")
      when(dot > 0d, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  test("graft_lsh_sig equals the 64-plane graft_dot composition on the corpus") {
    val v = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
    val both = v
      .withColumn("fast", expr("graft_lsh_sig(e)"))
      .withColumn("slow", compositionSig("e"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0,
      "fused signature diverges from the per-plane composition")
    assert(both.count() > 0)
  }

  test("graft_lsh_sig survives whole-stage codegen and interpreted eval identically") {
    import spark.implicits._
    val dim = graft.functions.LshSigExpr.Dim
    val rows = Seq(
      (1L, Array.tabulate(dim)(j => math.sin(j + 1).toDouble)),
      (2L, Array.fill(dim)(0d)),                     // all-zero: every dot is 0, no bit strictly > 0
      (3L, Array.tabulate(dim)(j => -math.cos(j).toDouble)))
    val df = rows.toDF("vec_id", "e")
    val viaCodegen = df.withColumn("sig", expr("graft_lsh_sig(e)")).collect()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.withColumn("sig", expr("graft_lsh_sig(e)")).collect()
      assert(viaCodegen.map(_.toString).toSeq == interpreted.map(_.toString).toSeq)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None    => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val byId = viaCodegen.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(2L) == 0L, "zero vector must produce the zero signature (strict > 0 bit rule)")
  }

  test("graft_lsh_sig maps a null vector to NULL (row drops from ANN banding)") {
    // Intended divergence from the retired per-plane composition, which
    // OR-folded `when(null > 0).otherwise(0)` into signature 0L and so
    // silently banded embedding-less rows with the all-negative-dot
    // vectors. The fused Expression is nullIntolerant: NULL signature →
    // null band keys → no candidate pairs for the row. This pin is the
    // contract; see the LshSigExpr scaladoc.
    import spark.implicits._
    val dim = graft.functions.LshSigExpr.Dim
    val df = Seq(
      (1L, Option(Array.tabulate(dim)(j => math.sin(j + 1).toDouble))),
      (2L, Option.empty[Array[Double]])).toDF("vec_id", "e")
    val sigs = df.withColumn("sig", expr("graft_lsh_sig(e)"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(sigs(1L).isDefined, "real vector keeps its signature")
    assert(sigs(2L).isEmpty, "null vector must produce a NULL signature, not 0L")
    // and a null-sig row joins with nothing on a band-key equi-join
    val bands = df.withColumn("sig", expr("graft_lsh_sig(e)"))
      .select(col("vec_id"), col("sig").bitwiseAND(lit(0xFFFFL)).as("band0"))
    val pairs = bands.as("x").join(bands.as("y"),
      col("x.band0") === col("y.band0") && col("x.vec_id") < col("y.vec_id"))
    assert(pairs.count() == 0, "a null band key must never collide")
  }

  test("graft_lsh_sig rejects a wrong-dimension vector loudly") {
    import spark.implicits._
    val bad = Seq((1L, Array.fill(8)(1.0d))).toDF("vec_id", "e")
    val ex = intercept[Exception] {
      bad.withColumn("sig", expr("graft_lsh_sig(e)")).collect()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else t.getMessage :: chain(t.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("expected 64 dims")),
      s"dimension mismatch must fail loudly, got: ${ex.getMessage}")
  }
}
