package graft

import graft.similarity.KMeansFit
import org.apache.spark.sql.functions._

/** Pins the deterministic-fit arithmetic contract `KMeansOracle`
  * replays (any change here must change the SQL generator in
  * lockstep — see KMeansFit's scaladoc):
  * - dot/d2 op order, lowest-index ties, ascending member sums;
  * - hash-prefix init (sample points 0..k-1), fixed Lloyd rounds,
  *   emptied cells keeping their centroid;
  * - `graft_argmin_cell` (the distributed assignment expression)
  *   bit-agreeing with the driver-side argmin on both the codegen and
  *   interpreted paths.
  */
class KMeansFitSpec extends SparkSpec {

  private def pts(seed: Int, n: Int, d: Int): IndexedSeq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(n)(Array.fill(d)(rnd.nextGaussian()))
  }

  test("fit is a pure function of the sample: identical rebuilds, bit-for-bit") {
    val p = pts(7, 300, 16)
    val a = KMeansFit.fit(p, 12, 20)
    val b = KMeansFit.fit(p.map(_.clone), 12, 20)
    assert(a.length == 12 && b.length == 12)
    assert(a.zip(b).forall { case (x, y) => java.util.Arrays.equals(x, y) },
      "two fits of the same sample must produce identical centroid bits")
  }

  test("init is the hash-order prefix: centers 0..k-1 are sample points 0..k-1") {
    // The sample arrives xxhash64-ordered (a uniform permutation), so
    // the prefix IS the classic random init without any RNG. The first
    // implementation was farthest-point init — replaced after the
    // 500k-doc decade caught its outlier-seeding as a scale defect.
    val p = pts(11, 50, 8)
    val cents = KMeansFit.fit(p, 5, 0) // zero Lloyd rounds: raw init
    assert(cents.length == 5)
    assert(cents.zipWithIndex.forall { case (c, i) => java.util.Arrays.equals(c, p(i)) },
      "center i = sample point i")
  }

  test("an emptied cell keeps its previous centroid (no NaNs, stable k)") {
    // Two far blobs + k=3: one centroid must starve after round 1.
    val blobA = IndexedSeq.fill(20)(Array(0.0, 0.0))
    val blobB = IndexedSeq.fill(20)(Array(100.0, 100.0))
    val p = (blobA ++ blobB) :+ Array(1000.0, 1000.0)
    val cents = KMeansFit.fit(p, 3, 10)
    assert(cents.length == 3)
    assert(cents.forall(_.forall(x => !x.isNaN)), "no NaN centroids from empty cells")
  }

  test("assignment ties resolve to the lowest centroid index, both paths") {
    // Two identical centroids: every point must pick index 0.
    val cents = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    val asg = KMeansFit.assignAll(pts(3, 40, 2), cents)
    assert(asg.forall(c => c != 1), "duplicate centroid at index 1 must never win a tie")
  }

  test("graft_argmin_cell agrees with the driver argmin bit-for-bit (codegen and interpreted)") {
    val p = pts(19, 500, 16)
    val cents = KMeansFit.fit(p, 10, 5)
    val driver = KMeansFit.assignAll(p, cents)
    import spark.implicits._
    val df = p.zipWithIndex.map { case (u, i) => (i.toLong, u.toSeq) }.toDF("i", "u")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val got = df
          .withColumn("cell",
            call_function("graft_argmin_cell", col("u"), typedLit(cents.flatten), lit(cents.length)))
          .select("i", "cell").orderBy("i").collect().map(_.getInt(1))
        assert(got.toSeq == driver.toSeq, s"mismatch under $codegen")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("graft_argmin_cell is null-intolerant and validates dims") {
    import spark.implicits._
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val withNull = Seq((1L, Some(Seq(1.0, 0.0))), (2L, None))
      .toDF("i", "u")
      .withColumn("cell",
        call_function("graft_argmin_cell", col("u"), typedLit(cents.flatten), lit(2)))
      .select("i", "cell").orderBy("i").collect()
    assert(withNull(0).getInt(1) == 0 && withNull(1).isNullAt(1),
      "null vector yields null cell, non-null assigns")
    val bad = intercept[Exception] {
      Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("u")
        .withColumn("cell",
          call_function("graft_argmin_cell", col("u"), typedLit(cents.flatten), lit(2)))
        .collect()
    }
    assert(bad.getMessage != null)
  }
}
