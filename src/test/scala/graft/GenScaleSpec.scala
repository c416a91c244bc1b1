package graft

import org.apache.spark.sql.functions._

/** Pins the adversarial-corpus generator's plant contract (r15): the
  * hot-key shapes exist at the advertised densities, so a ScaleBench
  * run over the corpus actually ENGAGES the caps it claims to test.
  */
class GenScaleSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("genscale_adv").toString
    tools.GenScale.generate(spark, d, 2000, 100, adversarial = true)
    d
  }

  test("boilerplate 8-gram lands in ~30% of docs — far past SubstrOccCap at scale") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val phrase = tools.GenScale.Boilerplate.mkString(" ")
    val n = docs.count()
    val withBoiler = docs.filter(col("text").contains(phrase)).count()
    // 30% plant rate minus the viral slots; copies can add a few more.
    assert(withBoiler > n * 0.2 && withBoiler < n * 0.45,
      s"boilerplate in $withBoiler of $n docs")
    // The cap contract is exercised when occurrences exceed the cap:
    // at 50k docs, 0.3·50k = 15k occurrences of one window vs cap 1000.
    // At this spec's 2k docs the rate is what's pinned; scale does the rest.
  }

  test("viral template forms one near-dup cluster of nDocs/ViralEvery docs") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val viralIds = docs
      .filter(col("doc_id") % tools.GenScale.ViralEvery === 0)
      .select("doc_id", "text").collect()
    assert(viralIds.length == 2)
    // 1-token perturbations of a 40-token template: pairwise Jaccard
    // over 3-gram shingles stays >= 0.8 (>= 34 of 38 shingles shared).
    val sets = viralIds.map(_.getString(1).split(" ").sliding(3).map(_.mkString(" ")).toSet)
    val j = sets(0).intersect(sets(1)).size.toDouble / sets(0).union(sets(1)).size
    assert(j >= 0.7, s"viral pair jaccard $j")
  }

  test("q_index_stats surfaces the planted viral LSH bucket") {
    // 5000 docs -> 5 viral template copies (ids 0, 1000, ...). Near-dup
    // signatures collide per band with probability ~jac^4, so under the
    // seeded generator several bands hold a >=3-doc bucket — visible in
    // the health report as max_bucket, while the background (random
    // docs + isolated planted pairs) stays at 1-2. This is the report's
    // whole job: the viral bucket shows up in one bounded aggregate
    // BEFORE the candidate join pays for it.
    val d = java.nio.file.Files.createTempDirectory("genscale_adv_stats").toString
    tools.GenScale.generate(spark, d, 5000, 250, adversarial = true)
    val stats = dedup.DedupQa.indexStats(spark, d).collect()
    assert(stats.length == dedup.Dedup.NumBands)
    val maxBucket = stats.map(_.getLong(3)).max
    assert(maxBucket >= 3, s"viral bucket invisible: max_bucket $maxBucket")
    // Every band indexes the same doc population.
    assert(stats.map(_.getLong(1)).distinct.length == 1)
    // cand_pairs is where the viral bucket's quadratic cost appears:
    // the hottest band implies >= C(3,2) pairs from that bucket alone.
    assert(stats.map(_.getLong(4)).max >= 3L)
  }

  test("non-adversarial generation is untouched by the new plants") {
    val d = java.nio.file.Files.createTempDirectory("genscale_clean").toString
    tools.GenScale.generate(spark, d, 1000, 50)
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val phrase = tools.GenScale.Boilerplate.mkString(" ")
    // The 8 boilerplate tokens in exact order can occur by chance only
    // at ~(1/31)^7 per window — effectively never in 1000 docs.
    assert(docs.filter(col("text").contains(phrase)).count() == 0)
    assert(docs.count() == 1000)
  }
}
