package graft

import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("brute kNN returns exactly top-5 per query with valid ranks and cosine range") {
    val knn = SparkEntry.queries("q_knn_cosine")(spark, sfDir)
    val counts = knn.groupBy("q_id").count().collect()
    assert(counts.length == graft.similarity.Knn.NumQueries)
    counts.foreach(r => assert(r.getLong(1) == 5))
    assert(knn.filter(col("cos") < -1.0001 || col("cos") > 1.0001).count() == 0)
    assert(knn.filter(col("nbr_id") === col("q_id")).count() == 0, "self-match excluded")
  }

  test("LSH ANN recall vs brute force clears the theory floor for this corpus") {
    val brute = SparkEntry.queries("q_knn_cosine")(spark, sfDir)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SparkEntry.queries("q_ann_lsh")(spark, sfDir)
      .select("q_id", "nbr_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ann.intersect(brute).size.toDouble / brute.size
    // Neighbors on this synthetic corpus sit at cosine 0.26-0.49 where
    // 4x4-bit hyperplane banding predicts ~0.45 recall; 0.2 is the
    // regression floor, not the target (clustered corpora reach 0.95+).
    assert(recall >= 0.2, s"ANN recall collapsed: $recall")
  }

  test("ANN produces ranked top-k per query from bucketed candidates only") {
    val ann = SparkEntry.queries("q_ann_lsh")(spark, sfDir)
    assert(ann.groupBy("q_id").count().filter(col("count") > 5).count() == 0)
    assert(ann.filter(col("rn") < 1 || col("rn") > 5).count() == 0)
  }
}
