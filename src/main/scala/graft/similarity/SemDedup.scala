package graft.similarity

import graft.{Num, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
  * pairs found by clustering embeddings with a coarse quantizer and
  * comparing exactly WITHIN clusters only — the trick that turns the
  * quadratic all-pairs cosine into per-cluster work units. Reuses the
  * IVF k-means quantizer (cells ~ sqrt n, so expected within-cell pair
  * work is ~n^1.5 total, and each cell is a bounded join partition —
  * skewed cells are AQE skew-join territory, not an OOM).
  *
  * Recall is what the cluster assignment gives up: a pair split across
  * cells is never compared (the spec measures this against the exact
  * q_embed_neardup pairs; the paper accepts the same trade). Pairs
  * compose with dedup.Clusters.connectedComponents for survivor
  * selection, exactly like the text-side near-dup operators.
  */
object SemDedup {

  def semDedupPairs(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val assigned = IvfAnn.assignments(spark, dir)
    // Staged: the self-join would otherwise run the embeddings scan,
    // the double-cast/norm transform, and the assignment join TWICE —
    // the re-scan cost the dedup staging pattern exists to kill.
    val v = graft.Staging.staged(
      Tables
        .embeddings(spark, dir)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
        .withColumn("norm", sqrt(expr("graft_dot(e, e)")))
        .join(assigned, "vec_id")
        .select("vec_id", "e", "norm", "cell"),
      "semdedup_cells")
    v.toDF("a", "ea", "na", "cell")
      .join(v.toDF("b", "eb", "nb", "cell2"), col("cell") === col("cell2") && col("a") < col("b"))
      .withColumn("cos", expr("graft_dot(ea, eb)") / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), Num.round4(col("cos")).as("cos"))
      .orderBy("a", "b")
  }
}
