package graft.tools

import org.apache.spark.sql.functions._

/** Probe: count the jaccard-prefix collision/candidate volumes (the
  * prefix self-join's output rows, then the post-PPJoin candidate
  * pairs) at each given scale — the §6 evidence that candidate volume
  * stays linear across decades when the generator holds shingle-df
  * density constant (vocab ∝ n^(1/3)). Mirrors `jaccardPrefixOf`'s
  * exact join shape.
  */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(16)
    for (dir <- args) {
      val docs = graft.Tables.documents(spark, dir)
      val sh = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(graft.dedup.Dedup.ShingleArraySql)).as("sg"))
      val prefix = graft.Staging.staged(
        graft.dedup.Dedup.prefixIndex(sh, 0.8), "cand_probe_prefix")
      val collisions = prefix
        .select(col("doc_id").as("a"), col("sg"), col("pos").as("ia"), col("n").as("na"))
        .join(
          prefix.select(col("doc_id").as("b"), col("sg"), col("pos").as("ib"), col("n").as("nb")),
          Seq("sg"))
        .filter(col("a") < col("b"))
      val nColl = collisions.count()
      val nCand = graft.dedup.Dedup.ppjoinCandidates(collisions, 0.8).count()
      val nSh = sh.count()
      println(s"PROBE dir=$dir shingleRows=$nSh collisionRows=$nColl candidates=$nCand")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
