package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the data-versioning audit a 100 TB lake runs
  * after every ingest: which documents appeared, vanished, or changed
  * between snapshot v1 and snapshot v2. Production table formats get
  * this from a transaction log; a parquet lake (this repo's stand-in,
  * like `Artifacts`' structural fingerprints) derives it by keyed
  * comparison — and the diff is what incremental consumers
  * (`q_dedup_delta`, `q_cluster_delta`) would feed on as their "today's
  * batch" instead of the doc_id%10 stand-in.
  *
  * The testdata ships one snapshot, so the two versions are planted
  * slices of it (the `q_pii_redact` convention — identical arithmetic
  * in the oracle):
  *   v1 = docs with doc_id % 23 != 3          (the rest arrive later)
  *   v2 = docs with doc_id % 29 != 5          (those got deleted),
  *        with text || ' rev2' when doc_id % 17 = 2   (those changed)
  * The diff must recover exactly added / removed / changed; unchanged
  * docs are NOT emitted — a diff table must be delta-sized, never
  * corpus-sized, or publishing it costs a corpus rewrite per ingest.
  *
  * Scale shape: each side projects to (doc_id, sha2(text), source)
  * BEFORE the full-outer join, so the doc_id-keyed exchange carries
  * ~72-byte rows, never document text; the status decode is scan-local
  * on the joined frame. At 1000 executors this is one sort-merge join
  * on the natural snapshot key — bucketing both snapshots by doc_id
  * (operators.Bucketing) would eliminate even that exchange.
  */
object SnapshotDiff {

  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val v1 = docs
      .filter(pmod(col("doc_id"), lit(23)) =!= 3)
      .select(col("doc_id"), sha2(col("text"), 256).as("h1"),
        col("source").as("src1"))
    val v2 = docs
      .filter(pmod(col("doc_id"), lit(29)) =!= 5)
      .withColumn("text2",
        when(pmod(col("doc_id"), lit(17)) === 2, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .select(col("doc_id"), sha2(col("text2"), 256).as("h2"),
        col("source").as("src2"))
    v1
      .join(v2, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") =!= col("h2"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"), coalesce(col("src2"), col("src1")).as("source"))
      .orderBy("doc_id")
  }
}
