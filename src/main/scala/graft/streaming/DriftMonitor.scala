package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming corpus-drift monitor: the per-ingest twin of
  * `SnapshotDiff.corpusDrift`. Every micro-batch's token rates are
  * compared against a BASELINE rate table (computed once at boot via
  * the Artifacts contract — the published fingerprint of the corpus the
  * pipeline believes it is ingesting), and the top absolute movers are
  * appended to a drift log. This is the alarm wire a crawl pipeline
  * runs next to the ingest path: a boilerplate explosion, a language
  * flip, or a spam flood shows up as a rate spike WITHIN ONE EPOCH,
  * days before a nightly snapshot diff would surface it.
  *
  * Rates are the same exact per-billion integers as the batch drift
  * report; per-epoch output is (epoch, tok, rate_pb, base_pb,
  * drift_pb), top `TopMovers` by |drift| with token tie-break.
  *
  * Scale shape: the baseline is vocabulary-scale and broadcast into
  * each epoch's join; per-epoch work is one map-side-combined token
  * count over the batch plus a broadcast join — nothing touches corpus
  * state. Baseline tokens absent from the batch are NOT emitted (a
  * batch is a sample; absence of a rare token in one epoch is noise,
  * while a real disappearance shows as a sustained negative drift on
  * the tokens that replaced it).
  */
object DriftMonitor {

  val TopMovers = 10

  /** Heavy-hitter floor for the per-batch token table. */
  val BatchMinCount = 3L

  val ArtifactVersion = "token-baseline-rates-pb-v1"

  /** Baseline per-billion token rates over the corpus at `dir`,
    * published once via the Artifacts contract (inline without a root).
    */
  def baselineRates(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Artifacts.publishedOrCompute(
      spark, "token_baseline", ArtifactVersion, Seq(s"$dir/documents.parquet")) {
      val toks = graft.Tables.documents(spark, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
      val total = toks.count()
      toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .select(col("tok"), expr(s"(1000000000 * cnt) div $total").as("base_pb"))
    }

  /** One epoch's drift rows against a broadcastable baseline. */
  private[graft] def epochDrift(batch: DataFrame, baseline: DataFrame, epoch: Long): DataFrame = {
    val toks = batch.select(explode(split(col("text"), " ")).as("tok"))
    val totalRow = toks.agg(count(lit(1)).as("t")).head()
    val total = totalRow.getLong(0)
    if (total == 0) return batch.sparkSession.emptyDataFrame
    toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= BatchMinCount)
      .select(col("tok"), expr(s"(1000000000 * cnt) div $total").as("rate_pb"))
      .join(broadcast(baseline), Seq("tok"), "left")
      .select(
        lit(epoch).as("epoch"), col("tok"), col("rate_pb"),
        coalesce(col("base_pb"), lit(0L)).as("base_pb"))
      .withColumn("drift_pb", col("rate_pb") - col("base_pb"))
      .orderBy(abs(col("drift_pb")).desc, col("tok").asc)
      .limit(TopMovers)
  }

  /** Start the monitor over a parquet lake directory; appends each
    * epoch's top movers to `logDir`.
    */
  def start(
      spark: SparkSession,
      srcDir: String,
      baselineDir: String,
      logDir: String,
      checkpointDir: String,
      availableNow: Boolean = false): StreamingQuery = {
    val baseline = baselineRates(spark, baselineDir).persist()
    baseline.count()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val writer = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        val drift = epochDrift(b, baseline, epoch)
        if (!drift.isEmpty) drift.write.mode("append").parquet(logDir)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
