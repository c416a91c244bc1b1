package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed train/predict stand-in for the reference's modeling tail
  * (match_modeling.py:197 / proto_data_analysis.py:697: a Keras
  * fit/predict over the flattened per-match frames). The engine builds
  * every input frame the reference feeds its model (one-hot counts,
  * normalized stats, splits, bins, correlations); this closes the last
  * stage with a Spark ML logistic regression over the same features —
  * the cluster-native analog of the reference's single-node fit.
  *
  * Task shape mirrors the reference's "predict outcome from engagement
  * profile": label = user converted (>=1 purchase event), features =
  * the OTHER event-type counts from `q_pivot_onehot`'s frame (the
  * purchase column is excluded from features — it IS the label).
  *
  * Scale: LBFGS-LR trains by one treeAggregate gradient pass per
  * iteration over the feature frame — no driver-resident data beyond
  * the (dim+1) coefficient vector; scoring is a scan-local vector dot.
  * The feature frame itself is the pivot's user-grain aggregate, so
  * model input is user-cardinality, not event-cardinality. Determinism:
  * fixed maxIter/regParam/tol, standardization on; the spec pins
  * coefficient equality across two fits and separability on a planted
  * corpus. No SQL oracle (iterative optimization is not expressible in
  * DuckDB SQL) — rows-only at the driver gate, ScalaTest-verified.
  *
  * PUBLISHED MODEL (r13): the fitted coefficients are an Artifacts
  * table — (feature, weight) rows plus an `__intercept` row, tiny and
  * version-fingerprinted exactly like the BPE merge table. With an
  * artifacts root configured, the pipeline fits ONCE and every
  * consumer (`trainPredict` scoring, `evalTable`) reads the committed
  * coefficients; inline mode refits per query so the correctness gate
  * stays self-contained. Scoring is ONE expression path either way —
  * sigmoid(w·x + b) with the dot accumulated in declared feature
  * order, matching the sequential fold of the fit's own BLAS dot — so
  * published and inline modes produce identical predictions (the
  * provenance spec pins it).
  */
object Model {
  private val FeatureCols = Array("click", "error", "signup", "view")

  /** Marker row name for the intercept in the coefficient artifact. */
  private val InterceptRow = "__intercept"

  /** Version tag folded into the artifact fingerprint: bump whenever
    * the feature set or hyperparameters change meaning.
    */
  val ArtifactVersion = "lr-onehot-maxiter25-reg0.01-v1"

  /** The fitted model's per-feature coefficients + intercept (driver
    * side, dim+1 doubles) — exposed for the determinism spec. Always
    * fits; the artifact-aware accessor is `publishedCoefficients`.
    */
  private[graft] def fitCoefficients(spark: SparkSession, dir: String): Array[Double] = {
    val model = fit(spark, dir)
    model.coefficients.toArray :+ model.intercept
  }

  private def featureFrame(spark: SparkSession, dir: String): DataFrame =
    Relational.pivotOnehot(spark, dir)
      .withColumn("label", (col("purchase") > 0).cast("double"))

  private def fit(spark: SparkSession, dir: String) = {
    val assembled = new VectorAssembler()
      .setInputCols(FeatureCols)
      .setOutputCol("features")
      .transform(featureFrame(spark, dir))
    new LogisticRegression()
      .setMaxIter(25)
      .setRegParam(0.01)
      .setTol(1e-8)
      .setStandardization(true)
      .fit(assembled)
  }

  /** The model artifact frame: one row per feature plus the intercept. */
  private def coefFrame(spark: SparkSession, dir: String): DataFrame = {
    val coefs = fitCoefficients(spark, dir)
    spark.createDataFrame(
      FeatureCols.toSeq.zip(coefs.init) :+ (InterceptRow, coefs.last))
      .toDF("feature", "weight")
  }

  /** Artifact-aware coefficient accessor: the PUBLISHED model when an
    * artifacts root is configured (first consumer fits and publishes;
    * every later consumer reads the committed table), an inline fit
    * otherwise. The collect is bounded by contract: the artifact has
    * exactly FeatureCols.length + 1 rows.
    */
  private[graft] def publishedCoefficients(spark: SparkSession, dir: String): Array[Double] = {
    val frame = graft.sources.Artifacts.publishedOrCompute(
      spark, "model_lr", ArtifactVersion, Seq(s"$dir/events.parquet"))(
      coefFrame(spark, dir))
    val m = frame.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    require(m.size == FeatureCols.length + 1 && m.contains(InterceptRow),
      s"model_lr artifact malformed: ${m.keySet}")
    FeatureCols.map(m) :+ m(InterceptRow)
  }

  /** sigmoid(w·x + b) over the declared feature columns, accumulated in
    * feature order (FP-identical to the fit's sequential BLAS dot).
    */
  private def pOf(coefs: Array[Double]): Column = {
    val margin = FeatureCols.toSeq.zipWithIndex
      .map { case (c, i) => col(c).cast("double") * lit(coefs(i)) }
      .reduce(_ + _) + lit(coefs.last)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** q_model_lr: per-user conversion prediction — label, predicted
    * class, and round4'd P(converted). Scoring is scan-local: the
    * coefficient vector rides the plan as literals; no per-row model
    * object, no UDF.
    */
  def trainPredict(spark: SparkSession, dir: String): DataFrame = {
    val coefs = publishedCoefficients(spark, dir)
    featureFrame(spark, dir)
      .withColumn("p", pOf(coefs))
      .select(
        col("user_id"),
        col("label").cast("long").as("actual"),
        // margin > 0 <=> p > 0.5: the default binary-LR decision rule
        (col("p") > 0.5).cast("long").as("predicted"),
        graft.Num.round4(col("p")).as("p_converted"))
      .orderBy("user_id")
  }

  /** q_model_eval: the evaluation table a training run publishes next
    * to its model — per probability decile: volume, confusion counts,
    * and calibration (predicted-vs-observed positive rate). The
    * reference evaluates in-notebook after fit/predict
    * (proto_data_analysis.py:697 onward); a pipeline publishes this as
    * a table. One aggregate over the user-grain prediction frame (the
    * decile is a scan-local floor, never an ntile window); output is
    * ≤10 rows. Rows-only like q_model_lr (the predictions aren't
    * SQL-derivable); the spec recomputes every cell driver-side. With
    * an artifacts root configured this consumes the SAME published fit
    * as q_model_lr — one LBFGS run per pipeline, not per consumer.
    */
  def evalTable(spark: SparkSession, dir: String): DataFrame =
    trainPredict(spark, dir)
      .withColumn("decile", least(floor(col("p_converted") * 10).cast("long"), lit(9L)))
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("actual") === 1L && col("predicted") === 1L, 1L).otherwise(0L)).as("tp"),
        sum(when(col("actual") === 0L && col("predicted") === 1L, 1L).otherwise(0L)).as("fp"),
        sum(when(col("actual") === 1L && col("predicted") === 0L, 1L).otherwise(0L)).as("fn"),
        sum(when(col("actual") === 0L && col("predicted") === 0L, 1L).otherwise(0L)).as("tn"),
        graft.Num.round4(avg(col("p_converted"))).as("mean_p"),
        graft.Num.round4(avg(col("actual").cast("double"))).as("obs_rate"))
      .orderBy("decile")
}
