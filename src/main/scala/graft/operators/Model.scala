package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  */
object Model {
  private val FeatureCols = Array("click", "error", "signup", "view")

  /** The fitted model's per-feature coefficients + intercept (driver
    * side, dim+1 doubles) — exposed for the determinism spec.
    */
  private[graft] def fitCoefficients(spark: SparkSession, dir: String): Array[Double] = {
    val (model, _) = fit(spark, dir)
    model.coefficients.toArray :+ model.intercept
  }

  private def fit(spark: SparkSession, dir: String) = {
    val feats = Relational.pivotOnehot(spark, dir)
      .withColumn("label", (col("purchase") > 0).cast("double"))
    val assembled = new VectorAssembler()
      .setInputCols(FeatureCols)
      .setOutputCol("features")
      .transform(feats)
    val lr = new LogisticRegression()
      .setMaxIter(25)
      .setRegParam(0.01)
      .setTol(1e-8)
      .setStandardization(true)
    (lr.fit(assembled), assembled)
  }

  /** q_model_lr: per-user conversion prediction — label, predicted
    * class, and round4'd P(converted).
    */
  def trainPredict(spark: SparkSession, dir: String): DataFrame = {
    val (model, assembled) = fit(spark, dir)
    model
      .transform(assembled)
      .select(
        col("user_id"),
        col("label").cast("long").as("actual"),
        col("prediction").cast("long").as("predicted"),
        graft.Num.round4(element_at(vector_to_array(col("probability")), 2)).as("p_converted"))
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
    * SQL-derivable); the spec recomputes every cell driver-side.
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
