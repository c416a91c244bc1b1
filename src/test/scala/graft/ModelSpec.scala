package graft

import org.apache.spark.sql.functions._
import graft.operators.Model

/** q_model_lr — the Spark ML train/predict stand-in for the reference's
  * Keras modeling tail (match_modeling.py:197). No SQL oracle
  * (iterative optimization); verified here instead: determinism,
  * coverage, schema, and learnability on the real frame.
  */
class ModelSpec extends SparkSpec {

  test("LR fit is deterministic: identical coefficients across two fits") {
    val c1 = Model.fitCoefficients(spark, sfDir)
    val c2 = Model.fitCoefficients(spark, sfDir)
    assert(c1.sameElements(c2),
      s"two fits over the same frame must agree exactly: ${c1.toSeq} vs ${c2.toSeq}")
  }

  test("prediction frame covers every user exactly once with valid fields") {
    val pred = Model.trainPredict(spark, sfDir)
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(pred.count() == users, "one prediction row per user")
    assert(pred.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    val bad = pred.filter(
      !col("actual").isin(0L, 1L) || !col("predicted").isin(0L, 1L) ||
        col("p_converted") < 0.0 || col("p_converted") > 1.0).count()
    assert(bad == 0, "labels/predictions binary, probability in [0,1]")
  }

  test("eval table is the exact decile rollup of the prediction frame") {
    val pred = Model.trainPredict(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val evalRows = Model.evalTable(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val expected = pred
      .groupBy { case (_, _, p) => math.min(math.floor(p * 10).toLong, 9L) }
      .map { case (d, rows) =>
        d -> (
          rows.size.toLong,
          rows.count { case (a, pr, _) => a == 1L && pr == 1L }.toLong,
          rows.count { case (a, pr, _) => a == 0L && pr == 1L }.toLong,
          rows.count { case (a, pr, _) => a == 1L && pr == 0L }.toLong,
          rows.count { case (a, pr, _) => a == 0L && pr == 0L }.toLong)
      }
    assert(evalRows == expected, s"decile cells drifted: $evalRows vs $expected")
    // confusion cells partition each decile's volume
    evalRows.foreach { case (d, (n, tp, fp, fn, tn)) =>
      assert(tp + fp + fn + tn == n, s"decile $d: confusion cells must sum to n")
    }
  }

  test("published model artifact: one fit serves every consumer, rows identical to inline") {
    val root = java.nio.file.Files.createTempDirectory("graft_model_art").toString
    val inlinePred = Model.trainPredict(spark, sfDir).collect().map(_.toSeq)
    val inlineEval = Model.evalTable(spark, sfDir).collect().map(_.toSeq)
    spark.conf.set("spark.graft.artifacts", root)
    try {
      val pubPred = Model.trainPredict(spark, sfDir).collect().map(_.toSeq)
      // the coefficient table is committed, tiny, and well-formed
      val artDirs = new java.io.File(s"$root/model_lr").listFiles()
      assert(artDirs != null && artDirs.exists(_.getName.startsWith("fp=")),
        "fit must publish a fingerprinted coefficient artifact")
      val coefRows = spark.read
        .parquet(artDirs.find(_.getName.startsWith("fp=")).get.toString)
        .collect()
      assert(coefRows.length == 5, "4 feature weights + intercept")
      // a second consumer (evalTable) reads the SAME committed fit; its
      // output must be the inline answer bit-for-bit
      val pubEval = Model.evalTable(spark, sfDir).collect().map(_.toSeq)
      assert(pubPred.toSeq == inlinePred.toSeq,
        "published-model predictions must equal inline-fit predictions")
      assert(pubEval.toSeq == inlineEval.toSeq,
        "published-model eval table must equal inline-fit eval table")
    } finally spark.conf.unset("spark.graft.artifacts")
  }

  test("model beats the majority-class baseline on its training frame") {
    // Not a generalization claim (train-set fit, like the reference's
    // in-notebook fit/predict) — a learnability floor: the fitted model
    // must beat predicting the majority class everywhere, proving the
    // optimizer actually moved from the intercept-only solution.
    val pred = Model.trainPredict(spark, sfDir).select("actual", "predicted")
    val n = pred.count().toDouble
    val acc = pred.filter(col("actual") === col("predicted")).count() / n
    val majority = math.max(
      pred.filter(col("actual") === 1L).count() / n,
      pred.filter(col("actual") === 0L).count() / n)
    assert(acc >= majority,
      s"fit accuracy $acc must be at least the majority-class rate $majority")
  }
}
