package graft.similarity

import graft.Num
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/** IVF-Flat approximate nearest neighbors: the learned-centroid scale
  * path complementing LshAnn's data-independent hyperplanes (the two
  * published families for corpus-scale vector search).
  *
  * Index build: k-means coarse quantizer trained on a deterministic
  * hashed sample (capped — training cost does not grow with the
  * corpus), then ONE assignment pass mapping every vector to its
  * nearest centroid cell. Query: rank the k centroids per query (k is
  * tiny — a literal-array dot against each), probe the nprobe nearest
  * cells, exact cosine ONLY within probed cells. Per-query scan
  * fraction is ~nprobe/k of the corpus, an equi-join on cell id — no
  * all-pairs term, AQE splits any hot cell.
  *
  * In production the index (centroids + assignments) is built offline
  * and reused across query batches; the declared query rebuilds it
  * inline to stay self-contained. NumCells is the corpus dial: cells
  * should hold ~sqrt(n)-ish rows (raise to 4096+ for 10^9 vectors),
  * nprobe trades recall for scan fraction.
  */
object IvfAnn {

  val NumCells = 64
  val NumProbes = 8
  /** Training-sample cap: k-means cost stays constant as the corpus
    * grows; the sample is hash-ordered (deterministic, id-uncorrelated).
    */
  val TrainCap = 4096

  /** Euclidean ranking on UNIT vectors equals cosine ranking:
    * dist²(u, c) = 1 - 2·u·c + ‖c‖², so cells rank by ‖c‖² - 2·u·c.
    */
  private def cellScore(centroid: Array[Double], uCol: String): Column = {
    val cSql = centroid.mkString("array(", "D, ", "D)")
    val norm2 = centroid.map(x => x * x).sum
    lit(norm2) - lit(2d) * expr(s"graft_dot($uCol, $cSql)")
  }

  /** The ONE index build both the query path and the balance spec use:
    * normalized+staged vectors and the fitted coarse quantizer.
    */
  private def index(spark: SparkSession, dir: String): (DataFrame, org.apache.spark.ml.clustering.KMeansModel) = {
    // Unit vectors for the quantizer; originals kept for exact scoring.
    val v = Knn.vectors(spark, dir)
      .withColumn("u", expr("transform(e, x -> x / norm)"))
      .withColumn("fv", array_to_vector(col("u")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val train = v.orderBy(xxhash64(col("vec_id"))).limit(TrainCap).coalesce(1)
    val model = new KMeans()
      .setK(NumCells).setSeed(42).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(train)
    (v, model)
  }

  /** Top-k approximate neighbors for the same query set as
    * Knn.bruteTopK (recall directly measurable).
    */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val (v, model) = index(spark, dir)
    val assigned = model
      .transform(v)
      .select(col("vec_id"), col("e"), col("norm"), col("cell"))
    val centroids = model.clusterCenters.map(_.toArray)
    // Query side: rank all k centroids (array_sort over k structs —
    // k is a constant, this is per-QUERY work only), probe top nprobe.
    val scoreStructs = centroids.zipWithIndex.map { case (c, j) =>
      struct(cellScore(c, "u").as("score"), lit(j).as("cell"))
    }
    val probes = v
      .filter(col("vec_id") < Knn.NumQueries)
      .select(
        col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qn"),
        explode(slice(array_sort(array(scoreStructs: _*)), 1, NumProbes)).as("pr"))
      .select(col("q_id"), col("qe"), col("qn"), col("pr.cell").as("cell"))
    val scored = probes
      .join(assigned.toDF("nbr_id", "ce", "cn", "cell2"),
        col("cell2") === col("cell") && col("nbr_id") =!= col("q_id"))
      .withColumn("cos", expr("graft_dot(qe, ce)") / (col("qn") * col("cn")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id").asc)
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= Knn.TopK)
      .select(col("q_id"), col("nbr_id"), Num.round4(col("cos")).as("cos"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** Corpus cell assignment alone, exposed for the cell-balance spec —
    * same build as ivfTopK by construction.
    */
  private[graft] def assignments(spark: SparkSession, dir: String): DataFrame = {
    val (v, model) = index(spark, dir)
    model.transform(v).select(col("vec_id"), col("cell"))
  }
}
