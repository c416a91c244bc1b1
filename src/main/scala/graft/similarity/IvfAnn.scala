package graft.similarity

import graft.Num
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF-Flat approximate nearest neighbors: the learned-centroid scale
  * path complementing LshAnn's data-independent hyperplanes (the two
  * published families for corpus-scale vector search).
  *
  * Index build: cell count is DERIVED from a cheap corpus count —
  * cells ≈ clamp(√n, MinCells, MaxCells), the balance point where cell size and
  * cell count grow together (~√n rows each), so neither the per-query
  * cell ranking (k dots) nor the probed-cell scan (nprobe·n/k rows)
  * degenerates as the corpus grows. A fixed constant would silently
  * stop pruning: 64 cells at 10⁹ vectors is ~10⁷ rows per probed cell.
  * The k-means coarse quantizer trains on a deterministic hashed sample
  * capped at 32·cells rows (see trainCapFor — a starved sample skews
  * the fitted cells and the skew is a measured superlinear term in
  * candidate volume; training cost still grows with √n, not n), then
  * ONE assignment pass maps every vector to its nearest centroid cell. Query: rank the k centroids per query,
  * probe the nprobe = clamp(cells/8, 8, MaxProbes) nearest cells
  * (proportional while the index is small, CONSTANT at scale — an
  * unbounded cells/8 fraction makes candidate volume n²/8; see
  * numProbesFor), exact cosine ONLY within probed cells via an
  * equi-join on cell id — no all-pairs term, AQE splits any hot cell.
  *
  * In production the index (centroids + assignments) is built offline
  * and reused across query batches; the declared query rebuilds it
  * inline to stay self-contained.
  */
object IvfAnn {

  val MinCells = 64

  /** Upper clamp on the cell count, set by QUANTIZER-TRAINING
    * feasibility, not plan size (centroid ranking is a broadcast join —
    * O(1) plan nodes in k): the k-means fit runs on a deterministic
    * coalesce(1) sample of 32·cells rows, costing ~samples·k·iters
    * distance ops on one core — at 4096 cells that is ~1e10, tens of
    * seconds of offline index build; at 65536 it would be ~2.7e13,
    * untrainable. 4096 cells is reached at
    * n ≈ 1.7e7 vectors; beyond that the probed fraction grows with n/k,
    * and the escape hatch is a HIERARCHICAL quantizer (a second IVF
    * level inside each coarse cell — k₁·k₂ effective cells with two
    * feasible fits), not a bigger flat k.
    */
  val MaxCells = 4096

  /** cells ≈ √n, clamped; never more cells than vectors (k-means needs
    * k ≤ points).
    */
  private[graft] def numCellsFor(n: Long): Int = {
    val root = math.ceil(math.sqrt(math.max(n, 1L).toDouble)).toInt
    math.min(math.max(root, MinCells), MaxCells).min(math.max(n, 1L).min(Int.MaxValue).toInt)
  }

  /** Upper clamp on nprobe (r15). The old policy — nprobe = cells/8,
    * unbounded — tied recall to a fixed scan FRACTION, which silently
    * destroyed the family's asymptotics: candidate volume became
    * n · (cells/8) · (n/cells) = n²/8, quadratic REGARDLESS of the cell
    * count, and the second measured scaling decade caught exactly that
    * (q_knn_graph 50k→500k exponent 2.03, 547 s, 9.8 GB peak task
    * memory — vs the n^1.5 the scaladoc promised). A bounded nprobe is
    * what the standard IVF recall model prescribes: neighbors
    * concentrate in the query's few nearest cells (the data's cluster
    * count, not the index's cell count, governs how many), so nprobe is
    * a CONSTANT recall knob at scale. Kept proportional below the clamp
    * so small indexes (few cells, coarse quantization boundaries) still
    * probe a meaningful fraction; fixture-scale plans (cells ≤ 128,
    * nprobe = 8..16) are unchanged.
    */
  val MaxProbes = 16

  /** nprobe = clamp(cells/8, 8, MaxProbes): probed-candidate volume is
    * then Θ(n·nprobe·n/cells) = Θ(n^1.5 · nprobe) at cells ≈ √n — the
    * documented contract (measured across the 50k→500k decade: wall
    * exponent 2.00 → 1.77, candidate-volume exponent 1.69 with the
    * clamp + the 32-sample training fix; residual above 1.5 is cell
    * skew on clustered data — see SURVEY §6).
    */
  private[graft] def numProbesFor(cells: Int): Int =
    math.min(math.max(8, cells / 8), MaxProbes)

  /** Training-sample cap: 32 samples per centroid (hash-ordered —
    * deterministic, id-uncorrelated). 8/centroid through r14 — and that
    * starvation was a measured scale defect, not a tuning nit: with ~9
    * noisy samples per centroid the fitted cells skew (max cell 9.3×
    * the mean at the 500k-doc decade point), probes concentrate on the
    * big cells (candidates = Σ probes_c·s_c ≈ Σ s_c²), and the
    * candidate-volume exponent measured 1.84 instead of the designed
    * 1.5. At 32/centroid + 20 Lloyd iterations the same corpus fits
    * max cell 3.3× mean, candidate volume −27%, and the per-task sort
    * ceiling (hottest cell's candidate mass) −3×. The coalesce(1) this
    * sample feeds stays bounded by construction: ≤ 32·cells = 2^17 rows
    * at MaxCells.
    */
  private[graft] def trainCapFor(cells: Int): Int = math.max(4096, 32 * cells)

  /** Normalized + staged vector frame (vec_id, e, norm, u, fv) — the
    * ONE embeddings materialization every family member builds on.
    */
  private[graft] def stagedUnit(vectors: DataFrame): DataFrame =
    graft.Staging.staged(
      vectors
        .withColumn("u", expr("transform(e, x -> x / norm)"))
        .withColumn("fv", array_to_vector(col("u"))),
      "ivf")

  private[graft] def fitCoarse(v: DataFrame): KMeansModel = {
    val cells = numCellsFor(v.count())
    val train = v.orderBy(xxhash64(col("vec_id"))).limit(trainCapFor(cells)).coalesce(1)
    new KMeans()
      .setK(cells).setSeed(42).setMaxIter(20)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(train)
  }

  /** The ONE index build the query path and the balance/derivation specs
    * all use: normalized+staged vectors and the fitted coarse quantizer
    * (k derived from the staged frame's count — the count is a cheap
    * aggregate over the already-materialized stage).
    */
  private[graft] def indexOf(vectors: DataFrame): (DataFrame, KMeansModel) = {
    val v = stagedUnit(vectors)
    (v, fitCoarse(v))
  }

  private def index(spark: SparkSession, dir: String): (DataFrame, KMeansModel) =
    indexOf(Knn.vectors(spark, dir))

  /** The coarse quantizer as DATA — (cell, centroid, cnorm2) rows plus
    * the cell count — the form a lake-resident index takes and the only
    * thing `probeCells` actually needs (a fitted model object is a
    * training-time artifact; probing is pure data).
    */
  private[graft] case class CoarseIndex(centroids: DataFrame, k: Int)

  private[graft] def coarseIndexOf(spark: SparkSession, model: KMeansModel): CoarseIndex = {
    import spark.implicits._
    val df = model.clusterCenters.zipWithIndex
      .map { case (c, j) => (j, c.toArray) }.toSeq
      .toDF("cell", "centroid")
      .withColumn("cnorm2", expr("graft_dot(centroid, centroid)"))
    CoarseIndex(df, model.getK)
  }

  /** Version tag for the published coarse index (bump on any change to
    * cell derivation, seeding, or training-sample contract).
    */
  val IndexArtifactVersion = "ivf-coarse-sqrtcells-seed42-v2"

  /** Coarse index + assigned corpus via the Artifacts contract — the
    * production shape: the quantizer is TRAINED ONCE, its centroids and
    * corpus assignments are published, and every consumer (kNN graph,
    * SemDeDup, diversity sampling, IVF-PQ's coarse stage) reads the
    * committed parquet instead of re-fitting k-means per query.
    * `q_ann_ivf` deliberately stays inline as the timed build authority
    * (the q_dedup_jaccard_prefix convention). Without a root everything
    * computes inline and stays self-contained.
    *
    * The k-means fit is LAZY: with both artifacts already published, no
    * training happens at all — consumers pay one slim (vec_id, cell)
    * join against the staged scan (at 100 TB: one shuffle of 12-byte
    * rows, vs re-training + re-assigning per consumer).
    *
    * Returns (assigned frame (vec_id, e, norm, u, cell), CoarseIndex).
    */
  private[graft] def coarseFor(spark: SparkSession, dir: String): (DataFrame, CoarseIndex) = {
    val v = stagedUnit(Knn.vectors(spark, dir))
    graft.sources.Artifacts.rootDir(spark) match {
      case Some(_) =>
        lazy val model = fitCoarse(v) // forced only on artifact miss
        val deps = Seq(s"$dir/embeddings.parquet")
        val centroids = graft.sources.Artifacts.publishedOrCompute(
          spark, "ivf_centroids", IndexArtifactVersion, deps)(
          coarseIndexOf(spark, model).centroids.select("cell", "centroid"))
        val assignments = graft.sources.Artifacts.publishedOrCompute(
          spark, "ivf_assignments", IndexArtifactVersion, deps)(
          model.transform(v).select(col("vec_id"), col("cell")))
        val idx = CoarseIndex(
          centroids.withColumn("cnorm2", expr("graft_dot(centroid, centroid)")),
          centroids.count().toInt)
        (v.join(assignments, "vec_id")
          .select(col("vec_id"), col("e"), col("norm"), col("u"), col("cell")), idx)
      case None =>
        val model = fitCoarse(v)
        (model.transform(v).select(col("vec_id"), col("e"), col("norm"), col("u"), col("cell")),
          coarseIndexOf(spark, model))
    }
  }

  /** Probed (query, cell) pairs for a query-side frame: rank every
    * coarse centroid per query, keep the nprobe nearest. Centroids enter
    * as DATA (a broadcast k-row frame), not as k literal expression
    * nodes — the plan stays O(1) in k, codegen never sees a 4096-way
    * expression tree, and plan serialization doesn't ship centroids per
    * task. Euclidean ranking on UNIT vectors equals cosine ranking:
    * dist²(u, c) = 1 - 2·u·c + ‖c‖², so cells rank by ‖c‖² - 2·u·c. The
    * query×centroid pairing is a broadcast nested-loop with bounded ×k
    * fanout (the one shape where that node is right: every query must
    * score every coarse cell), then a per-query window keeps the nprobe
    * best. Keeps `u` so PQ callers can derive their lookup tables from
    * the same frame; extra query-side columns pass through untouched.
    */
  private[graft] def probeCells(
      spark: SparkSession, queries: DataFrame, model: KMeansModel): DataFrame =
    probeCells(spark, queries, coarseIndexOf(spark, model))

  private[graft] def probeCells(
      spark: SparkSession, queries: DataFrame, index: CoarseIndex): DataFrame = {
    val nProbes = numProbesFor(index.k)
    val wCell = Window.partitionBy("q_id").orderBy(col("score").asc, col("cell").asc)
    queries
      .crossJoin(broadcast(index.centroids))
      .withColumn("score", col("cnorm2") - lit(2d) * expr("graft_dot(u, centroid)"))
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= nProbes)
      .drop("centroid", "cnorm2", "score", "crn")
  }

  /** Top-k approximate neighbors for the same query set as
    * Knn.bruteTopK (recall directly measurable).
    */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val (v, model) = index(spark, dir)
    val assigned = model
      .transform(v)
      .select(col("vec_id"), col("e"), col("norm"), col("cell"))
    val probes = probeCells(
      spark,
      v.filter(col("vec_id") < Knn.NumQueries)
        .select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qn"), col("u")),
      model)
      .select("q_id", "qe", "qn", "cell")
    val scored = probes
      .join(assigned.toDF("nbr_id", "ce", "cn", "cell2"),
        col("cell2") === col("cell") && col("nbr_id") =!= col("q_id"))
      .withColumn("cos", expr("graft_dot(qe, ce)") / (col("qn") * col("cn")))
    topKPerQuery(scored)
  }

  /** Per-query top-k over a (q_id, nbr_id, cos) candidate stream,
    * written so Catalyst's InferWindowGroupLimit fires: the filter
    * compares the raw row_number ATTRIBUTE against a literal (the long
    * cast happens AFTER the filter — r10..r14 cast first, which hid
    * the pattern from the rule and silently bought the naive window
    * plan: a full candidate-volume shuffle + sort, 8.8 GB peak task
    * memory at the 500k-doc decade point). With the rule matched, the
    * physical plan carries WindowGroupLimitExec in Partial mode BEFORE
    * the exchange — a per-key bounded top-k on the map side, so each
    * mapper ships at most k rows per q_id it saw — and Final mode
    * after, with the actual Window running over ≤k rows per key.
    * Native operator, whole plan codegen-eligible, no custom code on
    * the hot path (a custom TypedImperativeAggregate heap was
    * prototyped and dropped: ObjectHashAggregate's 128-key sort-based
    * fallback re-materializes the candidate sort for any
    * high-cardinality grouping — same memory shape as the naive
    * window, none of the native path's codegen/plan-visibility).
    */
  private[graft] def topKPerQuery(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("nbr_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Knn.TopK)
      .select(col("q_id"), col("nbr_id"), Num.round4(col("cos")).as("cos"),
        col("rn").cast("long").as("rn"))
      .orderBy("q_id", "rn")
  }

  /** #28e kNN graph: top-k cosine neighbors for EVERY corpus vector —
    * the batch all-vectors variant of `ivfTopK` (whose query side is a
    * small batch). The kNN graph is the input artifact of graph-based
    * curation: near-dup graph clustering, diversity-aware sampling, and
    * retrieval-augmentation neighbor lists all start from it; building
    * it by brute force is the n² wall, and the IVF route is the
    * standard scale path (probe each vector's nprobe nearest cells,
    * exact cosine only within probed cells — candidate volume
    * ~n·nprobe·(n/cells) ≈ n^1.5 at cells ≈ √n, the same within-cell
    * scoping SemDeDup (Abbas et al. 2023) exploits).
    *
    * Scale shape: ONE staged embeddings scan feeds quantizer training,
    * assignment, probe side, and corpus side; the probe fanout is
    * bounded (×nprobe per vector); the candidate join is cell-keyed
    * equi (AQE splits hot cells); per-query top-k rides the native
    * WindowGroupLimit (r15, see topKPerQuery — Partial mode bounds
    * what each mapper ships to ≤k rows per q_id). Self-pairs drop;
    * emitted cosines are exact (round4'd for output stability).
    */
  def knnGraph(spark: SparkSession, dir: String): DataFrame = {
    val (assignedRaw, idx) = coarseFor(spark, dir)
    val assigned = graft.Staging.staged(assignedRaw, "knn_graph_assigned")
    val probes = probeCells(
      spark,
      assigned.select(col("vec_id").as("q_id"), col("e").as("qe"), col("norm").as("qn"), col("u")),
      idx)
      .select("q_id", "qe", "qn", "cell")
    val scored = probes
      .join(
        assigned.select(
          col("vec_id").as("nbr_id"), col("e").as("ce"),
          col("norm").as("cn"), col("cell").as("cell2")),
        col("cell2") === col("cell") && col("nbr_id") =!= col("q_id"))
      .withColumn("cos", expr("graft_dot(qe, ce)") / (col("qn") * col("cn")))
    topKPerQuery(scored)
  }

  /** The full assigned corpus frame (vec_id, e, norm, cell), built from
    * the ONE staged embeddings scan the index build already pays — the
    * frame SemDedup's within-cell exact pass consumes directly. Handing
    * this out (instead of just (vec_id, cell)) is what keeps the
    * embeddings table at exactly one scan across quantizer training,
    * assignment, and downstream exact scoring: a consumer that re-reads
    * the table to recover e/norm doubles the corpus read at 100 TB.
    */
  private[graft] def assignedVectors(spark: SparkSession, dir: String): DataFrame =
    coarseFor(spark, dir)._1.select(col("vec_id"), col("e"), col("norm"), col("cell"))

  /** Corpus cell assignment alone, exposed for the cell-balance spec —
    * same build as ivfTopK by construction.
    */
  private[graft] def assignments(spark: SparkSession, dir: String): DataFrame =
    assignedVectors(spark, dir).select(col("vec_id"), col("cell"))

  /** Cell assignment over an arbitrary (vec_id, e, norm) frame — the
    * two-corpus-sizes derivation spec drives this directly.
    */
  private[graft] def assignmentsOf(vectors: DataFrame): (Int, DataFrame) = {
    val (v, model) = indexOf(vectors)
    (model.getK, model.transform(v).select(col("vec_id"), col("cell")))
  }
}
