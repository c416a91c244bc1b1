package graft.similarity

/** Deterministic driver-side Lloyd k-means over a BOUNDED sample — the
  * quantizer trainer behind the IVF family (coarse cells) and the PQ
  * codebooks, replacing the r3..r15 Spark-ML fit (`ml.clustering
  * .KMeans`).
  *
  * Why own the fit instead of calling the library: the library's
  * k-means|| init draws from Spark's distributed RNG, which makes every
  * downstream query irreproducible outside this exact Spark version —
  * the reason the whole k-means family (`q_ann_ivf`, `q_knn_graph`,
  * `q_semdedup`, `q_diversity_sample`, `q_ann_ivfpq`) sat rows-only at
  * the oracle gate through r14, and a real deployment hazard: a Spark
  * upgrade silently re-shapes every published vector index. This fit is
  * a pure function of the (hash-ordered) sample: hash-prefix init,
  * fixed Lloyd iterations, and every float accumulation in a DEFINED
  * order (ascending index, left-to-right — the `graft_dot` /
  * DuckDB-`list_dot_product` order the LSH replays already proved
  * bit-portable), so the ENTIRE index replays cross-engine and the
  * family graduates to full DuckDB oracles (`KMeansOracle`).
  *
  * Arithmetic contract (replayed literally by `KMeansOracle` — any
  * change here must change the SQL generator in lockstep):
  * - dot(a, b): ascending-index sum of products (graft_dot order).
  * - full distance d2(a, b) = (dot(a,a) − 2·dot(a,b)) + dot(b,b) —
  *   exactly this op order; used where distances compare ACROSS points
  *   (the balanced-quantizer farthest-pair split seeding in `IvfAnn`).
  * - assignment score s(u, c) = dot(c,c) − 2·dot(u,c) — the per-point
  *   constant dot(u,u) dropped; used where candidates compare across
  *   CENTROIDS for one point (Lloyd assignment, corpus assignment,
  *   probe ranking — the probeCells identity).
  * - argmin/argmax ties resolve to the LOWEST index (strict comparison,
  *   ascending scan).
  * - centroid update: member sums accumulate in ascending sample index,
  *   then one division by the count; an emptied cell keeps its previous
  *   centroid.
  * - init: the FIRST k sample points — the sample is xxhash64-ordered,
  *   i.e. a uniform random permutation, so this IS the classic seeded
  *   random init (density-proportional seeding) with zero RNG. The
  *   first implementation used farthest-point init instead and the
  *   500k-doc decade point caught it as a SCALE defect: k-center
  *   seeding picks outliers, the bulk clusters under-split, and the
  *   IVF candidate volume inflated ~1.8× (319 s vs 177 s at 500k docs,
  *   fine at 50k — skew compounds with scale exactly like the r15
  *   sample-starvation finding).
  * - iteration count is FIXED (no convergence early-exit): a converged
  *   iteration recomputes identical assignments and identical means, so
  *   the fixed count is replay-friendly at zero behavioral cost.
  *
  * Scale contract: the sample is bounded (≤ 32·MaxCells = 2^17 rows by
  * `trainCapFor`), so driver-side training is legal at any corpus size.
  * The assignment step (the n·k·d term) is parallelized over a
  * deterministic index partition — each point's argmin is independent —
  * while the order-sensitive centroid accumulation stays a single
  * ascending pass (O(n·d), negligible).
  */
object KMeansFit {

  /** Ascending-index dot — the graft_dot / list_dot_product order. */
  def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var j = 0
    while (j < a.length) { s += a(j) * b(j); j += 1 }
    s
  }

  /** Full squared distance via dots in fixed op order:
    * (dot(a,a) − 2·dot(a,b)) + dot(b,b).
    */
  def d2(a: Array[Double], b: Array[Double]): Double =
    (dot(a, a) - 2.0 * dot(a, b)) + dot(b, b)

  /** Lowest-index argmin of score s(u, c) = cnorm2(c) − 2·dot(u, c)
    * over the centroid array (cnorm2 precomputed by the caller in
    * centroid order — same bits as recomputing per use).
    */
  def argminCell(u: Array[Double], cents: Array[Array[Double]], cnorm2: Array[Double]): Int = {
    var best = 0
    var bestS = cnorm2(0) - 2.0 * dot(u, cents(0))
    var c = 1
    while (c < cents.length) {
      val s = cnorm2(c) - 2.0 * dot(u, cents(c))
      if (s < bestS) { best = c; bestS = s }
      c += 1
    }
    best
  }

  private def cnorms(cents: Array[Array[Double]]): Array[Double] =
    cents.map(c => dot(c, c))

  /** Parallel deterministic assignment: asg(i) = argminCell(pts(i)) —
    * independent per point, so thread scheduling cannot change results.
    */
  def assignAll(pts: IndexedSeq[Array[Double]], cents: Array[Array[Double]]): Array[Int] = {
    val cn = cnorms(cents)
    val asg = new Array[Int](pts.length)
    java.util.stream.IntStream.range(0, pts.length).parallel()
      .forEach(i => asg(i) = argminCell(pts(i), cents, cn))
    asg
  }

  /** Hash-order-prefix (random) init + `iters` fixed Lloyd rounds.
    * Returns the k centroids in stable id order (init order; Lloyd
    * preserves ids). Requires 1 ≤ k ≤ pts.length and a nonempty sample.
    */
  def fit(pts: IndexedSeq[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(pts.nonEmpty && k >= 1 && k <= pts.length,
      s"k-means fit needs 1 <= k <= n, got k=$k n=${pts.length}")
    val n = pts.length
    val d = pts.head.length

    // Random init = the first k points of the hash-ordered sample (a
    // uniform permutation — see the arithmetic contract above).
    val cents: Array[Array[Double]] = Array.tabulate(k)(pts(_))

    // Fixed Lloyd rounds: parallel assignment, ordered accumulation.
    var it = 0
    var current = cents
    while (it < iters) {
      val asg = assignAll(pts, current)
      val sums = Array.ofDim[Double](k, d)
      val counts = new Array[Int](k)
      var i = 0
      while (i < n) {
        val c = asg(i); val u = pts(i); val s = sums(c)
        var j = 0
        while (j < d) { s(j) += u(j); j += 1 }
        counts(c) += 1
        i += 1
      }
      val next = new Array[Array[Double]](k)
      var c = 0
      while (c < k) {
        if (counts(c) == 0) next(c) = current(c)
        else {
          val m = new Array[Double](d); val s = sums(c); val cnt = counts(c)
          var j = 0
          while (j < d) { m(j) = s(j) / cnt; j += 1 }
          next(c) = m
        }
        c += 1
      }
      current = next
      it += 1
    }
    current
  }
}
