package graft.similarity

import graft.functions.LshSigExpr

/** DuckDB oracles for the random-hyperplane LSH queries (r14):
  * `q_embed_neardup_lsh` and `q_ann_lsh` graduate from rows-only to
  * full rows+schema+hash, the same way the MinHash/SimHash replays did
  * for the token family.
  *
  * What made this possible: the signature pipeline is deterministic
  * end-to-end — the 64×64 hyperplane table is a frozen seeded-PRNG
  * constant (inlined into the SQL as shortest-round-trip double
  * literals, which DuckDB's correctly-rounded parser restores to the
  * identical bits), and every floating-point step replays exactly:
  * - `graft_dot` accumulates ascending-index a[k]·b[k] sums, and
  *   DuckDB's `list_dot_product` uses the same left-to-right order, so
  *   the doubles come out BIT-IDENTICAL (validated: all 500 corpus
  *   signatures and norms equal the Spark plan's bit-for-bit — and the
  *   existing `q_knn_cosine` oracle has relied on the same identity
  *   since r3). If either engine ever reordered its accumulation
  *   (pairwise/SIMD summation), signatures would diverge and the
  *   compare would fail LOUDLY — the same contract as the XXH64
  *   replays' domain assumptions.
  * - signature bit i = dot > 0 (strict), packed via a recursive
  *   power-of-two table (exact HUGEINT bit work, no float pow);
  * - band keys are unsigned shift+mask off the packed signature
  *   (identical to Spark's arithmetic shiftright + mask, since the
  *   mask discards sign extension); multi-probe adds every 1-bit flip
  *   of each band key on the probe side only;
  * - cosine = dot / (norm_a · norm_b) with `sqrt` (correctly rounded
  *   in both engines) and the repo's exact ×10000 rounding at the end.
  */
object LshOracle {

  private def planeValues: String =
    LshSigExpr.planes.zipWithIndex.map { case (w, i) =>
      s"($i, [${w.map(d => s"$d::DOUBLE").mkString(", ")}])"
    }.mkString(",\n")

  /** Shared CTE prefix: plane table, double vectors, packed unsigned
    * signatures, norms, per-band keys, and 1-bit multi-probe keys.
    */
  private def common: String = {
    val numBands = LshAnn.NumBands
    val bandBits = LshAnn.BandBits
    val bandVals = (0 until numBands).map { j =>
      s"($j, (usig // ${BigInt(1) << (bandBits * j)}::HUGEINT) % ${BigInt(1) << bandBits}::HUGEINT)"
    }.mkString(", ")
    val flips = (0 until bandBits)
      .map(b => s"xor(key::UBIGINT, ${1 << b}::UBIGINT)::HUGEINT").mkString(", ")
    s"""planes(i, w) AS (VALUES
       |$planeValues
       |),
       |vec AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings
       |),
       |p2(b, v) AS (
       |  SELECT 0, 1::HUGEINT
       |  UNION ALL
       |  SELECT b + 1, v * 2 FROM p2 WHERE b < 63
       |),
       |usig AS (
       |  SELECT v.vec_id, sum(CASE WHEN list_dot_product(v.e, p.w) > 0 THEN x.v ELSE 0::HUGEINT END) AS usig
       |  FROM vec v JOIN planes p ON true JOIN p2 x ON x.b = p.i
       |  GROUP BY v.vec_id
       |),
       |norms AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS norm FROM vec),
       |bands AS (
       |  SELECT vec_id, bx.band, bx.key
       |  FROM usig, LATERAL (VALUES $bandVals) AS bx(band, key)
       |),
       |probes AS (
       |  SELECT vec_id, band, unnest([key, $flips]) AS key
       |  FROM bands
       |)""".stripMargin
  }

  /** `q_embed_neardup_lsh`: multi-probe on side a only, exact cosine
    * verify at the query's threshold.
    */
  lazy val neardupSql: String = {
    val threshold = 0.4
    s"""WITH RECURSIVE
       |$common,
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS a, x.vec_id AS b
       |  FROM probes p JOIN bands x ON p.band = x.band AND p.key = x.key AND p.vec_id < x.vec_id
       |),
       |pdots AS (
       |  SELECT c.a, c.b, list_dot_product(va.e, vb.e) AS dot
       |  FROM cand c JOIN vec va ON va.vec_id = c.a JOIN vec vb ON vb.vec_id = c.b
       |)
       |SELECT d.a AS a, d.b AS b,
       |  floor(d.dot / (na.norm * nb.norm) * 10000 + 0.5) / 10000 AS cos
       |FROM pdots d
       |JOIN norms na ON na.vec_id = d.a
       |JOIN norms nb ON nb.vec_id = d.b
       |WHERE d.dot / (na.norm * nb.norm) >= $threshold
       |ORDER BY a, b""".stripMargin
  }

  /** The ann candidate→score→rank CTE chain, shared by `annSql` (which
    * projects the ranked list) and `recallSql` (which joins it against
    * the exact list) so the two oracles can never drift apart.
    */
  private def annCtes: String = {
    val numQueries = Knn.NumQueries
    s"""cand AS (
       |  SELECT DISTINCT p.vec_id AS a, x.vec_id AS b
       |  FROM probes p JOIN bands x ON p.band = x.band AND p.key = x.key AND p.vec_id <> x.vec_id
       |  WHERE p.vec_id < $numQueries
       |),
       |pdots AS (
       |  SELECT c.a, c.b, list_dot_product(va.e, vb.e) AS dot
       |  FROM cand c JOIN vec va ON va.vec_id = c.a JOIN vec vb ON vb.vec_id = c.b
       |),
       |scored AS (
       |  SELECT d.a AS q_id, d.b AS nbr_id, d.dot / (na.norm * nb.norm) AS cos
       |  FROM pdots d
       |  JOIN norms na ON na.vec_id = d.a
       |  JOIN norms nb ON nb.vec_id = d.b
       |),
       |ranked AS (
       |  SELECT q_id, nbr_id, cos,
       |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, nbr_id ASC) AS rn
       |  FROM scored
       |)""".stripMargin
  }

  /** `q_ann_lsh`: multi-probe on the query side, every candidate scored
    * exactly, top-k by (cos DESC, nbr_id ASC) — rank order is exact
    * because the cosines themselves are bit-identical across engines.
    */
  lazy val annSql: String = {
    val topK = Knn.TopK
    s"""WITH RECURSIVE
       |$common,
       |$annCtes
       |SELECT q_id, nbr_id, floor(cos * 10000 + 0.5) / 10000 AS cos, rn::BIGINT AS rn
       |FROM ranked WHERE rn <= $topK
       |ORDER BY q_id, rn""".stripMargin
  }

  /** `q_ann_recall`: the ANN ranked list joined against an exact
    * brute-force ranked list (the `q_knn_cosine` oracle's shape, here
    * sharing the `vec`/`norms` CTEs) — per-query hit counts and
    * recall@k as one exact int64/int64 division, round4'd.
    */
  lazy val recallSql: String = {
    val numQueries = Knn.NumQueries
    val topK = Knn.TopK
    s"""WITH RECURSIVE
       |$common,
       |$annCtes,
       |ann AS (SELECT q_id, nbr_id FROM ranked WHERE rn <= $topK),
       |bscored AS (
       |  SELECT va.vec_id AS q_id, vb.vec_id AS nbr_id,
       |         list_dot_product(va.e, vb.e) / (na.norm * nb.norm) AS cos
       |  FROM vec va JOIN vec vb ON vb.vec_id <> va.vec_id
       |  JOIN norms na ON na.vec_id = va.vec_id
       |  JOIN norms nb ON nb.vec_id = vb.vec_id
       |  WHERE va.vec_id < $numQueries
       |),
       |brute AS (
       |  SELECT q_id, nbr_id FROM (
       |    SELECT q_id, nbr_id,
       |           row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, nbr_id ASC) AS rn
       |    FROM bscored
       |  ) WHERE rn <= $topK
       |),
       |ex AS (SELECT q_id, count(*) AS n_exact FROM brute GROUP BY q_id),
       |an AS (SELECT q_id, count(*) AS n_ann FROM ann GROUP BY q_id),
       |hit AS (
       |  SELECT b.q_id, count(*) AS n_hit
       |  FROM brute b JOIN ann a ON a.q_id = b.q_id AND a.nbr_id = b.nbr_id
       |  GROUP BY b.q_id
       |)
       |SELECT ex.q_id, ex.n_exact,
       |  coalesce(an.n_ann, 0) AS n_ann,
       |  coalesce(hit.n_hit, 0) AS n_hit,
       |  floor(CAST(coalesce(hit.n_hit, 0) AS DOUBLE) / CAST(ex.n_exact AS DOUBLE) * 10000 + 0.5) / 10000 AS recall
       |FROM ex
       |LEFT JOIN an ON an.q_id = ex.q_id
       |LEFT JOIN hit ON hit.q_id = ex.q_id
       |ORDER BY ex.q_id""".stripMargin
  }
}
