package graft.operators

/** DuckDB oracles for `q_model_lr` / `q_model_eval` (r15): the model
  * family graduates from rows-only to full rows+schema+hash — train →
  * score → eval is oracle-closed end-to-end, the same shape as BPE
  * train → apply.
  *
  * What made this replayable (see Model's scaladoc — the engine-side
  * moves): the rational-sigmoid link (no libm `exp`; every op correctly
  * rounded), exact-int64 quantized gradient sums (order-free — the
  * property LBFGS's float treeAggregate structurally lacked), integer
  * Σx/Σx² feature scaling, and the hash-ordered bounded training
  * sample. The replay carries the training rows as ONE list-state row
  * through a recursive CTE (`Iters` levels, one per GD round) — the
  * BpeTrainOracle pattern — then scores the FULL frame with the exact
  * scoring expression (left-associated raw-space margin, σ̃, round4).
  */
object ModelOracle {

  private val Fs = Model.FeatureCols // click, error, signup, view
  private def round4(x: String): String = s"floor(($x) * 10000 + 0.5) / 10000"

  /** σ̃(t) with t appearing twice textually (same bits — deterministic
    * recompute, matching the Scala single-eval).
    */
  private def sigt(t: String): String =
    s"(0.5 + 0.5 * (($t) / (1.0 + abs($t))))"

  /** Shared chain: feature frame, hash-capped sample, integer scale
    * stats, the GD recursion, raw-space coefficients, scored frame.
    */
  private lazy val ctes: Seq[String] = {
    val dim = Fs.length
    val featCols = Fs.map(f =>
      s"count(CASE WHEN event_type = '$f' THEN 1 END) AS $f").mkString(",\n    ")
    val head = Seq(
      s"""feat AS MATERIALIZED (
         |  SELECT user_id,
         |    $featCols,
         |    CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0
         |         THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS label
         |  FROM events GROUP BY user_id
         |)""".stripMargin)
    val hashed = graft.dedup.MinHashOracle.xxhash64LongCtes(
      "(SELECT *, user_id::HUGEINT AS hx0 FROM feat)", "fsamph", "hx0")
    val sample = Seq(
      s"""fsample AS MATERIALIZED (
         |  SELECT ${("user_id" +: Fs.toSeq :+ "label").mkString(", ")}
         |  FROM fsamph
         |  QUALIFY row_number() OVER (ORDER BY hs, user_id) <= ${Model.TrainCap}
         |)""".stripMargin,
      s"""fstats AS MATERIALIZED (
         |  SELECT count(*)::BIGINT AS n,
         |    ${Fs.zipWithIndex.map { case (f, j) =>
                s"sum($f)::BIGINT AS sx$j, sum($f * $f)::BIGINT AS sxx$j" }.mkString(",\n    ")}
         |  FROM fsample
         |)""".stripMargin,
      s"""fscale AS MATERIALIZED (
         |  SELECT n,
         |    ${Fs.indices.map { j =>
                s"CASE WHEN n * sxx$j - sx$j * sx$j <= 0 THEN 0.0::DOUBLE " +
                s"ELSE sqrt(CAST(n * sxx$j - sx$j * sx$j AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) END AS s$j"
              }.mkString(",\n    ")}
         |  FROM fstats
         |)""".stripMargin,
      s"""musers AS MATERIALIZED (
         |  SELECT list(z ORDER BY user_id) AS uz, list(label ORDER BY user_id) AS uy,
         |         count(*)::BIGINT AS n
         |  FROM (
         |    SELECT f.user_id, f.label,
         |      [${Fs.zipWithIndex.map { case (f, j) =>
                 s"CASE WHEN sc.s$j = 0.0 THEN 0.0 ELSE CAST(f.$f AS DOUBLE) / sc.s$j END" }
                 .mkString(", ")}] AS z
         |    FROM fsample f, fscale sc
         |  )
         |)""".stripMargin)

    val q = s"${Model.Quant.toLong}.0"
    val sums = Fs.indices.map { j =>
      s"list_sum(list_transform(range(1, n + 1), i -> CAST(floor((res[i] * uz[i][${j + 1}]) * $q + 0.5) AS BIGINT)))::BIGINT AS sq$j"
    } :+ s"list_sum(list_transform(range(1, n + 1), i -> CAST(floor(res[i] * $q + 0.5) AS BIGINT)))::BIGINT AS sqb"
    val wUpd = Fs.indices.map { j =>
      s"w[${j + 1}] - ${Model.Eta} * (((CAST(sq$j AS DOUBLE) / $q) / nd) + ${Model.RegLambda} * w[${j + 1}])"
    }.mkString(",\n      ")
    val gd = Seq(
      s"""gdr AS (
         |  SELECT 0 AS step, CAST([${Fs.indices.map(_ => "0.0").mkString(", ")}] AS DOUBLE[]) AS w, 0.0::DOUBLE AS b
         |  UNION ALL
         |  SELECT step + 1,
         |    [$wUpd] AS w,
         |    b - ${Model.Eta} * ((CAST(sqb AS DOUBLE) / $q) / nd) AS b
         |  FROM (
         |    SELECT step, w, b, n, nd,
         |      ${sums.mkString(",\n      ")}
         |    FROM (
         |      SELECT g.step, g.w, g.b, m.n, CAST(m.n AS DOUBLE) AS nd, m.uz,
         |        list_transform(range(1, m.n + 1),
         |          i -> ${sigt("list_dot_product(m.uz[i], g.w) + g.b")} - m.uy[i]) AS res
         |      FROM gdr g, musers m WHERE g.step < ${Model.Iters}
         |    )
         |  )
         |)""".stripMargin,
      s"""coefs AS MATERIALIZED (
         |  SELECT [${Fs.zipWithIndex.map { case (_, j) =>
             s"CASE WHEN sc.s$j = 0.0 THEN 0.0 ELSE g.w[${j + 1}] / sc.s$j END" }.mkString(", ")}] AS wr,
         |         g.b AS b
         |  FROM gdr g, fscale sc WHERE g.step = ${Model.Iters}
         |)""".stripMargin)

    // Raw-space margin, LEFT-ASSOCIATED in declared feature order —
    // exactly the engine's Column reduce(_ + _) + intercept.
    val margin = Fs.zipWithIndex
      .map { case (f, j) => s"CAST(f.$f AS DOUBLE) * c.wr[${j + 1}]" }
      .mkString(" + ") + " + c.b"
    val score = Seq(
      s"""pred AS MATERIALIZED (
         |  SELECT f.user_id,
         |    CAST(f.label AS BIGINT) AS actual,
         |    CAST((${sigt(margin)}) > 0.5 AS BIGINT) AS predicted,
         |    ${round4(sigt(margin))} AS p_converted
         |  FROM feat f, coefs c
         |)""".stripMargin)

    head ++ hashed ++ sample ++ gd ++ score
  }

  /** `q_model_lr`: the scored per-user frame. */
  lazy val trainPredictSql: String =
    s"""WITH RECURSIVE
       |${ctes.mkString(",\n")}
       |SELECT user_id, actual, predicted, p_converted
       |FROM pred ORDER BY user_id""".stripMargin

  /** `q_model_eval`: the decile rollup — integer confusion counts, the
    * exact-int mean_p (Σ round(p·10⁴) then two IEEE divisions — see
    * Model.evalTable), obs_rate from exactly-summable 0/1 doubles.
    */
  lazy val evalSql: String =
    s"""WITH RECURSIVE
       |${ctes.mkString(",\n")},
       |ev AS (
       |  SELECT least(CAST(floor(p_converted * 10) AS BIGINT), 9) AS decile,
       |         count(*)::BIGINT AS n,
       |         sum(CASE WHEN actual = 1 AND predicted = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
       |         sum(CASE WHEN actual = 0 AND predicted = 1 THEN 1 ELSE 0 END)::BIGINT AS fp,
       |         sum(CASE WHEN actual = 1 AND predicted = 0 THEN 1 ELSE 0 END)::BIGINT AS fn,
       |         sum(CASE WHEN actual = 0 AND predicted = 0 THEN 1 ELSE 0 END)::BIGINT AS tn,
       |         sum(CAST(round(p_converted * 10000) AS BIGINT))::BIGINT AS p4sum,
       |         avg(CAST(actual AS DOUBLE)) AS obsr
       |  FROM pred GROUP BY 1
       |)
       |SELECT decile, n, tp, fp, fn, tn,
       |       ${round4("(CAST(p4sum AS DOUBLE) / 10000.0) / CAST(n AS DOUBLE)")} AS mean_p,
       |       ${round4("obsr")} AS obs_rate
       |FROM ev ORDER BY decile""".stripMargin
}
