package graft.operators

import org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper

/** DuckDB oracle for `q_distinct_agg_approx` (r15): a cross-engine
  * replay of Spark's HyperLogLog++ sketch — registers, estimator,
  * bias correction and all — so the approximate-distinct query
  * graduates from rows-only to full rows+schema+hash.
  *
  * Why this is replayable: the sketch state is ORDER-FREE (per-value
  * XXH64 → register index + leading-zero rank, max per register — the
  * merge is a max, so partitioning cannot change it), and the
  * estimator is a deterministic function of the register array
  * evaluated in FIXED register order (Spark's query() walks words
  * ascending). The replay:
  * - value hash: the `MinHashOracle.xxhash64LongCtes` HUGEINT replay
  *   (HLL++ hashes through the same XxHash64Function, seed 42);
  * - register index = hash >>> idxShift; rank = nlz((hash << p) |
  *   wPadding) + 1, where the OR is an ADD (the shifted value's low p
  *   bits are zero and wPadding < 2^p) and nlz comes from an exact
  *   power-of-two comparison table — no float log anywhere in the
  *   sketch;
  * - zInverse = Σ 2^(−M_idx) folded in ascending register order (each
  *   addend an exact power-of-two literal — bit-identical fold);
  * - the branchy estimator replays literally: linear counting
  *   H = m·ln(m/V) under the threshold table, else the bias-corrected
  *   raw estimate E − bias(E) with the K-nearest window over the
  *   published RAW_ESTIMATE/BIAS tables (binarySearch ≡ count-below on
  *   the sorted distinct table; the window slide's fixed point has the
  *   closed form "first l with l+W ≥ n or dist(l+W) ≥ dist(l)");
  * - Math.round = floor(x + 0.5) (Java semantics, not half-away).
  *
  * Every constant (p, m, idxShift, wPadding, alphaM2, thresholds, the
  * two bias tables, K) is extracted from the LIVE
  * `HyperLogLogPlusPlusHelper` at SQL-generation time — the oracle can
  * never drift from the Spark build it tests.
  *
  * Documented ulp-class trade (the xxhash64-collision convention): the
  * linear-counting branch contains the ONE non-exactly-rounded
  * operation in the whole replay — `ln` — so a group whose H lands
  * within an ulp of a .5 rounding boundary or of the branch threshold
  * could round differently across engines (probability ~1e-13 per
  * group). Everything else is bit-exact by construction.
  */
object HllOracle {

  private val Rsd = 0.02

  private lazy val helper = new HyperLogLogPlusPlusHelper(Rsd)

  private def field[T](name: String): T = {
    val f = helper.getClass.getDeclaredField(name)
    f.setAccessible(true)
    f.get(helper).asInstanceOf[T]
  }
  private lazy val p: Int =
    field[java.lang.Integer]("org$apache$spark$sql$catalyst$util$HyperLogLogPlusPlusHelper$$p").intValue
  private lazy val m: Int =
    field[java.lang.Integer]("org$apache$spark$sql$catalyst$util$HyperLogLogPlusPlusHelper$$m").intValue
  private lazy val idxShift: Int = field[java.lang.Integer]("idxShift").intValue
  private lazy val wPadding: Long = field[java.lang.Long]("wPadding").longValue
  private lazy val alphaM2: Double = field[java.lang.Double]("alphaM2").doubleValue
  private lazy val kNear: Int = HyperLogLogPlusPlusHelper.K
  private lazy val threshold: Double = HyperLogLogPlusPlusHelper.THRESHOLDS(p - 4)
  private lazy val rawEst: Array[Double] = HyperLogLogPlusPlusHelper.RAW_ESTIMATE_DATA(p - 4)
  private lazy val biasT: Array[Double] = HyperLogLogPlusPlusHelper.BIAS_DATA(p - 4)

  private def dlist(a: Array[Double]): String =
    s"CAST([${a.map(d => s"$d").mkString(", ")}] AS DOUBLE[])"

  /** `q_distinct_agg_approx`: approx_count_distinct(o_custkey, 0.02)
    * + exact count, grouped by o_orderpriority.
    */
  lazy val sql: String = {
    val maxRank = 64 - p + 1
    // 1/2^M for M in 0..maxRank, exact double literals (index M+1).
    val inv2 = dlist(Array.tabulate(maxRank + 1)(M => 1.0 / (1L << M)))
    val hashed = graft.dedup.MinHashOracle.xxhash64LongCtes(
      "(SELECT DISTINCT o_orderpriority AS grp, o_custkey AS v, o_custkey::HUGEINT AS hx0 FROM orders)",
      "hsh", "hx0")
    val nRe = rawEst.length
    val dist = (i: String) => s"((E - RE[($i) + 1]) * (E - RE[($i) + 1]))"
    s"""WITH RECURSIVE
       |${hashed.mkString(",\n")},
       |p2(b, v) AS (
       |  SELECT 0, 1::HUGEINT
       |  UNION ALL
       |  SELECT b + 1, v * 2 FROM p2 WHERE b < 63
       |),
       |hh AS MATERIALIZED (
       |  SELECT grp,
       |         CASE WHEN hs < 0 THEN hs::HUGEINT + 18446744073709551616::HUGEINT ELSE hs::HUGEINT END AS hu
       |  FROM hsh
       |),
       |regs AS MATERIALIZED (
       |  SELECT grp, idx, max(rank) AS rank
       |  FROM (
       |    SELECT grp,
       |      CAST(hu // ${BigInt(1) << idxShift}::HUGEINT AS BIGINT) AS idx,
       |      -- y = (hash << p) | wPadding: disjoint bits, so the OR is an add
       |      64 - (SELECT max(b) FROM p2
       |            WHERE v <= (hu * ${BigInt(1) << p}::HUGEINT) % 18446744073709551616::HUGEINT + $wPadding::HUGEINT) AS rank
       |    FROM hh
       |  )
       |  GROUP BY grp, idx
       |),
       |glist AS MATERIALIZED (
       |  SELECT grp, map_from_entries(list(struct_pack(k := idx, v := rank))) AS rm
       |  FROM regs GROUP BY grp
       |),
       |hest AS MATERIALIZED (
       |  SELECT grp,
       |    CASE WHEN V > 0.0 AND ((${p < 19} AND H <= $threshold) OR E <= ${2.5 * m.toDouble}) THEN H
       |         WHEN ${p < 19} AND E < ${5.0 * m.toDouble} THEN E - bias
       |         ELSE E END AS estimate
       |  FROM (
       |    SELECT grp, V, E, H,
       |      -- K-nearest bias window: closed form of Spark's slide loop
       |      list_reduce(list_prepend(0.0::DOUBLE, BD[loww + 1 : loww + W]), (aa, bb) -> aa + bb)
       |        / CAST(W AS DOUBLE) AS bias
       |    FROM (
       |      SELECT grp, V, E, H, RE, BD, W,
       |        list_filter(range(low0, $nRe - W + 1),
       |          l -> l + W >= $nRe OR ${dist("l + W")} >= ${dist("l")})[1] AS loww
       |      FROM (
       |        SELECT grp, V, E, H, RE, BD,
       |          GREATEST(len(list_filter(RE, x -> x < E)) - $kNear + 1, 0) AS low0,
       |          LEAST(GREATEST(len(list_filter(RE, x -> x < E)) - $kNear + 1, 0) + $kNear, $nRe)
       |            - GREATEST(len(list_filter(RE, x -> x < E)) - $kNear + 1, 0) AS W
       |        FROM (
       |          SELECT grp, V, $alphaM2 / zInverse AS E,
       |            CASE WHEN V > 0.0 THEN ${m.toDouble} * ln(${m.toDouble} / V) ELSE 0.0 END AS H,
       |            ${dlist(rawEst)} AS RE, ${dlist(biasT)} AS BD
       |          FROM (
       |            SELECT grp,
       |              list_reduce(list_prepend(0.0::DOUBLE,
       |                list_transform(Ml, M -> $inv2[M + 1])), (aa, bb) -> aa + bb) AS zInverse,
       |              CAST(len(list_filter(Ml, M -> M = 0)) AS DOUBLE) AS V
       |            FROM (
       |              SELECT grp,
       |                list_transform(range(0, $m), i -> coalesce(map_extract(rm, i)[1], 0)) AS Ml
       |              FROM glist
       |            )
       |          )
       |        )
       |      )
       |    )
       |  )
       |),
       |base AS (
       |  SELECT o_orderpriority, count(*)::BIGINT AS n_orders FROM orders GROUP BY o_orderpriority
       |)
       |SELECT b.o_orderpriority,
       |       CAST(floor(h.estimate + 0.5) AS BIGINT) AS n_cust,
       |       b.n_orders
       |FROM base b JOIN hest h ON h.grp = b.o_orderpriority
       |ORDER BY b.o_orderpriority""".stripMargin
  }
}
