package graft.dedup

/** DuckDB oracle for `q_dedup_minhash_lsh`: an EXACT cross-engine
  * replay of the MinHash-LSH candidate generation, the same way the
  * doc-fingerprint oracle replays the rolling polynomial hash — the
  * whole pipeline is RNG-free (seeded xxhash64 chains), so a second
  * engine can reproduce the band keys bit-for-bit and the LSH query
  * graduates from rows-only to a full rows+schema+hash gate.
  *
  * What is replayed, matching Spark's arithmetic exactly (validated
  * bit-for-bit against the Spark plan's band keys on the test corpus):
  * - shingle hash  = XXH64(utf8 bytes of the 3-gram string, seed 42)
  * - minhash(i)    = min over shingles of hashInt(i, hashLong(sgh, 42))
  *   (MinHashExpr's factored form of Spark's left-to-right
  *   `xxhash64(sg, i)` fold; min over SIGNED longs)
  * - band key(j)   = hashInt(j, hashLong(m[4j+3], ... hashLong(m[4j], 42)))
  *   (`xxhash64(m0..m3, j)` with an int literal j)
  * - candidates    = distinct same-(band, key) pairs, a < b
  * - output        = candidates passing the exact >= tau Jaccard verify
  *
  * DuckDB has no XXH64 and its BIGINT errors on overflow instead of
  * wrapping, so all 64-bit arithmetic runs in nonnegative HUGEINT mod
  * 2^64: multiplication wraps via 32-bit limb splitting (a·b mod 2^64 =
  * lo·lo + ((lo·hi + hi·lo) mod 2^32)·2^32, every term < 2^65), rotl is
  * shift-add on disjoint bits, xor round-trips through UBIGINT. The
  * per-step chains are generated as column-at-a-time CTE stages (and
  * nested subqueries inside the two recursive CTEs) so no expression
  * ever duplicates a subexpression textually.
  *
  * Two documented domain assumptions, both of which fail the compare
  * LOUDLY (hash mismatch) rather than silently if violated, same
  * contract as the fingerprint oracle's ASCII note:
  * - shingle strings are ASCII (`ord(char)` = the UTF-8 byte);
  * - shingle strings are < 32 bytes (the XXH64 4-accumulator stripe
  *   path is not replayed; the corpus vocabulary caps 3-grams at 26).
  */
object MinHashOracle {

  private val HU = "18446744073709551616::HUGEINT" // 2^64
  private val B32 = "4294967296::HUGEINT"          // 2^32
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  private val M64 = BigInt(1) << 64

  /** a · const mod 2^64 via 32-bit limbs (const's limbs precomputed). */
  private def mmc(a: String, const: BigInt): String = {
    val lo = const % (BigInt(1) << 32)
    val hi = const >> 32
    s"(((($a) % $B32) * $lo::HUGEINT + (((($a) % $B32) * $hi::HUGEINT" +
      s" + (($a) // $B32) * $lo::HUGEINT) % $B32) * $B32) % $HU)"
  }

  private def rotl(x: String, r: Int): String =
    s"((($x) * ${BigInt(1) << r}::HUGEINT) % $HU + (($x) // ${BigInt(1) << (64 - r)}::HUGEINT))"

  private def xr(a: String, b: String): String =
    s"xor(($a)::UBIGINT, ($b)::UBIGINT)::HUGEINT"

  private def shr(x: String, k: Int): String = s"(($x) // ${BigInt(1) << k}::HUGEINT)"

  private def addm(a: String, b: String): String = s"((($a) + ($b)) % $HU)"

  private def signed(u: String): String =
    s"(CASE WHEN ($u) >= 9223372036854775808::HUGEINT THEN ($u) - $HU ELSE ($u) END)::BIGINT"

  private def unsigned(s: String): String =
    s"(CASE WHEN ($s) < 0 THEN ($s)::HUGEINT + $HU ELSE ($s)::HUGEINT END)"

  /** XXH64 finalization (h ^= h>>33; h *= P2; h ^= h>>29; h *= P3;
    * h ^= h>>32) as three named stages; result lands in `<pfx>f3`.
    */
  private def fmixStages(h: String, pfx: String): Seq[(String, String)] = Seq(
    s"${pfx}f1" -> mmc(xr(h, shr(h, 33)), P2),
    s"${pfx}f2" -> mmc(xr(s"${pfx}f1", shr(s"${pfx}f1", 29)), P3),
    s"${pfx}f3" -> xr(s"${pfx}f2", shr(s"${pfx}f2", 32)))

  /** XXH64.hashLong(x, seed) as named stages; result in `<pfx>f3`. */
  private def hashLongStages(x: String, seed: String, pfx: String): Seq[(String, String)] = Seq(
    s"${pfx}ka" -> mmc(x, P2),
    s"${pfx}kb" -> rotl(s"${pfx}ka", 31),
    s"${pfx}kc" -> mmc(s"${pfx}kb", P1),
    s"${pfx}h0" -> addm(seed, s"${(P5 + 8) % M64}::HUGEINT"),
    s"${pfx}hx" -> xr(s"${pfx}h0", s"${pfx}kc"),
    s"${pfx}hr" -> rotl(s"${pfx}hx", 27),
    s"${pfx}hy" -> addm(mmc(s"${pfx}hr", P1), s"$P4::HUGEINT")) ++
    fmixStages(s"${pfx}hy", pfx)

  /** XXH64.hashInt(i, seed) as named stages; result in `<pfx>f3`. */
  private def hashIntStages(i: String, seed: String, pfx: String): Seq[(String, String)] = Seq(
    s"${pfx}h0" -> addm(seed, s"${(P5 + 4) % M64}::HUGEINT"),
    s"${pfx}hx" -> xr(s"${pfx}h0", mmc(i, P1)),
    s"${pfx}hr" -> rotl(s"${pfx}hx", 23),
    s"${pfx}hy" -> addm(mmc(s"${pfx}hr", P2), s"$P3::HUGEINT")) ++
    fmixStages(s"${pfx}hy", pfx)

  /** One CTE per stage (arguments stay column refs — no textual
    * subexpression blow-up); the last is named `name`.
    */
  private def cteChain(base: String, name: String, stages: Seq[(String, String)]): Seq[String] =
    stages.zipWithIndex.map { case ((cn, ex), k) =>
      val nm = if (k == stages.length - 1) name else s"${name}_$k"
      val src = if (k == 0) base else s"${name}_${k - 1}"
      s"$nm AS (SELECT *, $ex AS $cn FROM $src)"
    }

  /** Nested one-column-per-level subqueries, for use INSIDE a recursive
    * term where CTE stages are unavailable.
    */
  private def nestedChain(inner: String, stages: Seq[(String, String)]): String =
    stages.foldLeft(inner) { case (q, (cn, ex)) => s"(SELECT *, $ex AS $cn FROM $q)" }

  /** CTE stages appending Spark's `xxhash64(<bigint col>)` (seed 42 —
    * XXH64.hashLong) to CTE `base`: the SIGNED result lands in column
    * `hs` of the final CTE `name`. Exposed for `KMeansOracle`, whose
    * training-sample order replays `orderBy(xxhash64(vec_id))`.
    */
  private[graft] def xxhash64LongCtes(base: String, name: String, x: String): Seq[String] =
    cteChain(base, s"${name}_h", hashLongStages(unsigned(x), "42::HUGEINT", "q")) ++
      Seq(s"$name AS (SELECT *, ${signed("qf3")} AS hs FROM ${name}_h)")

  /** ASCII byte at offset pos+k (0 beyond end — arms only consume
    * guarded widths, so the zero filler is never hashed).
    */
  private def byteAt(k: Int): String =
    s"(CASE WHEN pos + $k < n THEN ord(substr(sg, pos + $k + 1, 1)) ELSE 0 END)::HUGEINT"

  /** The sub-32-byte XXH64 string-hash recursion: hashes the distinct
    * strings of column `sg` in CTE `srcCte`, landing the UNSIGNED
    * result in `hashedCte(sg, sghu)`. Shared by the MinHash and SimHash
    * oracles — the one definition both replays ride.
    */
  private def stringHashCtes(srcCte: String, hashedCte: String): Seq[String] = {
    val w8 = (0 until 8).map(k => s"${byteAt(k)} * ${BigInt(1) << (8 * k)}::HUGEINT").mkString(" + ")
    val w4 = (0 until 4).map(k => s"${byteAt(k)} * ${BigInt(1) << (8 * k)}::HUGEINT").mkString(" + ")
    // The three chunk arms of the sub-32-byte XXH64 body: 8-byte word,
    // the (at most one) 4-byte word, single bytes.
    val arm8 = Seq(
      "ka8" -> mmc("w8", P2), "kb8" -> rotl("ka8", 31), "kc8" -> mmc("kb8", P1),
      "hx8" -> xr("h", "kc8"), "hr8" -> rotl("hx8", 27),
      "hy8" -> addm(mmc("hr8", P1), s"$P4::HUGEINT"))
    val arm4 = Seq(
      "m4" -> mmc("w4", P1), "hx4" -> xr("h", "m4"), "hr4" -> rotl("hx4", 23),
      "hy4" -> addm(mmc("hr4", P2), s"$P3::HUGEINT"))
    val arm1 = Seq(
      "m1" -> mmc("b1", P5), "hx1" -> xr("h", "m1"), "hr1" -> rotl("hx1", 11),
      "hy1" -> mmc("hr1", P1))
    val strInner =
      s"(SELECT sg, n, pos, h, n - pos AS rem, $w8 AS w8, $w4 AS w4, ${byteAt(0)} AS b1" +
        " FROM shrec WHERE pos < n)"
    val strRec = nestedChain(strInner, arm8 ++ arm4 ++ arm1)
    val strRecTerm =
      "SELECT sg, n, " +
        "CASE WHEN rem >= 8 THEN pos + 8 WHEN rem >= 4 THEN pos + 4 ELSE pos + 1 END AS pos, " +
        "CASE WHEN rem >= 8 THEN hy8 WHEN rem >= 4 THEN hy4 ELSE hy1 END AS h " +
        s"FROM $strRec"
    val hInit = s"(42::HUGEINT + $P5::HUGEINT + length(sg)::HUGEINT) % $HU"
    Seq(
      s"""shrec(sg, n, pos, h) AS (
         |  SELECT sg, length(sg) AS n, 0 AS pos, $hInit AS h FROM $srcCte
         |  UNION ALL
         |  $strRecTerm
         |)""".stripMargin) ++
      cteChain("(SELECT sg, h FROM shrec WHERE pos = n)", "sgh", fmixStages("h", "sf")) ++
      Seq(s"$hashedCte AS (SELECT sg, sff3 AS sghu FROM sgh)")
  }

  private val Tau = 0.8

  /** The full MinHash replay chain — shingles, XXH64 string/long hash
    * recursions, signatures, band-key folds, banded candidates, exact
    * intersection counts, set sizes — shared by `sql`, `recallSql`, and
    * `indexStatsSql` so the three oracles can never drift apart (DuckDB
    * binds CTEs lazily: each final select pays only the chain prefix it
    * references).
    */
  private lazy val pairCtes: Seq[String] = {
    val kMinhash = Dedup.MinHashK
    val nBands = Dedup.NumBands
    val bandRows = Dedup.BandRows
    val foldInner =
      s"(SELECT bf.doc_id, bf.j, bf.r, bf.h, ${unsigned("g.ms")} AS x" +
        s" FROM bandfold bf JOIN sig g ON g.doc_id = bf.doc_id AND g.i = bf.j * $bandRows + bf.r" +
        s" WHERE bf.r < $bandRows)"
    // The fold step is one hashLong(m, state) whose staged columns are
    // b-prefixed (bka..bf3) so they never collide with the state column h.
    val foldRec = nestedChain(foldInner, hashLongStages("x", "h", "b"))

    Seq(
      """tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
        |         generate_subscripts(string_split(text, ' '), 1) AS i
        |  FROM documents
        |)""".stripMargin,
      """shl AS (
        |  SELECT DISTINCT t1.doc_id, t1.w || ' ' || t2.w || ' ' || t3.w AS sg
        |  FROM tok t1
        |  JOIN tok t2 ON t1.doc_id = t2.doc_id AND t2.i = t1.i + 1
        |  JOIN tok t3 ON t1.doc_id = t3.doc_id AND t3.i = t1.i + 2
        |)""".stripMargin,
      "sgs AS (SELECT DISTINCT sg FROM shl)") ++
      stringHashCtes("sgs", "sghash") ++
      cteChain("sghash", "tchain", hashLongStages("sghu", "42::HUGEINT", "t")) ++
      Seq("tmap AS (SELECT sg, tf3 AS tu FROM tchain)") ++
      cteChain(
        s"(SELECT sg, tu, s.range::HUGEINT AS iu, s.range::INT AS i FROM tmap, range(0, $kMinhash) s)",
        "mchain", hashIntStages("iu", "tu", "m")) ++
      Seq(
        s"mh AS (SELECT sg, i, ${signed("mf3")} AS ms FROM mchain)",
        """sig AS (
          |  SELECT s.doc_id, m.i, min(m.ms) AS ms
          |  FROM shl s JOIN mh m ON s.sg = m.sg
          |  GROUP BY s.doc_id, m.i
          |)""".stripMargin,
        s"""bandfold(doc_id, j, r, h) AS (
           |  SELECT doc_id, s.range::INT AS j, 0 AS r, 42::HUGEINT AS h
           |  FROM (SELECT DISTINCT doc_id FROM sig), range(0, $nBands) s
           |  UNION ALL
           |  SELECT doc_id, j, r + 1, bf3 FROM $foldRec
           |)""".stripMargin) ++
      cteChain(
        s"(SELECT doc_id, j, j::HUGEINT AS ju, h AS hu FROM bandfold WHERE r = $bandRows)",
        "kchain", hashIntStages("ju", "hu", "k")) ++
      Seq(
        s"bk AS (SELECT doc_id, j, ${signed("kf3")} AS key FROM kchain)",
        """cand AS (
          |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          |  FROM bk x JOIN bk y ON x.j = y.j AND x.key = y.key AND x.doc_id < y.doc_id
          |)""".stripMargin,
        """inter AS (
          |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
          |  FROM shl x JOIN shl y ON x.sg = y.sg AND x.doc_id < y.doc_id
          |  GROUP BY 1, 2
          |)""".stripMargin,
        "sizes AS (SELECT doc_id, count(*) AS n FROM shl GROUP BY doc_id)")
  }

  lazy val sql: String =
    s"""WITH RECURSIVE
       |${pairCtes.mkString(",\n")}
       |SELECT c.a AS a, c.b AS b,
       |  floor(i.inter * 1.0 / (sa.n + sb.n - i.inter) * 10000 + 0.5) / 10000 AS jac
       |FROM cand c
       |JOIN inter i ON i.a = c.a AND i.b = c.b
       |JOIN sizes sa ON c.a = sa.doc_id
       |JOIN sizes sb ON c.b = sb.doc_id
       |WHERE i.inter * 1.0 / (sa.n + sb.n - i.inter) >= $Tau
       |ORDER BY a, b""".stripMargin

  /** `q_dedup_recall`: every exact Jaccard-τ pair (the `inter`/`sizes`
    * formulation — identical to the `q_dedup_ngram_jaccard` oracle)
    * LEFT-joined against the banded candidate set; `found` = candidate
    * membership. A candidate that IS an exact pair passes the engine's
    * verify by definition (same Jaccard, same τ), so joining `cand`
    * here is equivalent to joining the verified output — and the
    * verified set being a subset of the exact set makes `found` exactly
    * the engine's membership flag.
    */
  lazy val recallSql: String =
    s"""WITH RECURSIVE
       |${pairCtes.mkString(",\n")}
       |SELECT i.a AS a, i.b AS b,
       |  floor(i.inter * 1.0 / (sa.n + sb.n - i.inter) * 10000 + 0.5) / 10000 AS jac,
       |  CAST(CASE WHEN c.a IS NULL THEN 0 ELSE 1 END AS BIGINT) AS found
       |FROM inter i
       |JOIN sizes sa ON i.a = sa.doc_id
       |JOIN sizes sb ON i.b = sb.doc_id
       |LEFT JOIN cand c ON c.a = i.a AND c.b = i.b
       |WHERE i.inter * 1.0 / (sa.n + sb.n - i.inter) >= $Tau
       |ORDER BY a, b""".stripMargin

  /** `q_index_stats`: per-band bucket-shape report over the replayed
    * band-key frame `bk` — integer aggregates plus one IEEE division
    * for the singleton fraction, all engine-exact.
    */
  lazy val indexStatsSql: String =
    s"""WITH RECURSIVE
       |${pairCtes.mkString(",\n")},
       |buckets AS (
       |  SELECT j AS band, key, count(*) AS c FROM bk GROUP BY 1, 2
       |)
       |SELECT CAST(band AS BIGINT) AS band,
       |  CAST(sum(c) AS BIGINT) AS n_docs,
       |  count(*) AS n_buckets,
       |  CAST(max(c) AS BIGINT) AS max_bucket,
       |  CAST(sum(c * (c - 1) // 2) AS BIGINT) AS cand_pairs,
       |  floor(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |        / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000 AS singleton_frac
       |FROM buckets
       |GROUP BY band
       |ORDER BY band""".stripMargin

  /** DuckDB oracle for `q_dedup_simhash` (r14), riding the same XXH64
    * string replay: per-token hashes (ALL occurrences vote, not
    * distinct tokens), bit i of the fingerprint set iff the ±1 vote sum
    * is strictly positive (2·n_set > n_toks), block keys from the
    * unsigned fingerprint ((ufp >> 16j) & 0xFFFF — identical to Spark's
    * arithmetic shiftright + mask because the mask discards the sign
    * extension), candidates from same-(block, key) pairs, hamming via
    * bit_count(xor) ≤ maxHamming. Powers of two come from a recursive
    * doubling CTE (DuckDB's power() is float — useless for exact bit
    * work). Same loud-failure domain assumptions as the MinHash replay.
    */
  lazy val simhashSql: String = {
    val blocks = Dedup.SimHashBlocks
    val blockBits = Dedup.SimHashBlockBits
    val maxHamming = 3
    val bandVals = (0 until blocks).map { j =>
      s"($j, (ufp // ${BigInt(1) << (blockBits * j)}::HUGEINT) % ${BigInt(1) << blockBits}::HUGEINT)"
    }.mkString(", ")
    val ctes = Seq(
      """tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents WHERE text IS NOT NULL
        |)""".stripMargin,
      "sgs AS (SELECT DISTINCT w AS sg FROM tok)") ++
      stringHashCtes("sgs", "tokhash") ++
      Seq(
        """p2(b, v) AS (
          |  SELECT 0, 1::HUGEINT
          |  UNION ALL
          |  SELECT b + 1, v * 2 FROM p2 WHERE b < 63
          |)""".stripMargin,
        """votes AS (
          |  SELECT t.doc_id, p.b,
          |         count(*) AS n_toks,
          |         sum(((th.sghu // p.v) % 2)::BIGINT) AS n_set
          |  FROM tok t JOIN tokhash th ON t.w = th.sg, p2 p
          |  GROUP BY t.doc_id, p.b
          |)""".stripMargin,
        """fpu AS (
          |  SELECT v.doc_id, sum(CASE WHEN 2 * v.n_set > v.n_toks THEN p.v ELSE 0::HUGEINT END) AS ufp
          |  FROM votes v JOIN p2 p ON p.b = v.b
          |  GROUP BY v.doc_id
          |)""".stripMargin,
        s"""bands AS (
           |  SELECT doc_id, bx.band, bx.key
           |  FROM fpu, LATERAL (VALUES $bandVals) AS bx(band, key)
           |)""".stripMargin,
        """cand AS (
          |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          |  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
          |)""".stripMargin)
    s"""WITH RECURSIVE
       |${ctes.mkString(",\n")}
       |SELECT c.a AS a, c.b AS b,
       |  bit_count(xor(fa.ufp::UBIGINT, fb.ufp::UBIGINT))::INT AS hamming
       |FROM cand c
       |JOIN fpu fa ON fa.doc_id = c.a
       |JOIN fpu fb ON fb.doc_id = c.b
       |WHERE bit_count(xor(fa.ufp::UBIGINT, fb.ufp::UBIGINT)) <= $maxHamming
       |ORDER BY a, b""".stripMargin
  }
}
