package graft.functions

/** DuckDB oracle for `q_bpe_train` (r15): a full cross-engine replay of
  * the weighted-lexicon BPE merge LOOP — the training half of the
  * tokenizer story, closing train→publish→apply oracle-end-to-end
  * (the apply half, `Bpe.oracleSql`, has replayed `graft_bpe` since r8).
  *
  * Why this is replayable at all: the corpus-touching half of training
  * is one aggregation producing a BOUNDED lexicon (top `maxLexicon`
  * (pre, cnt) rows, deterministic order), and the merge loop is then a
  * pure deterministic function of that lexicon — most-frequent adjacent
  * symbol pair, ties to the lexicographically smaller (left, right)
  * (`BpeTrain.trainFromLexicon`). So the oracle carries the WHOLE
  * lexicon as one row of LIST(STRUCT(syms, cnt)) state through a
  * recursive CTE, one level per merge:
  *
  * - pair counts: flatten over words of adjacent (sym[i], sym[i+1])
  *   pairs weighted by word count — overlapping pairs counted, same as
  *   the Scala loop.
  * - argmax with the exact tie-break: each candidate pair is scored as
  *   `lpad(10^18 - count) || l || chr(1) || r` and the argmax is
  *   `list_min` — the fixed-width count prefix makes string order =
  *   (count DESC, then (l, r) lexicographic ASC); chr(1) sorts below
  *   every corpus byte, so l-prefix ties resolve identically to
  *   Scala's (String, String) ordering on this ASCII domain.
  * - merge application: greedy left-to-right non-overlapping
  *   replacement per word. Overlap is only possible when l = r (runs of
  *   one symbol); match positions are grouped into consecutive chains
  *   by the classic pos - idx key, and within a chain every second
  *   match is kept — exactly the Scala scanner's k += 2 behavior.
  * - termination: numMerges levels or no pairs left, whichever first.
  *
  * Cost shape: per level the count aggregation is keys × pairs list
  * lambdas over ONE row's state — quadratic in the lexicon, which is
  * fine precisely because the lexicon is vocabulary-scale by contract
  * (the same boundedness argument that makes the driver loop viable).
  */
object BpeTrainOracle {

  /** `1000000000000000000 - cnt`, zero-padded to fixed width so string
    * order on the prefix is count-descending. Counts are corpus token
    * counts, far below 10^18.
    */
  private val ScorePad = 19

  def oracleSql: String = oracleSql(Bpe.Merges.length, BpeTrain.DefaultMaxLexicon)

  def oracleSql(numMerges: Int, maxLexicon: Int): String = {
    // Symbol list of the word under the `w ->` lambda.
    val SY = "struct_extract(w, 'syms')"
    // Match positions of the best pair (l, r) in SY, 1-based.
    val P = s"list_filter(range(1, len($SY)), i -> $SY[i] = l AND $SY[i+1] = r)"
    // Chain keys: pos - idx is constant within a consecutive run.
    val GL = s"list_transform(range(1, len($P) + 1), q -> list_extract($P, q) - q)"
    // Kept (non-overlapping) match positions: every second match per chain.
    val TP = s"list_transform(list_filter(range(1, len($P) + 1), " +
      s"j -> (j - list_position($GL, list_extract($P, j) - j)) % 2 = 0), " +
      s"j2 -> list_extract($P, j2))"
    val newSyms =
      s"flatten(list_transform(range(1, len($SY) + 1), x -> " +
        s"CASE WHEN list_contains($TP, x) THEN [l || r] " +
        s"WHEN list_contains($TP, x - 1) THEN CAST([] AS VARCHAR[]) " +
        s"ELSE [$SY[x]] END))"
    val pairsExpr =
      "flatten(list_transform(words, w -> " +
        s"list_transform(range(1, len($SY)), i -> " +
        s"struct_pack(k := $SY[i] || chr(1) || $SY[i+1], c := struct_extract(w, 'cnt')))))"
    val bestExpr =
      "CASE WHEN len(pairs) = 0 THEN NULL ELSE substr(list_min(" +
        "list_transform(list_distinct(list_transform(pairs, p -> struct_extract(p, 'k'))), k -> " +
        s"lpad(CAST(1000000000000000000 - list_sum(list_transform(pairs, p2 -> " +
        "CASE WHEN struct_extract(p2, 'k') = k THEN struct_extract(p2, 'c') ELSE 0 END)) " +
        s"AS VARCHAR), $ScorePad, '0') || k)), ${ScorePad + 1}) END"
    raw"""WITH RECURSIVE lex0 AS (
         |  SELECT CASE WHEN pos = 1 THEN w ELSE ' ' || w END AS pre
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w,
         |               generate_subscripts(string_split(text, ' '), 1) AS pos
         |        FROM documents)
         |), lexagg AS (
         |  SELECT pre, count(*) AS cnt FROM lex0 GROUP BY pre
         |  ORDER BY cnt DESC, pre ASC LIMIT $maxLexicon
         |), lex AS (
         |  SELECT list(struct_pack(syms := string_split_regex(pre, ''), cnt := cnt)) AS words
         |  FROM lexagg
         |), train AS (
         |  SELECT 0 AS iter, (SELECT words FROM lex) AS words, CAST([] AS VARCHAR[]) AS merges
         |  UNION ALL
         |  SELECT iter + 1,
         |         list_transform(words, w -> struct_pack(syms := $newSyms, cnt := struct_extract(w, 'cnt'))) AS words,
         |         list_append(merges, best) AS merges
         |  FROM (
         |    SELECT iter, words, merges, best,
         |           string_split(best, chr(1))[1] AS l,
         |           string_split(best, chr(1))[2] AS r
         |    FROM (
         |      SELECT iter, words, merges, $bestExpr AS best
         |      FROM (SELECT iter, words, merges, $pairsExpr AS pairs
         |            FROM train WHERE iter < $numMerges)
         |    )
         |    WHERE best IS NOT NULL
         |  )
         |)
         |SELECT CAST(gs - 1 AS BIGINT) AS rank,
         |       string_split(m, chr(1))[1] AS left_sym,
         |       string_split(m, chr(1))[2] AS right_sym
         |FROM (
         |  SELECT unnest(merges) AS m, generate_subscripts(merges, 1) AS gs
         |  FROM train
         |  WHERE iter = (SELECT max(iter) FROM train)
         |)
         |ORDER BY rank""".stripMargin
  }
}
