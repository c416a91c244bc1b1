package graft

/** Pins the r15 pre-compare domain probe: Verify emits the two XXH64
  * text-replay oracles (q_dedup_minhash_lsh / q_dedup_simhash) only
  * when the corpus satisfies MinHashOracle's documented arithmetic
  * domain — ASCII text, 3-gram shingles under the 32-byte stripe-path
  * limit. A violating corpus downgrades those two to rows-only with a
  * diagnostic instead of surfacing as a misleading hash mismatch.
  */
class VerifyDomainSpec extends SparkSpec {
  import spark.implicits._

  test("shipped corpus passes the text-replay domain probe") {
    assert(Verify.textReplayDomainOk(Tables.documents(spark, sfDir)))
  }

  test("multibyte text fails the probe") {
    val docs = Seq((1L, "café au lait trois mots")).toDF("doc_id", "text")
    assert(!Verify.textReplayDomainOk(docs))
  }

  test("long tokens fail the probe conservatively (3*maxTok+2 >= 32)") {
    val docs = Seq((1L, "a supercalifragilistic b c d")).toDF("doc_id", "text")
    assert(!Verify.textReplayDomainOk(docs))
    // Boundary: 9-byte tokens → 3*9+2 = 29 < 32 passes; 10-byte → 32 fails.
    val nine = Seq((1L, "aaaaaaaaa bbbbbbbbb ccccccccc")).toDF("doc_id", "text")
    assert(Verify.textReplayDomainOk(nine))
    val ten = Seq((1L, "aaaaaaaaaa bbbbbbbbbb cccccccccc")).toDF("doc_id", "text")
    assert(!Verify.textReplayDomainOk(ten))
  }

  test("probe set is exactly the two text-replay oracles and both have oracle SQL") {
    assert(Verify.textReplayOracles == Set("q_dedup_minhash_lsh", "q_dedup_simhash"))
    assert(Verify.textReplayOracles.subsetOf(SparkEntry.oracleSql.keySet))
  }

  test("ascii-replay set (r17): multimodal checksum oracle guarded by the ASCII half only") {
    assert(Verify.asciiReplayOracles == Set("q_multimodal_pipeline"))
    assert(Verify.asciiReplayOracles.subsetOf(SparkEntry.oracleSql.keySet))
    import spark.implicits._
    // long ASCII tokens violate the shingle bound but NOT the ascii
    // domain — the probe must keep the checksum oracle in that case
    val longTok = Seq((1L, "a supercalifragilistic b c d")).toDF("doc_id", "text")
    val (asciiOk, shingleOk) = Verify.domainProbe(longTok)
    assert(asciiOk && !shingleOk)
    val multibyte = Seq((1L, "café au lait trois mots")).toDF("doc_id", "text")
    val (a2, _) = Verify.domainProbe(multibyte)
    assert(!a2)
  }
}
