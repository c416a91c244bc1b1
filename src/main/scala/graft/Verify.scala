package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. A query that
  * throws is recorded in failed_queries.json and makes the process exit
  * nonzero — failures must never silently vanish from the gate.
  */
object Verify {
  /** The two oracles that replay XXH64 over corpus TEXT (MinHashOracle's
    * documented domain: ASCII, 3-gram shingles < 32 bytes). The
    * embedding-replay oracles (LshOracle) have no text-domain dependency.
    */
  val textReplayOracles: Set[String] = Set("q_dedup_minhash_lsh", "q_dedup_simhash")

  /** Oracles that replay a BYTE-level computation over corpus text via
    * per-character `ord` (r17: the multimodal checksum roll) — they
    * need only the ASCII half of the domain (ord(char) == byte), not
    * the 32-byte shingle bound.
    */
  val asciiReplayOracles: Set[String] = Set("q_multimodal_pipeline")

  /** One probe, two conditions: (pure-ASCII text, conservative shingle
    * bound 3·maxTokenBytes + 2 < 32). The pair is what the two oracle
    * families split on; `textReplayDomainOk` keeps the original
    * combined contract.
    */
  private[graft] def domainProbe(docs: org.apache.spark.sql.DataFrame): (Boolean, Boolean) = {
    import org.apache.spark.sql.functions._
    val r = docs.select(
      max(when(octet_length(col("text")) =!= length(col("text")), 1)
        .otherwise(0)).as("multibyte"),
      max(expr("array_max(transform(split(text, ' '), t -> octet_length(t)))"))
        .as("max_tok")).first()
    (r.getInt(0) == 0, 3 * r.getInt(1) + 2 < 32)
  }

  /** True iff the corpus satisfies the XXH64 text-replay domain:
    * pure-ASCII text (octet_length == length) and a conservative
    * shingle bound (3·maxTokenBytes + 2 separators < 32 — may downgrade
    * a corpus whose actual 3-grams all stay short, never the reverse).
    */
  def textReplayDomainOk(docs: org.apache.spark.sql.DataFrame): Boolean = {
    val (asciiOk, shingleOk) = domainProbe(docs)
    asciiOk && shingleOk
  }

  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-list of query names] — the optional
    // filter is for local iteration only; the driver always passes 2.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures += name -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
        System.err.println(s"[verify] FAILED $name: $e")
      }
      // Release per-query staged indexes (same hygiene as Bench).
      finally spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Pre-compare domain probe (r15, per ADVICE): the two XXH64
    // text-replay oracles assume an ASCII corpus whose 3-gram shingles
    // stay under 32 bytes (MinHashOracle's documented stripe-path
    // limit). On a corpus that violates either, the Spark answer is
    // still correct but the replay arithmetic diverges — downgrade
    // those two queries to rows-only WITH a diagnostic instead of
    // letting the gate report a misleading hash mismatch. One cheap
    // aggregate over the documents table; conservative bound
    // (3·maxTokenBytes + 2 separator bytes >= 32 triggers even if no
    // actual 3-gram reaches 32).
    val (asciiOk, textOk) = try {
      val (a, s) = domainProbe(Tables.documents(spark, sfDir))
      if (!(a && s)) System.err.println(
        "[verify] XXH64 replay domain violated: downgrading " +
          textReplayOracles.mkString(", ") + " to rows-only")
      if (!a) System.err.println(
        "[verify] ASCII replay domain violated: downgrading " +
          asciiReplayOracles.mkString(", ") + " to rows-only")
      (a, a && s)
    } catch { case e: Throwable =>
      System.err.println(s"[verify] domain probe failed ($e); keeping oracles")
      (true, true)
    }
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => textOk || !textReplayOracles.contains(k) }
      .filter { case (k, _) => asciiOk || !asciiReplayOracles.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(
      Paths.get(s"$outDir/failed_queries.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} queries FAILED: " +
        failures.map(_._1).mkString(", "))
      sys.exit(1)
    }
  }
}
