package graft.dedup

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal: drop from every document the "lines"
  * that recur across many documents — the CCNet/RefinedWeb curation
  * step that strips navigation bars, cookie banners, and licence
  * footers a page-level near-dup pass never sees (the page bodies
  * differ; the boilerplate lines repeat corpus-wide).
  *
  * The reference has no analog (its rows arrive structured); for raw
  * text corpora this is a first-class 100 TB operator. The synthetic
  * documents carry no newlines, so a "line" here is a deterministic
  * 10-word span — the algorithm is identical under any liner, and the
  * fixed-width liner keeps the DuckDB oracle bit-exact.
  *
  * Scale shape: one corpus scan → per-doc chunk ARRAY via pure array
  * expressions (no per-word explode — a 10x smaller intermediate than
  * the token frame), staged once (graft.Staging) because both the
  * frequency subtree and the reassembly subtree consume it. Document
  * frequency needs distinct lines PER DOC, and a doc's lines are
  * co-located by construction — `array_distinct` inside the row does
  * it for free, where a (doc,line).distinct() would shuffle the whole
  * chunk frame first (the avoided exchange IS the corpus). The
  * line-frequency frame is corpus-scale, so the join back is a
  * shuffled equi-join on the line — never hint-broadcast (AQE may at
  * toy SF). Reassembly sorts each doc's kept lines by line_no inside
  * the aggregate (collect_list order is partition-dependent; the
  * struct sort restores it), which is safe because a document's line
  * count is bounded by doc length, not corpus size.
  */
object LineDedup {

  /** Words per synthetic line. */
  val LineWords = 10

  /** A line present in >= this many distinct docs is boilerplate. */
  val BoilerplateDf = 3

  /** Per-doc chunk array. */
  private def chunked(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        expr(
          s"transform(sequence(0, (size(w)-1) div $LineWords), i -> array_join(slice(w, i*$LineWords+1, $LineWords), ' '))")
          .as("chunks"))

  /** Per-doc (line_no, line) frame — the spec's reassembly witness. */
  private[graft] def lines(docs: DataFrame): DataFrame =
    chunked(docs).select(col("doc_id"), posexplode(col("chunks")).as(Seq("line_no", "line")))

  def lineDedup(spark: SparkSession, dir: String): DataFrame =
    lineDedupOf(Tables.documents(spark, dir))

  /** Frame-level lineDedup: any (doc_id, text) frame. */
  def lineDedupOf(docs: DataFrame): DataFrame = {
    val chunks = graft.Staging.staged(chunked(docs), "line_chunks")
    val freq = chunks
      .select(explode(array_distinct(col("chunks"))).as("line"))
      .groupBy("line")
      .agg(count(lit(1)).as("df"))
    chunks
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("line_no", "line")))
      .join(freq, "line")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("df") >= BoilerplateDf, 1)).as("n_removed"),
        expr(
          s"array_join(transform(array_sort(collect_list(CASE WHEN df < $BoilerplateDf THEN struct(line_no, line) END)), s -> s.line), ' ')")
          .as("clean_text"))
      .orderBy("doc_id")
  }
}
