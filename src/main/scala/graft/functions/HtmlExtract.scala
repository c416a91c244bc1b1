package graft.functions

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML text extraction — the FRONT of a crawl-curation pipeline
  * (trafilatura / jusText shape, rule-based core): strip non-content
  * blocks (head, script, nav, footer) WITH their contents, drop the
  * remaining markup, and normalize whitespace, leaving the running text
  * every downstream gate (Gopher/C4/freq-rank) actually scores. The
  * reference corpus is pre-extracted, so — exactly like piiRedact
  * (QualityFilters.scala) — the query deterministically PLANTS a full
  * page skeleton from doc_id arithmetic around each document and the
  * operator must recover the content: headline + body paragraphs
  * survive, chrome (nav links, script payload, footer, title) does not.
  *
  * Everything is a scan-local column expression in the Java∩RE2 regex
  * subset (no backrefs/lookaround — one replace per stripped tag
  * class), zero UDFs, zero joins: at 100 TB extraction runs at
  * parquet-read speed, the same plan shape as the other planted gates.
  */
object HtmlExtract {

  /** Deterministic page skeleton around a text column: head (title +
    * style), nav chrome, h1 headline, two content paragraphs, script,
    * footer. All variable parts derive from doc_id so the oracle plants
    * the identical page.
    */
  def plantHtml(docId: Column, text: Column): Column =
    concat(
      lit("<html><head><title>Doc "), docId,
      lit("</title><style>body{font-size:12px;}</style></head><body>"),
      lit("<nav>home | about | section"), docId % 7, lit("</nav>"),
      lit("<h1>Doc "), docId, lit("</h1>"),
      lit("<p>"), text, lit("</p>"),
      lit("<p>More about item "), docId % 13, lit(".</p>"),
      lit("<script>var x="), docId % 97, lit(";</script>"),
      lit("<footer>(c) 2026 example.com</footer></body></html>"))

  /** Tag classes whose CONTENT is boilerplate, removed block-wise.
    * head goes first (it contains title and style whole).
    */
  val BlockTags: Seq[String] = Seq("head", "script", "nav", "footer")

  /** The extraction pipeline over a raw-html column: block strips,
    * then tag strip, then whitespace normalization.
    */
  def extractText(html: Column): Column = {
    val noBlocks = BlockTags.foldLeft(html)((c, t) =>
      regexp_replace(c, s"(?s)<$t[^>]*>.*?</$t>", " "))
    trim(regexp_replace(regexp_replace(noBlocks, "<[^>]+>", " "), "\\s+", " "))
  }

  /** #2-missing (r8 verdict): the declared query. title is read from
    * the RAW page (metadata a curation pipeline keeps even though the
    * text drops it), n_tags counts planted markup, clean_text is the
    * extracted running text.
    */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame =
    // sortedSpread (r20): clean_text is CORPUS-scale, so r19's
    // sortedOutput persisted a frame bigger than the input against the
    // helper's own contract. Range-partitioning the narrow input and
    // sorting BEFORE the projection keeps the global doc_id order with
    // ONE exchange (which doubles as the parallelism spread), persists
    // nothing, and bounds the range-sampler's double-execution to the
    // raw documents scan instead of the regex pipeline.
    graft.Staging.sortedSpread(Tables.documents(spark, dir), "doc_id")
      .withColumn("html", plantHtml(col("doc_id"), col("text")))
      .select(
        col("doc_id"),
        regexp_extract(col("html"), "<title>(.*?)</title>", 1).as("title"),
        size(regexp_extract_all(col("html"), lit("<[^>]+>"), lit(0))).cast("long").as("n_tags"),
        extractText(col("html")).as("clean_text"))

  /** The composed pipeline-front variant: the corpus report card
    * (rollup over the Gopher gate) computed over EXTRACTED text instead
    * of the pre-cleaned corpus — plant page, extract, gate, report, in
    * ONE documents scan (extraction and gate rules are all scan-local
    * expressions feeding the same rollup aggregate corpusReport uses).
    */
  def htmlCorpusReport(spark: SparkSession, dir: String): DataFrame =
    QualityFilters.corpusReportOver(
      graft.Staging.spread(Tables.documents(spark, dir))
        .withColumn("text",
          extractText(plantHtml(col("doc_id"), col("text")))))
}
