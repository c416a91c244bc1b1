package graft

import graft.functions.HtmlExtract
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpec {

  test("htmlExtract recovers exactly the content and drops every chrome block") {
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = HtmlExtract.htmlExtract(spark, sfDir).collect()
    assert(rows.length == texts.size, "every doc must survive extraction")
    for (r <- rows) {
      val (id, title, nTags, clean) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))
      // title is raw-page metadata, not part of the text
      assert(title == s"Doc $id")
      // content = headline + both paragraphs, whitespace-normalized;
      // chrome (nav links, script payload, footer, style, title) gone
      val expected = s"Doc $id ${texts(id)} More about item ${id % 13}."
        .replaceAll("\\s+", " ").trim
      assert(clean == expected, s"doc $id extracted '$clean'")
      assert(!clean.contains("<") && !clean.contains(">"), s"doc $id kept markup")
      assert(!clean.contains("example.com") && !clean.contains("var x=") &&
        !clean.contains("font-size") && !clean.contains("home | about"),
        s"doc $id kept boilerplate")
      assert(nTags >= 15, s"doc $id planted page counts only $nTags tags")
    }
  }

  test("extraction is scan-local: no joins, no shuffles before the final sort") {
    val plan = HtmlExtract.htmlExtract(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "extraction must not join")
    // the only exchange is the output sort's range partitioning
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"extraction plans $exchanges exchanges:\n$plan")
  }

  test("htmlCorpusReport plans exactly one documents scan") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val df = HtmlExtract.htmlCorpusReport(spark, sfDir)
    val scans = df.queryExecution.withCachedData.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation
          if h.location.rootPaths.exists(_.toString.contains("documents.parquet")) => 1
        case _ => 0
      }
    }.sum
    assert(scans == 1,
      s"plant+extract+gate+report must compose into ONE documents scan, planned $scans")
  }

  test("htmlCorpusReport: the gate consumes extracted text in one composed pass") {
    val rep = HtmlExtract.htmlCorpusReport(spark, sfDir).collect()
    val grand = rep.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(grand.head.getLong(2) == nDocs, "report must cover every extracted doc")
    // extraction adds exactly 6 words per doc (headline 2 + trailer 4)
    // over the raw-corpus report's total
    val rawTotal = graft.functions.QualityFilters.corpusReport(spark, sfDir)
      .filter(col("lang") === "ALL" && col("source") === "ALL")
      .head.getLong(3)
    assert(grand.head.getLong(3) == rawTotal + 6 * nDocs,
      "extracted word total must be the raw total plus the planted headline/trailer words")
  }
}
