package graft

import graft.sources.JsonIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("tag", StringType)))

  test("valid rows flatten, corrupt rows quarantine with raw payload intact, nothing is lost") {
    import spark.implicits._
    val raw = Seq(
      (1L, """{"k": 7, "tag": "ok"}"""),
      (2L, """{"k": 8}"""),            // missing field -> valid, tag null
      (3L, """not json at all"""),     // corrupt -> quarantine
      (4L, """{"k": "}"""),            // truncated -> quarantine
      (5L, null.asInstanceOf[String])  // empty fetch body -> quarantine (repair trail)
    ).toDF("id", "payload")
    val (valid, quarantine) = JsonIngest.parseWithQuarantine(raw, "payload", schema)
    assert(valid.columns.toSeq == Seq("id", "k", "tag"))
    val v = valid.orderBy("id").collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(v == Seq((1L, Some(7), Some("ok")), (2L, Some(8), None)))
    val q = quarantine.orderBy("id").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(q == Seq((3L, Some("not json at all")), (4L, Some("""{"k": "}""")), (5L, None)),
      "quarantine must keep the raw payload, including null bodies")
    assert(valid.count() + quarantine.count() == raw.count(), "no row may vanish")
  }

  test("CSV ingest honors the same quarantine contract") {
    import spark.implicits._
    val csvSchema = StructType(Seq(
      StructField("k", IntegerType), StructField("tag", StringType)))
    val raw = Seq(
      (1L, "7,ok"),
      (2L, "8,"),                      // missing field -> valid, tag null
      (3L, "seven,ok"),                // type mismatch -> quarantine
      (4L, null.asInstanceOf[String])  // empty body -> quarantine
    ).toDF("id", "payload")
    val (valid, quarantine) = graft.sources.CsvIngest.parseWithQuarantine(raw, "payload", csvSchema)
    assert(valid.columns.toSeq == Seq("id", "k", "tag"))
    val v = valid.orderBy("id").collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(v == Seq((1L, Some(7), Some("ok")), (2L, Some(8), None)), s"got $v")
    val q = quarantine.orderBy("id").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(q == Seq((3L, Some("seven,ok")), (4L, None)), s"got $q")
    assert(valid.count() + quarantine.count() == raw.count(), "no row may vanish")
  }

  test("real events.props corpus parses clean against its declared schema") {
    val events = Tables.events(spark, sfDir).select("event_id", "props")
    val (valid, quarantine) = JsonIngest.parseWithQuarantine(
      events, "props", StructType(Seq(StructField("k", IntegerType))))
    assert(quarantine.count() == 0, "testdata props are all valid JSON")
    assert(valid.count() == events.count())
    assert(valid.filter(col("k").isNull).count() == 0)
  }
}
