package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Shared parse-with-quarantine splitter for the payload ingest
  * formats: rows split into (valid, quarantine) instead of aborting —
  * at scale a single bad record must never kill the batch, and
  * silently dropping it loses data. Quarantined rows keep every
  * original column (raw payload intact) for later repair/re-parse;
  * NULL payloads quarantine too (an upstream fetch that wrote an empty
  * body is exactly what the repair loop needs to see).
  */
private[sources] object Quarantine {
  val CorruptCol = "__graft_corrupt"

  /** `parse` must yield a struct of `schema` + CorruptCol (PERMISSIVE
    * parses otherwise produce an all-null struct indistinguishable from
    * legitimately-null fields).
    */
  def split(raw: DataFrame, payloadCol: String, schema: StructType, parse: Column => Column): (DataFrame, DataFrame) = {
    val parsed = raw.withColumn("__parsed", parse(col(payloadCol)))
    val isCorrupt = col(s"__parsed.$CorruptCol").isNotNull || col(payloadCol).isNull
    val passthrough = raw.columns.filterNot(_ == payloadCol).map(col).toSeq
    val valid = parsed
      .filter(!isCorrupt)
      .select(passthrough ++ schema.fieldNames.map(f => col(s"__parsed.$f")): _*)
    val quarantine = parsed
      .filter(isCorrupt)
      .drop("__parsed")
    (valid, quarantine)
  }
}

/** JSON ingest with quarantine: the lake twin of the reference's API
  * payload ingestion — proto/active_data_gathering.py store raw match
  * JSON after validation, and periodical_data_repair.py re-parses
  * payloads that failed. Parsing uses an EXPLICIT schema (never runtime
  * inference on the full corpus — schema-of-everything scans are a
  * 100 TB anti-pattern); `from_json` is a codegen'd expression — one
  * pass, no UDF.
  */
object JsonIngest {

  /** Parse `jsonCol` against `schema`; returns (valid, quarantine). */
  def parseWithQuarantine(
      raw: DataFrame,
      jsonCol: String,
      schema: StructType
  ): (DataFrame, DataFrame) =
    Quarantine.split(raw, jsonCol, schema, c =>
      from_json(c, schema.add(Quarantine.CorruptCol, "string"),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Quarantine.CorruptCol)))
}

/** CSV ingest with the same quarantine contract — `from_csv` supports
  * the identical PERMISSIVE + corrupt-record protocol, so delimited
  * payload columns (exports, logs) get the same no-loss split as JSON.
  */
object CsvIngest {

  /** Parse `csvCol` against `schema`; returns (valid, quarantine). */
  def parseWithQuarantine(
      raw: DataFrame,
      csvCol: String,
      schema: StructType
  ): (DataFrame, DataFrame) =
    Quarantine.split(raw, csvCol, schema, c =>
      from_csv(c, schema.add(Quarantine.CorruptCol, "string"),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Quarantine.CorruptCol)))
}
