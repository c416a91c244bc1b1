package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON ingest with quarantine: the lake twin of the reference's API
  * payload ingestion — proto/active_data_gathering.py store raw match
  * JSON after validation, and periodical_data_repair.py re-parses
  * payloads that failed. Parsing uses an EXPLICIT schema (never runtime
  * inference on the full corpus — schema-of-everything scans are a
  * 100 TB anti-pattern) and splits rows instead of aborting: at scale a
  * single bad record must never kill the batch, and silently dropping
  * it loses data — quarantined rows keep the raw payload for repair.
  */
object JsonIngest {

  /** Parse `jsonCol` against `schema`; returns (valid, quarantine).
    * Valid rows carry the passthrough columns plus the flattened parsed
    * fields; quarantine rows keep the original columns (raw payload
    * intact) for later repair/re-parse. `from_json` is a codegen'd
    * expression — one pass, no UDF. Corruption is detected via the
    * corrupt-record column (PERMISSIVE from_json otherwise yields an
    * all-null struct indistinguishable from legitimately-null fields).
    */
  def parseWithQuarantine(
      raw: DataFrame,
      jsonCol: String,
      schema: StructType
  ): (DataFrame, DataFrame) = {
    val corruptCol = "__graft_corrupt"
    val parsed = raw.withColumn(
      "__parsed",
      from_json(col(jsonCol), schema.add(corruptCol, "string"),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol)))
    // NULL payloads are quarantined too: an upstream fetch that wrote an
    // empty body is exactly what the repair loop needs to see — dropping
    // the row would lose the record with no repair trail.
    val isCorrupt = col(s"__parsed.$corruptCol").isNotNull || col(jsonCol).isNull
    val passthrough = raw.columns.filterNot(_ == jsonCol).map(col).toSeq
    val valid = parsed
      .filter(!isCorrupt)
      .select(passthrough ++ schema.fieldNames.map(f => col(s"__parsed.$f")): _*)
    val quarantine = parsed
      .filter(isCorrupt)
      .drop("__parsed")
    (valid, quarantine)
  }
}
