package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Noise-tolerant JSON-lines ingestion.
  *
  * The reference mapper strips any garbage before the first '{' of each
  * log line before parsing (ClickThru.java:97-98:
  * `valueString.substring(valueString.indexOf("{"))`). Here that is a
  * single codegen'd expression over a string column — `from_json` on
  * the substring — so parsing stays inside whole-stage codegen and the
  * JSON reader never sees the noise prefix.
  */
object JsonLogs {

  /** Strip everything before the first '{'; null when no '{' at all. */
  def jsonPayload(c: Column): Column =
    when(instr(c, "{") > 0, substring_index_from(c)).otherwise(lit(null))

  private def substring_index_from(c: Column): Column =
    c.substr(instr(c, "{"), length(c))

  /** Parse a DataFrame of raw log lines (column `col`) into `schema`.
    * Unparseable lines are dropped (the reference throws instead —
    * at 100 TB a poison line must not kill the job).
    */
  def parse(raw: DataFrame, schema: StructType, col: String = "value"): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    // PERMISSIVE from_json yields an all-null struct for malformed
    // payloads (not a null struct) — treat those as unparseable too.
    val anyField = schema.fields.map(f => c(s"j.${f.name}").isNotNull).reduce(_ || _)
    raw
      .select(from_json(jsonPayload(raw(col)), schema).as("j"))
      .filter(c("j").isNotNull && anyField)
      .select("j.*")
  }
}
