package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables
import graft.operators.{Multimodal => MM}

/** SURVEY.md §2-F: the multimodal decode path, hash-verified at the
  * byte level (n_bytes / head_byte / byte_sum are recomputed by the
  * oracle from the source text — both sides see identical UTF-8). */
object Multimodal {

  private def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = MM.manifest(s, Tables.documents(s, dir))
    MM.extractFeatures(s, assets).toDF().orderBy($"doc_id")
  }

  private val mmFeaturesSql =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | CAST(ord(substr(text, 1, 1)) AS BIGINT) AS head_byte,
      | CAST(list_sum(list_transform(string_split(text, ''), c -> ord(c))) AS BIGINT) AS byte_sum
      |FROM documents ORDER BY doc_id""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "mm_features" -> QueryDef(mmFeatures, Some(mmFeaturesSql))
  )
}
