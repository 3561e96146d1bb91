package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{TextAnalysis => TA}

/** SURVEY.md §2-E: text analysis query surface over `documents`. */
object TextAnalysis {

  private def textTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.tokenStats(Tables.documents(s, dir)).orderBy($"doc_id")
  }

  private val textTokensSql =
    """SELECT doc_id,
      | CAST(length(text) AS BIGINT) AS n_chars,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  private def textQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.qualityScore(Tables.documents(s, dir)).orderBy($"doc_id")
  }

  private val textQualitySql =
    """SELECT doc_id,
      | CAST(length(text) AS BIGINT) AS n_chars,
      | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      | ROUND(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
      |   / length(text), 9) AS punct_ratio,
      | ROUND(CAST(len(list_filter(string_split(text, ' '),
      |     t -> list_contains(['the','a','and','of','to'], t))) AS DOUBLE)
      |   / len(string_split(text, ' ')), 9) AS stopword_ratio,
      | ROUND(CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |   / len(string_split(text, ' ')), 9) AS mean_word_len
      |FROM documents ORDER BY doc_id""".stripMargin

  private def textLangid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.langId(Tables.documents(s, dir)).orderBy($"doc_id")
  }

  private def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TA.fingerprint(Tables.documents(s, dir)).orderBy($"doc_id")
  }

  val defs: Map[String, QueryDef] = Map(
    "text_tokens" -> QueryDef(textTokens, Some(textTokensSql)),
    "text_quality" -> QueryDef(textQuality, Some(textQualitySql), bench = true),
    "text_langid" -> QueryDef(textLangid, None),
    "text_fingerprint" -> QueryDef(textFingerprint, None)
  )
}
