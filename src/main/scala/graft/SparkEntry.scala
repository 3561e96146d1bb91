package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query modules (SURVEY.md §2). Merged left-to-right; keys are
    * globally unique. */
  private def modules: Seq[Map[String, QueryDef]] = Seq(
    Ctr.defs,
    Relational.defs,
    TpchExtra.defs,
    TpchFinal.defs,
    Pipeline.defs,
    Graph.defs,
    OperatorShowcase.defs,
    Dedup.defs,
    Similarity.defs,
    TextAnalysis.defs,
    Retrieval.defs,
    Multimodal.defs,
    Stats.defs,
    Quality.defs,
    Winnow.defs,
    Hypothesis.defs,
    Monitoring.defs
  )

  lazy val all: Map[String, QueryDef] = modules.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's own pipeline: tolerant JSON logs →
    * join → CTR by (referrer, ad). */
  def entry(spark: SparkSession): DataFrame =
    all("ctr_referrer").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** DuckDB-equivalent SQL for hash-compared queries. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }

  /** Headline queries for Bench. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    all.collect { case (k, q) if q.bench => k -> q.fn }
}
