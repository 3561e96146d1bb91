package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{Similarity => Sim}

/** SURVEY.md §2-D: ANN query surface. Probe set = vec_id < 10. */
object Similarity {

  private def probes(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < 10)

  private def annBruteforce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sim.bruteForce(s, Tables.embeddings(s, dir), probes(s, dir), k = 5)
      .select($"query_id", $"neighbor_id", $"rk", $"cos_sim")
      .orderBy($"query_id", $"rk")
  }

  private val annBruteforceSql =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
      |sc AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |    ROUND(list_inner_product(qe::DOUBLE[], e.embedding::DOUBLE[])
      |      / (SQRT(list_inner_product(qe::DOUBLE[], qe::DOUBLE[]))
      |         * SQRT(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 9) AS cos_sim
      |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
      |r AS (
      |  SELECT query_id, neighbor_id, cos_sim,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
      |  FROM sc)
      |SELECT query_id, neighbor_id, rk, cos_sim FROM r WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  private def annLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sim.lshTopK(s, Tables.embeddings(s, dir), probes(s, dir), k = 5)
      .select($"query_id", $"neighbor_id", $"rk", $"cos_sim")
      .orderBy($"query_id", $"rk")
  }

  private def annIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sim.ivfTopK(s, Tables.embeddings(s, dir), probes(s, dir), k = 5)
      .select($"query_id", $"neighbor_id", $"rk", $"cos_sim")
      .orderBy($"query_id", $"rk")
  }

  val defs: Map[String, QueryDef] = Map(
    "ann_bruteforce" -> QueryDef(annBruteforce, Some(annBruteforceSql), bench = true),
    "ann_lsh" -> QueryDef(annLsh, None),
    "ann_ivf" -> QueryDef(annIvf, None)
  )
}
