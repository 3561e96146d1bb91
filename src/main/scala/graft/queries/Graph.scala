package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** PageRank — the canonical iterative-MapReduce example (Page et al.
  * 1999; the Hadoop/Spark tutorial workload), run over a graph derived
  * from the warehouse: nation→nation trade edges (customer nation →
  * supplier nation per purchased line).
  *
  * Determinism across engines: ranks are integer nano-units (1e9 = 1.0)
  * and every step is integer arithmetic — init 1e9/N, contribution
  * rank/outdeg (integer div), damping (85·s)/100 (integer div), teleport
  * 0.15e9/N — so ten iterations produce bit-identical longs on any
  * engine, with no float-summation order sensitivity. The oracle unrolls
  * the same ten iterations as chained CTEs.
  *
  * Scale: each iteration is one shuffle (contributions re-keyed by dst
  * — the MapReduce formulation); edges are localCheckpoint'd so the
  * 4-table derivation runs once, and per-iteration lineage is truncated
  * (same pattern as Dedup.clusters).
  */
object Graph {

  private val Iters = 10

  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey")
    val o = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
    val c = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
    val edges = l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" =!= $"s_nationkey")
      .select($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
      .distinct()
      .localCheckpoint() // ≤ N² rows; truncates the 4-table lineage
    val nodes = Tables.nation(s, dir).select($"n_nationkey".as("id"))
    val n = nodes.count() // bounded scalar (dimension cardinality), not data-sized
    val init = 1000000000L / n
    val teleport = 150000000L / n
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    var ranks = nodes.select($"id", lit(init).as("rank_n"))
    for (_ <- 1 to Iters) {
      val contribs = edges
        .join(outdeg, "src")
        .join(ranks.select($"id".as("src"), $"rank_n"), "src")
        .select($"dst", expr("rank_n div deg").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("s"))
      ranks = nodes.join(contribs, $"id" === $"dst", "left")
        .select($"id",
          (lit(teleport) + expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")).as("rank_n"))
        .localCheckpoint()
    }
    ranks.join(broadcast(Tables.nation(s, dir)), $"id" === $"n_nationkey")
      .select($"n_name".as("nation"),
        ($"rank_n".cast("double") / 1000000000.0).as("pr_score"))
      .orderBy($"pr_score".desc, $"nation")
  }

  private val pagerankSql: String = {
    // MATERIALIZED: edges/outdeg are referenced by all 10 iteration
    // CTEs — without the hint DuckDB may re-inline the 4-table join
    // per reference (OOM at sf0.1).
    val head =
      """WITH edges AS MATERIALIZED (
        |  SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE c_nationkey <> s_nationkey),
        |outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        |nodes AS (SELECT n_nationkey AS id FROM nation),
        |cnt AS (SELECT COUNT(*) AS n FROM nodes),
        |pr0 AS (SELECT id, 1000000000 // n AS rank_n FROM nodes CROSS JOIN cnt)""".stripMargin
    val iters = (1 to Iters).map { i =>
      s"""pr$i AS (
         |  SELECT nd.id AS id, (150000000 // cnt.n) + (85 * COALESCE(c.s, 0)) // 100 AS rank_n
         |  FROM nodes nd CROSS JOIN cnt
         |  LEFT JOIN (
         |    SELECT e.dst AS did, SUM(p.rank_n // o.deg) AS s
         |    FROM edges e JOIN outdeg o ON e.src = o.src JOIN pr${i - 1} p ON p.id = e.src
         |    GROUP BY e.dst) c ON nd.id = c.did)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$iters
       |SELECT n_name AS nation, CAST(rank_n AS DOUBLE)/1000000000.0 AS pr_score
       |FROM pr$Iters JOIN nation ON id = n_nationkey
       |ORDER BY pr_score DESC, nation""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "pagerank" -> QueryDef(pagerank, Some(pagerankSql))
  )
}
