package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2-D).
  *
  * Three tiers:
  *  - bruteForce: exact top-k (the correctness baseline; O(q·n) — fine
  *    for a probe set, never for all-pairs at scale);
  *  - lsh: random-hyperplane buckets — candidates only from the probe's
  *    bucket, embarrassingly parallel, O(n/2^planes) per probe;
  *  - ivf: inverted-file — coarse centroids partition the corpus into
  *    cells; probes search the nProbe nearest cells only. Cell
  *    assignment is a broadcast join (centroid table is tiny), so the
  *    corpus is scanned once, shuffled once on cell id.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each probe row. */
  def bruteForce(spark: SparkSession, emb: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val q = probes.select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val scored = broadcast(q)
      .join(emb, $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(Fns.cosine_sim($"qe", $"embedding"), 9).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
  }

  /** LSH-bucketed ANN: probes only compare within their bucket. */
  def lshTopK(spark: SparkSession, emb: DataFrame, probes: DataFrame,
              k: Int, numPlanes: Int = 8): DataFrame = {
    import spark.implicits._
    val bucketed = emb.select($"vec_id", $"embedding",
      Fns.lsh_bucket($"embedding", numPlanes).as("bucket"))
    val q = probes.select($"vec_id".as("query_id"), $"embedding".as("qe"),
      Fns.lsh_bucket($"embedding", numPlanes).as("bucket"))
    val scored = broadcast(q)
      .join(bucketed, Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(Fns.cosine_sim($"qe", $"embedding"), 9).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
  }

  /** IVF-style ANN. Deterministic coarse "centroids": the embeddings of
    * the first nCells vec_ids (k-means would need training state; a
    * fixed seed subset keeps the operator stateless and reproducible —
    * swap in trained centroids via the `centroids` frame at will).
    */
  def ivfTopK(spark: SparkSession, emb: DataFrame, probes: DataFrame,
              k: Int, nCells: Int = 8, nProbe: Int = 2): DataFrame = {
    import spark.implicits._
    val centroids = emb.filter($"vec_id" < nCells)
      .select($"vec_id".as("cell"), $"embedding".as("ce"))

    def nearestCells(df: DataFrame, idCol: String, vecCol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy($"cell_sim".desc, $"cell")
      df.crossJoin(broadcast(centroids))
        .withColumn("cell_sim", Fns.cosine_sim(col(vecCol), $"ce"))
        .withColumn("cell_rk", row_number().over(w))
        .filter($"cell_rk" <= keep)
        .drop("ce", "cell_sim", "cell_rk")
    }

    val assigned = nearestCells(emb, "vec_id", "embedding", 1) // corpus: 1 cell each
    val probeCells = nearestCells(
      probes.select($"vec_id".as("query_id"), $"embedding".as("qe")),
      "query_id", "qe", nProbe) // probes: nProbe cells

    val scored = probeCells
      .join(assigned, Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(Fns.cosine_sim($"qe", $"embedding"), 9).as("cos_sim"))
    val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
  }
}
