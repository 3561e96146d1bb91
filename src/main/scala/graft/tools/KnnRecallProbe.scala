package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables
import graft.operators.{Similarity => Sim}

/** Recall/cost sweep for the self-kNN coarse quantizer (r11 VERDICT
  * #2 acceptance): for each configuration — first-k vs k-means-trained
  * centroids (by Lloyd iteration count) × nProbe — report recall@3 of
  * the IVF self-kNN against brute force on the first-10 node sample,
  * plus the intra-probe candidate-pair volume (the cost the cell
  * layout controls). Training replays the registered query's exact
  * integer-k-means-on-a-1-in-M-subsample recipe.
  *
  * Usage: KnnRecallProbe <sfDir> [<sfDir> ...]
  */
object KnnRecallProbe {

  private val Quant = "cast(round(cast(%s as double) * 1000000.0D) as long)"

  /** Spherical variant: Lloyd assignment by 9dp-rounded COSINE (the
    * same rule the final IVF assignment uses) instead of int-L2;
    * centroid update stays the exact integer mean. */
  private def sphericalCentroids(emb: DataFrame, cells: Int, n: Long,
                                 iters: Int): DataFrame = {
    val stride = math.max(1L, n / (32L * cells))
    val smp = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id"), col("embedding"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .localCheckpoint()
    var cent = smp.orderBy(col("vec_id")).limit(cells)
      .select(row_number().over(Window.orderBy(col("vec_id"))).as("rn"), col("embedding"))
      .select((col("rn") - 1).cast("long").as("cell"),
        expr(s"transform(embedding, v -> ${Quant.format("v")})").as("cvv"))
    for (_ <- 1 to iters) {
      val a = smp.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cell"),
          round(graft.functions.Fns.cosine_sim(col("embedding"),
            expr("transform(cvv, cv -> cast(cv / 1000000.0D as float))")), 9).as("cs"))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cs"), (-col("cell")).as("nc"))).as("m"))
        .select(col("vec_id"), (-col("m.nc")).as("cell"))
      cent = smp.join(a, "vec_id")
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(sum(expr(Quant.format("v"))).cast("double") / count(lit(1)))
          .cast("long").as("cv"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
        .select(col("cell"), expr("transform(ps, p -> p.cv)").as("cvv"))
        .localCheckpoint()
    }
    cent.select(col("cell"),
      expr("transform(cvv, cv -> cast(cv / 1000000.0D as float))").as("centroid"))
  }

  private def trainedCentroids(emb: DataFrame, cells: Int, n: Long,
                               iters: Int): DataFrame = {
    val stride = math.max(1L, n / (32L * cells))
    val smp = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id"), col("embedding"))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .localCheckpoint()
    var cent = smp.orderBy(col("vec_id")).limit(cells)
      .select(row_number().over(Window.orderBy(col("vec_id"))).as("rn"), col("embedding"))
      .select((col("rn") - 1).cast("long").as("cell"),
        expr(s"transform(embedding, v -> ${Quant.format("v")})").as("cvv"))
    val q = Quant.format("x")
    for (_ <- 1 to iters) {
      val a = smp.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("cell"),
          expr(s"aggregate(zip_with(embedding, cvv, (x, y) -> ($q - y) * ($q - y)), " +
            "0L, (acc, d) -> acc + d)").as("dist"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cell"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"))
      cent = smp.join(a, "vec_id")
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(sum(expr(Quant.format("v"))).cast("double") / count(lit(1)))
          .cast("long").as("cv"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
        .select(col("cell"), expr("transform(ps, p -> p.cv)").as("cvv"))
        .localCheckpoint()
    }
    cent.select(col("cell"),
      expr("transform(cvv, cv -> cast(cv / 1000000.0D as float))").as("centroid"))
  }

  private def run(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism).localCheckpoint()
    val n = emb.count()
    val probes = emb.filter($"vec_id" < 10)
    val bf = Sim.bruteForce(spark, emb, probes, k = 3)
      .select($"query_id".as("node_id"), $"neighbor_id").localCheckpoint()

    // (cellLaw, nProbe) operating points: the shipped √(2n)@2 and the
    // cost-balanced-for-3-probes √(3n)@3
    val points = Seq((2.0, 2), (3.0, 3))
    for ((law, nProbe) <- points; mode <- Seq("l2", "sph"); iters <- Seq(0, 1, 2)) {
      if (mode == "sph" && iters == 0) {} else {
      val cells = math.max(8L,
        math.min(65536L, math.ceil(math.sqrt(law * n)).toLong)).toInt
      val tc = if (iters == 0) None
        else if (mode == "sph")
          Some(sphericalCentroids(emb, cells, n, iters).localCheckpoint())
        else Some(trainedCentroids(emb, cells, n, iters).localCheckpoint())
      val knn = Sim.ivfTopK(spark, emb, emb, k = 3, nCells = cells,
          nProbe = nProbe, trainedCentroids = tc, broadcastProbes = false)
        .select($"query_id".as("kn"), $"neighbor_id".as("kb"))
        .localCheckpoint()
      val hits = bf.join(knn, $"node_id" === $"kn" && $"neighbor_id" === $"kb")
        .count()
      // cost proxy: Σ over (probe cell × corpus cell) matches — the
      // exact scored-pair row count the cell join emits
      val cents = Sim.ivfTopK(spark, emb, emb, k = 3, nCells = cells,
        nProbe = nProbe, trainedCentroids = tc, broadcastProbes = false)
      val _ = cents // plan not reused; pair volume from assignment census:
      val asgCount = {
        val c = tc.getOrElse(
          emb.orderBy($"vec_id").limit(cells)
            .select(row_number().over(Window.orderBy($"vec_id")).cast("long").as("cell"),
              $"embedding".as("centroid")))
        val centRows = c.select($"cell", $"centroid".as("ce"))
        val asg = {
          val rows = centRows.select(col("cell").cast("long"), col("ce")).collect()
          val ids = rows.map(_.getLong(0))
          val vs = rows.map(_.getSeq[Float](1).toArray.map(_.toDouble))
          emb.withColumn("cell",
            explode(graft.functions.Fns.top_cells(col("embedding"), ids, vs, 1)))
            .groupBy($"cell").agg(count(lit(1)).as("sz"))
        }
        val pcs = {
          val rows = centRows.select(col("cell").cast("long"), col("ce")).collect()
          val ids = rows.map(_.getLong(0))
          val vs = rows.map(_.getSeq[Float](1).toArray.map(_.toDouble))
          emb.withColumn("cell",
            explode(graft.functions.Fns.top_cells(col("embedding"), ids, vs, nProbe)))
            .groupBy($"cell").agg(count(lit(1)).as("np"))
        }
        asg.join(pcs, "cell")
          .agg(sum($"sz" * $"np")).head.getLong(0)
      }
      println(s"""{"probe":"knn_recall","sf":"$dir","n":$n,"cells":$cells,""" +
        s""""law":$law,"mode":"$mode","train_iters":$iters,"nprobe":$nProbe,""" +
        s""""hits":$hits,"scored_pairs":$asgCount}""")
    } }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    (if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")).foreach(run(spark, _))
    spark.stop()
  }
}
