package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Head-to-head for the r10 k-means representation rework (r11 VERDICT
  * #3 asks for the measured number): the verified integer k-means
  * (KmK=8, KmIters=2 — the emb_kmeans/emb_nmi/ann_ivf_trained shared
  * fit) in both representations:
  *
  *  - EXPLODED (pre-r11): vectors live as (vec_id, pos, q) component
  *    rows; each Lloyd assignment joins them to (cell, pos, cv) on pos
  *    — n·dim·k rows through the distance aggregate per pass, and
  *    every pass re-reads the n·dim component stream.
  *  - ARRAY (shipped): vectors stay float arrays; quantization is
  *    inline and the distance is one codegen'd zip_with/aggregate per
  *    (vector, cell) — n·k rows per pass, n array rows re-read.
  *
  * Both produce the identical (vec_id, cell, dist) assignment (same
  * int64 squares in a reorderable sum) — asserted here — so the probe
  * isolates the representation cost. Reports wall seconds, input
  * bytes, and shuffle bytes per form (one warm-up + one measured run).
  *
  * Usage: KmeansRepProbe <sfDir>
  */
object KmeansRepProbe {

  private val KmK = 8
  private val KmIters = 2
  private val Quant = "cast(round(cast(%s as double) * 1000000.0D) as long)"

  private final class M extends SparkListener {
    var in, sr, sw = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      synchronized {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          in += m.inputMetrics.bytesRead
          sr += m.shuffleReadMetrics.totalBytesRead
          sw += m.shuffleWriteMetrics.bytesWritten
        }
      }
    def reset(): Unit = synchronized { in = 0; sr = 0; sw = 0 }
  }

  /** Shipped array form: crossJoin(broadcast(centroids)) + zip_with. */
  private def arrayForm(emb: DataFrame): DataFrame = {
    val q = Quant.format("x")
    def assign(c: DataFrame): DataFrame =
      emb.crossJoin(broadcast(c))
        .select(col("vec_id"), col("cell"),
          expr(s"aggregate(zip_with(embedding, cvv, (x, y) -> ($q - y) * ($q - y)), " +
            "0L, (acc, d) -> acc + d)").as("dist"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cell"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"), col("m.dist").as("dist"))
    var cent = emb.orderBy(col("vec_id")).limit(KmK)
      .select(row_number().over(Window.orderBy(col("vec_id"))).as("rn"), col("embedding"))
      .select((col("rn") - 1).cast("long").as("cell"),
        expr(s"transform(embedding, v -> ${Quant.format("v")})").as("cvv"))
    for (_ <- 1 to KmIters) {
      val a = assign(cent)
      cent = emb.join(a.select(col("vec_id"), col("cell")), "vec_id")
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(sum(expr(Quant.format("v"))).cast("double") / count(lit(1)))
          .cast("long").as("cv"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
        .select(col("cell"), expr("transform(ps, p -> p.cv)").as("cvv"))
        .localCheckpoint()
    }
    assign(cent)
  }

  /** Pre-r11 exploded form: (vec_id, pos, q) component rows joined to
    * (cell, pos, cv) on pos — the oracle's relational shape run as the
    * Spark plan. */
  private def explodedForm(emb: DataFrame): DataFrame = {
    val qq = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"),
        expr(Quant.format("v")).as("q"))
      .localCheckpoint()
    def assign(c: DataFrame): DataFrame =
      qq.join(broadcast(c), "pos")
        .groupBy(col("vec_id"), col("cell"))
        .agg(sum((col("q") - col("cv")) * (col("q") - col("cv"))).as("dist"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cell"))).as("m"))
        .select(col("vec_id"), col("m.cell").as("cell"), col("m.dist").as("dist"))
    var cent = emb.orderBy(col("vec_id")).limit(KmK)
      .select(row_number().over(Window.orderBy(col("vec_id"))).as("rn"), col("embedding"))
      .select((col("rn") - 1).cast("long").as("cell"), col("embedding"))
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cell"), col("pos"), expr(Quant.format("v")).as("cv"))
    for (_ <- 1 to KmIters) {
      val a = assign(cent)
      cent = qq.join(a.select(col("vec_id"), col("cell")), "vec_id")
        .groupBy(col("cell"), col("pos"))
        .agg(round(sum(col("q")).cast("double") / count(lit(1)))
          .cast("long").as("cv"))
        .localCheckpoint()
    }
    assign(cent)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    val m = new M
    spark.sparkContext.addSparkListener(m)
    def emb = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")

    // equivalence gate: identical assignment from both forms
    val a = arrayForm(emb).orderBy("vec_id").collect().map(_.toSeq)
    val e = explodedForm(emb).orderBy("vec_id").collect().map(_.toSeq)
    require(a.sameElements(e), "representations diverged — probe invalid")
    System.err.println(s"[kmrep] equivalence OK over ${a.length} vectors")

    for ((name, f) <- Seq(
        "array" -> (() => arrayForm(emb)),
        "exploded" -> (() => explodedForm(emb)))) {
      f().write.format("noop").mode("overwrite").save() // warm-up
      org.apache.spark.graft.ListenerBusWait.drain(spark.sparkContext)
      System.gc(); m.reset()
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusWait.drain(spark.sparkContext)
      println(f"""{"probe":"kmeans_rep","form":"$name","sf":"$dir",""" +
        f""""wall_sec":$dt%.2f,"input_bytes":${m.in},""" +
        f""""shuffle_read":${m.sr},"shuffle_write":${m.sw}}""")
    }
    spark.stop()
  }
}
