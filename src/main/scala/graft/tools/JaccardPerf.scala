package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level breakdown of the prefix-filtered Jaccard join, kept in
  * sync with `operators.Dedup.jaccardJoin`'s current pipeline (in-row
  * shingle dedup → window-df rarity order → prefix explode → prefix
  * self-join with aggregated positional bound → broadcast two-pointer
  * verify). Where does the wall-clock go?
  * SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JaccardPerf"
  */
object JaccardPerf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, dir)
    docs.count() // warm FS + codegen

    val w = 3; val tau = 0.8
    Perf.time("whole_query") {
      Perf.noop(graft.operators.Dedup.jaccardJoin(spark, docs, tau)
        .orderBy($"jaccard".desc, $"doc_a", $"doc_b").limit(50))
    }
    Perf.time("whole_query_2") {
      Perf.noop(graft.operators.Dedup.jaccardJoin(spark, docs, tau)
        .orderBy($"jaccard".desc, $"doc_a", $"doc_b").limit(50))
    }

    // piecewise — the operator's own stages, in order
    val tok = docs.select($"doc_id", split($"text", " ").as("ws")).filter(size($"ws") >= w)
    val sh = tok.select($"doc_id", explode(expr(
      s"array_distinct(transform(sequence(0, size(ws) - $w), i -> xxhash64(concat_ws(' ', slice(ws, i + 1, $w)))))")).as("s"))
    Perf.time("shingles_inrow")(Perf.noop(sh))
    val byRarity = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"s")))
      .groupBy($"doc_id")
      .agg(array_sort(collect_list(struct($"df", $"s"))).as("oss"))
      .select($"doc_id", expr("transform(oss, x -> x.s)").as("hs"),
        expr("array_sort(transform(oss, x -> x.s))").as("hv"),
        size($"oss").as("n"))
    Perf.time("byRarity_build")(Perf.noop(byRarity))
    val br = byRarity.localCheckpoint()
    Perf.time("byRarity_checkpoint")(br.count())
    val pre = br.select($"doc_id", $"n",
      posexplode(slice($"hs", lit(1), ($"n" - ceil($"n" * tau) + 1).cast("int"))))
      .withColumnRenamed("col", "s").withColumnRenamed("pos", "p")
    var estRows = 0L
    Perf.time("estRows_agg") {
      estRows = pre.groupBy($"s").agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum($"cnt" * $"cnt"), lit(0L))).head.getLong(0)
      println(s"estRows=$estRows")
    }
    val eps = 1e-9
    val overlapUb = least($"a.p", $"b.p") + lit(1) +
      least($"a.n" - $"a.p" - 1, $"b.n" - $"b.p" - 1)
    val parts = math.max(spark.sessionState.conf.numShufflePartitions,
      math.min(4096L, estRows / 5000000L).toInt)
    def cand = pre.as("a")
      .join(pre.as("b"), $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id" &&
        $"b.n" >= $"a.n" * tau - eps && $"a.n" >= $"b.n" * tau - eps &&
        overlapUb.cast("double") * (1.0 + tau) >= ($"a.n" + $"b.n") * tau - eps)
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.p".as("pa"), $"b.p".as("pb"), $"a.n".as("na"), $"b.n".as("nb"))
      .repartition(parts, $"doc_a", $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("c"), max($"pa").as("ma"), max($"pb").as("mb"),
        max($"na").as("can"), max($"nb").as("cbn"))
      .filter(($"c" + least($"can" - $"ma", $"cbn" - $"mb") - 1).cast("double") *
        (1.0 + tau) >= ($"can" + $"cbn") * tau - eps)
      .select($"doc_a", $"doc_b")
    Perf.time("prefix_join_agg")(Perf.noop(cand))
    val aSide = br.select($"doc_id".as("doc_a"), $"hv".as("ha"), $"n".as("na"))
    val bSide = br.select($"doc_id".as("doc_b"), $"hv".as("hb"), $"n".as("nb"))
    Perf.time("verify_broadcast") {
      Perf.noop(cand.join(broadcast(aSide), "doc_a").join(broadcast(bSide), "doc_b")
        .withColumn("inter", graft.functions.Fns.sorted_intersect_count($"ha", $"hb"))
        .withColumn("jaccard",
          round($"inter".cast("double") / ($"na" + $"nb" - $"inter"), 9))
        .filter($"jaccard" >= tau)
        .select($"doc_a", $"doc_b", $"jaccard"))
    }
    spark.stop()
  }
}
