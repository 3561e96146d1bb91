package graft.tools

import org.apache.spark.sql.functions._

/** Stage-cardinality probe for the prefix-filtered Jaccard join:
  * where do the rows (and the seconds) go at a given scale?
  * sbt "runMain graft.tools.JaccardProbe" with SPARK_GRAFT_SF_DIR.
  */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tau = args.headOption.map(_.toDouble).getOrElse(0.8)
    val spark = graft.GraftSession.local(32)
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val docs = graft.sources.Tables.documents(spark, dir)
    val w = 3
    val tok = docs.select($"doc_id", split($"text", " ").as("ws")).filter(size($"ws") >= w)
    val sh = tok.select($"doc_id", explode(
      expr(s"transform(sequence(0, size(ws) - $w), i -> xxhash64(concat_ws(' ', slice(ws, i + 1, $w))))")).as("s"))
      .distinct().localCheckpoint()
    println(s"PROBE shingle_rows ${t("shingles")(sh.count())}")
    println(s"PROBE distinct_shingles ${t("types")(sh.select($"s").distinct().count())}")

    val byRarity = t("byRarity") {
      val b = sh.join(sh.groupBy($"s").agg(count(lit(1)).as("df")), "s")
        .groupBy($"doc_id")
        .agg(array_sort(collect_list(struct($"df", $"s"))).as("oss"))
        .select($"doc_id", expr("transform(oss, x -> x.s)").as("hs"), size($"oss").as("n"))
        .localCheckpoint()
      b.count(); b
    }
    val pre = byRarity.select($"doc_id", $"n",
      posexplode(slice($"hs", lit(1), ($"n" - ceil($"n" * tau) + 1).cast("int"))))
      .withColumnRenamed("col", "s").withColumnRenamed("pos", "p")
      .localCheckpoint()
    println(s"PROBE prefix_rows ${t("prefix")(pre.count())}")
    val eps = 1e-9
    val overlapUb = least($"a.p", $"b.p") + lit(1) +
      least($"a.n" - $"a.p" - 1, $"b.n" - $"b.p" - 1)
    val rawCand = pre.as("a").join(pre.as("b"), $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id" &&
        $"b.n" >= $"a.n" * tau - eps && $"a.n" >= $"b.n" * tau - eps &&
        overlapUb.cast("double") * (1.0 + tau) >= ($"a.n" + $"b.n") * tau - eps)
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        $"a.p".as("pa"), $"b.p".as("pb"), $"a.n".as("na"), $"b.n".as("nb"))
    println(s"PROBE raw_candidates ${t("rawCand")(rawCand.count())}")
    // Aggregated positional bound over ALL of a pair's prefix
    // collisions: any common shingle beyond the counted c has global
    // order past the LAST collision, hence position > ma in A and
    // > mb in B — so overlap <= c + min(na-ma-1, nb-mb-1). Lossless.
    val agg = rawCand.groupBy($"doc_a", $"doc_b").agg(
        count(lit(1)).as("c"), max($"pa").as("ma"), max($"pb").as("mb"),
        first($"na").as("na"), first($"nb").as("nb"))
      .localCheckpoint()
    println(s"PROBE distinct_candidates ${t("agg")(agg.count())}")
    val passBound = agg.filter(($"c" + least($"na" - $"ma", $"nb" - $"mb") - 1)
      .cast("double") * (1.0 + tau) >= ($"na" + $"nb") * tau - eps)
    println(s"PROBE pass_agg_bound ${t("bound")(passBound.count())}")
    println(s"PROBE c_ge_2 ${agg.filter($"c" >= 2).count()}")
    val cand = agg.select($"doc_a", $"doc_b")
    val verified = cand
      .join(byRarity.select($"doc_id".as("doc_a"), $"hs".as("ha"), $"n".as("na")), "doc_a")
      .join(byRarity.select($"doc_id".as("doc_b"), $"hs".as("hb"), $"n".as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect($"ha", $"hb")))
      .withColumn("jaccard", round($"inter".cast("double") / ($"na" + $"nb" - $"inter"), 9))
      .filter($"jaccard" >= tau)
    println(s"PROBE verified_pairs ${t("verify")(verified.count())}")
    spark.stop()
  }
}
