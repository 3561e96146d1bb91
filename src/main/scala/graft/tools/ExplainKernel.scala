package graft.tools

import org.apache.spark.sql.functions._

/** Prints the PRE-checkpoint kernel plans for the keys whose final
  * plan is truncated by an eager localCheckpoint (dedup_minhash's
  * signature pipeline, text_classifier_train's matrix + one GD
  * iteration). The final-query plans land in plans/r17/<key>_after.txt;
  * these sub-plans are what executes before the checkpoint cut. */
object ExplainKernel {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.GraftSession.local(32)
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    println("========== dedup_minhash_kernel ==========")
    val sig = graft.sources.Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id",
        graft.functions.Fns.minhash_sig_md5($"text", 32).as("sig"))
      .select($"doc_id", posexplode($"sig").as(Seq("perm", "minhash")))
    println(sig.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    println("========== text_classifier_train_matrix ==========")
    val nBuckets = 256
    val bias = nBuckets.toLong
    val toks = split($"text", " ")
    val stop = size(org.apache.spark.sql.functions.filter(toks,
      t => t === "a" || t === "the")).cast("long")
    val docs = graft.sources.Tables.documents(s, dir)
      .select($"doc_id", $"text",
        when(stop * 1000L < size(toks).cast("long") * 61L, 1L)
          .otherwise(0L).as("label"))
    val counts = docs
      .select($"doc_id", explode(split($"text", " ")).as("f"))
      .select($"doc_id",
        (conv(substring(md5($"f"), 1, 15), 16, 10).cast("long") % nBuckets).as("k"))
      .groupBy($"doc_id", $"k").agg(count(lit(1)).as("c"))
    val lab = docs.select($"doc_id", $"label".cast("long").as("y"))
    val xAll = counts
      .unionAll(docs.select($"doc_id", lit(bias).as("k"), lit(0L).as("c")))
      .repartition($"doc_id")
      .withColumn("tot", sum($"c").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      .select($"doc_id", $"k",
        when($"k" === bias, lit(1000L))
          .otherwise(expr("(c * 1000) div tot")).as("c"))
      .join(lab, "doc_id")
    println(xAll.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    println("========== text_classifier_train_iteration ==========")
    val cached = xAll.persist()
    val w = Array.fill(nBuckets + 1)(1L)
    val arr = array(w.map(lit(_)).toIndexedSeq: _*)
    def wAt(k: org.apache.spark.sql.Column) =
      element_at(arr, (k + 1L).cast("int"))
    cached.count() // materialize so the iteration plan shows the cache
    val it = cached.filter($"doc_id" % 5 =!= 4)
      .select($"doc_id", $"y", (wAt($"k") * $"c").as("zz"), $"k", $"c")
      .withColumn("z", sum($"zz").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      .select($"k", (($"z" - $"y") * $"c").as("gc"))
      .groupBy($"k").agg(sum($"gc").as("g"))
    println(it.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    cached.unpersist()
    s.stop()
  }
}
