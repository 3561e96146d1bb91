package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Scale probe for the width-capped LSH pair generators (r11 VERDICT
  * #6): for each sf dir given, derive the two bucket tables the
  * registered queries build — the r=1 (perm, minhash) buckets of
  * dedup_minhash_pairs and the 4×8 (band, bkey) buckets of
  * dedup_source_matrix — and report, from the bucket CENSUS alone
  * (Σ over buckets; no pair join materialized):
  *   - uncapped pair volume        Σ c·(c−1)/2
  *   - capped+star edge volume     Σ_{c≤64} c·(c−1)/2 + Σ_{c>64} (c−1)
  *   - bucket count, max width, #wide buckets
  * The census IS the exact row count the candidate join would emit, so
  * the probe measures the generators' growth law without paying the
  * join it exists to audit.
  *
  * Usage: CapProbe <sfDir> [<sfDir> ...]
  */
object CapProbe {

  private def census(buckets: DataFrame, label: String, sf: String): Unit = {
    val r = buckets
      .agg(
        count(lit(1)).as("n_buckets"),
        max(col("c")).as("max_width"),
        sum(when(col("c") > 64, 1L).otherwise(0L)).as("n_wide"),
        sum(expr("(c * (c - 1)) div 2")).as("uncapped_pairs"),
        sum(when(col("c") <= 64, expr("(c * (c - 1)) div 2"))
          .otherwise(col("c") - 1)).as("capped_edges"))
      .head()
    println(s"""{"probe":"cap","sf":"$sf","index":"$label",""" +
      s""""n_buckets":${r.getLong(0)},"max_width":${r.getLong(1)},""" +
      s""""n_wide":${r.getLong(2)},"uncapped_pairs":${r.getLong(3)},""" +
      s""""capped_edges":${r.getLong(4)}}""")
  }

  private def run(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val sig = Tables.documents(spark, dir)
      .repartition($"doc_id")
      .select($"doc_id",
        graft.functions.Fns.minhash_sig_md5($"text", 32).as("sig"))
      .filter(size($"sig") > 0)
      .localCheckpoint() // feeds both index derivations
    val r1 = sig
      .select($"doc_id", posexplode($"sig").as(Seq("perm", "minhash")))
      .groupBy($"perm", $"minhash").agg(count(lit(1)).as("c"))
    census(r1, "minhash_r1", dir)
    val banded = sig
      .select($"doc_id", explode(sequence(lit(0), lit(3))).as("band"), $"sig")
      .select($"doc_id", $"band".cast("long").as("band"),
        conv(substring(md5(concat_ws(":",
          expr("transform(slice(sig, band * 8 + 1, 8), x -> cast(x as string))"))), 1, 15), 16, 10)
          .cast("long").as("bkey"))
      .groupBy($"band", $"bkey").agg(count(lit(1)).as("c"))
    census(banded, "banded_4x8", dir)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: CapProbe <sfDir> [<sfDir> ...]")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    args.foreach(run(spark, _))
    spark.stop()
  }
}
