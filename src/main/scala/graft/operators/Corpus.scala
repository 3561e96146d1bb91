package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines
  * (SURVEY.md §2-E/F): deterministic splits and sequence packing.
  */
object Corpus {

  /** Deterministic train/val/test assignment: the split is a pure
    * function of the key (hash-bucketed), so it is stable across runs,
    * clusters, and re-shards — the property random() splits lack.
    * `weights` are percentages summing to ≤ 100; remainder → last
    * split.
    */
  def assignSplits(df: DataFrame, keyCol: String,
                   splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum <= 100, "split percentages must sum to <= 100")
    val bucket = pmod(xxhash64(col(keyCol)), lit(100L))
    val (expr0, _) = splits.foldLeft((lit(splits.last._1): org.apache.spark.sql.Column, 0)) {
      case ((acc, lo), (name, pct)) =>
        (when(bucket >= lo && bucket < lo + pct, name).otherwise(acc), lo + pct)
    }
    df.withColumn("split", expr0)
  }

  case class Packed(doc_id: Long, n_tokens: Long, shard: Int, bin: Long)

  /** Greedy sequence packing: within each shard (partition), documents
    * are packed next-fit (current bin or a new one — no lookback) into
    * bins of ≤ maxTokens — the standard cheap variant of the "pack
    * short documents into one context window" step. Packing is
    * per-shard (embarrassingly parallel); repartition first to control
    * shard count. Documents longer than maxTokens get a bin of their
    * own. Deterministic given a deterministic partitioning + order.
    */
  def packGreedy(spark: SparkSession, docs: DataFrame, maxTokens: Long,
                 shards: Int = 0): Dataset[Packed] = {
    import spark.implicits._
    val n = if (shards > 0) shards else docs.rdd.getNumPartitions
    docs
      .select(col("doc_id").cast("long"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(n, col("doc_id")) // deterministic shards
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val shard = org.apache.spark.TaskContext.getPartitionId()
        var bin = 0L
        var used = 0L
        var first = true
        it.map { case (id, toks) =>
          if (!first && used + toks > maxTokens) { bin += 1; used = 0L }
          first = false
          used += toks
          Packed(id, toks, shard, bin)
        }
      }
  }
}
