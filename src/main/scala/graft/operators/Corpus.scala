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
                   splits: Seq[(String, Int)],
                   bucketFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                     k => pmod(xxhash64(k), lit(100L))): DataFrame = {
    require(splits.map(_._2).sum <= 100, "split percentages must sum to <= 100")
    val bucket = bucketFn(col(keyCol))
    val (expr0, _) = splits.foldLeft((lit(splits.last._1): org.apache.spark.sql.Column, 0)) {
      case ((acc, lo), (name, pct)) =>
        (when(bucket >= lo && bucket < lo + pct, name).otherwise(acc), lo + pct)
    }
    df.withColumn("split", expr0)
  }

  case class Packed(doc_id: Long, n_tokens: Long, shard: Int, bin: Long)

  /** Greedy sequence packing: within each shard, documents are packed
    * next-fit (current bin or a new one — no lookback) into bins of
    * ≤ maxTokens — the standard cheap variant of the "pack short
    * documents into one context window" step. The shard is a pure
    * function of the key (`doc_id % shards`), NOT the physical
    * partition id, so the result is identical regardless of cluster
    * layout (range-partitioner sampling would make shard boundaries
    * environment-dependent); when `shards` is not given, a fixed
    * default (64) is used rather than the physical partition count,
    * which would reintroduce layout dependence. Packing is per-shard
    * (embarrassingly parallel); a partition holding several shards
    * resets state at each shard boundary. Documents longer than
    * maxTokens get a bin of their own.
    */
  def packGreedy(spark: SparkSession, docs: DataFrame, maxTokens: Long,
                 shards: Int = 0): Dataset[Packed] = {
    import spark.implicits._
    val n = if (shards > 0) shards else 64
    docs
      .select(col("doc_id").cast("long"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        pmod(col("doc_id"), lit(n.toLong)).cast("int").as("shard"))
      .repartition(n, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        var curShard = Int.MinValue
        var bin = 0L
        var used = 0L
        it.map { case (id, toks, shard) =>
          if (shard != curShard) { curShard = shard; bin = 0L; used = toks }
          else if (used + toks > maxTokens) { bin += 1L; used = toks }
          else used += toks
          Packed(id, toks, shard, bin)
        }
      }
  }
}
