package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join via time bucketing (SURVEY.md §5).
  *
  * `points ⋈ intervals ON key AND ts ∈ [start, end]` — Spark would plan
  * the naive form as a per-key cartesian with a post-filter. Bucketing
  * makes it an equi-join: each point maps to ONE time bucket, each
  * interval explodes to the buckets it covers (bounded by
  * interval-length / bucketSec), the join key becomes (key, bucket),
  * and the exact BETWEEN filter runs after. Work scales with
  * overlapping pairs, never |points|×|intervals-per-key|.
  */
object RangeJoin {

  def intervalJoin(points: DataFrame, intervals: DataFrame, key: String,
                   ts: String, start: String, end: String,
                   bucketSec: Long = 86400L): DataFrame = {
    val b = lit(bucketSec * 1000000L) // micros
    val p = points.withColumn("_bucket", (unix_micros(col(ts).cast("timestamp")) / b).cast("long"))
    val iv = intervals
      .withColumn("_bucket", explode(sequence(
        (unix_micros(col(start).cast("timestamp")) / b).cast("long"),
        (unix_micros(col(end).cast("timestamp")) / b).cast("long"))))
    p.join(iv, Seq(key, "_bucket"))
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop("_bucket")
  }
}
