package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Click-through-rate: the reference's entire query surface, as one
  * declarative operator.
  *
  * Reference shape (ClickThru.java): job 1 unifies impressions+clicks
  * keyed by impressionId and reduces to (referrer, adId, clicked∈{0,1})
  * (ClickThru.java:86-151); job 2 re-keys by (referrer, adId) and emits
  * clicks/impressions (ClickThru.java:155-189).
  *
  * Spark-first: the two MapReduce jobs collapse into
  * join → groupBy → agg, which Catalyst plans as ONE shuffle on the
  * join key plus one partial-agg shuffle on the dims — with map-side
  * combine the reference's hand-built combiner-less reducers never get.
  * At 100 TB the click side is usually tiny relative to impressions;
  * the distinct-projected click keys broadcast when under the
  * autoBroadcast threshold, eliminating the join shuffle entirely.
  */
object ClickThru {

  /** @param impressions one row per impression; must contain `key` and `dims`
    * @param clicks      one row per click event; must contain `key`
    * @param key         join key (the reference's impressionId)
    * @param dims        grouping dimensions (the reference's referrer, adId)
    */
  def ctr(impressions: DataFrame, clicks: DataFrame, key: String, dims: Seq[String]): DataFrame = {
    // Reference reducer collapses multiple click records per impression
    // into one 0/1 flag (ClickThru.java:137-147) → distinct + left join.
    val clicked = clicks.select(col(key)).distinct().withColumn("clicked", lit(1))
    impressions
      .join(clicked, Seq(key), "left")
      .groupBy(dims.map(col): _*)
      .agg(
        count(lit(1)).as("impressions"),
        count(when(col("clicked") === 1, 1)).as("clicks"),
        (count(when(col("clicked") === 1, 1)).cast("double") / count(lit(1))).as("ctr"))
  }
}
