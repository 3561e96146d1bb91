package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §5). AQE's skew-join handles sort-merge
  * skew at runtime; explicit salting is for the cases AQE can't touch —
  * skewed aggregation keys, or forced-shuffle joins against a
  * replicable right side.
  */
object Skew {

  /** Equi-join where the left side has pathological key skew: left rows
    * get a deterministic salt in [0, salts), the right side is
    * replicated once per salt, and the join key becomes (key, salt) —
    * a hot key now spreads over `salts` reducers. Result is identical
    * to the plain join (verified in SkewSpec); cost is salts× the
    * right side, so use with a small/medium right table.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // Salt from a hash of (whole row, per-row id): the id term spreads hot
    // keys even when their rows are byte-identical (pure row-content
    // hashing would give all duplicates one salt and no skew relief). The
    // id depends on partition layout, but the join RESULT is salt-invariant
    // so the operator stays deterministic.
    val leftSalted = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col) :+
        monotonically_increasing_id(): _*)), lit(salts.toLong)))
    val rightReplicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    leftSalted.join(rightReplicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key. Spark's hash aggregate
    * already does map-side partial aggregation; this helps when the
    * partial itself is the bottleneck (e.g. huge per-key state like
    * collect_list). `partial` and `merge` must be associative.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                partial: Map[String, String], merge: Map[String, String]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col) :+
        monotonically_increasing_id(): _*)), lit(salts.toLong)))
    salted.groupBy(col(key), col("_salt")).agg(partial)
      .groupBy(col(key)).agg(merge)
  }
}
