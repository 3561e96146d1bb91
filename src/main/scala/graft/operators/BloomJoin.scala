package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions.{col, xxhash64}
import org.apache.spark.sql.graft.Bridge

/** Bloom-filter pre-join pruning (SURVEY.md §5): before shuffling the
  * big side of a selective join, drop the rows whose key cannot match
  * — a compact bloom filter of the small side's keys is broadcast
  * inside a native `BloomFilterMightContain` predicate (the same
  * machinery Spark's runtime row-level filtering uses, but applicable
  * when the optimizer can't infer it — e.g. keys from a computed
  * frame). At 100 TB this turns a full-fact-table shuffle into a
  * near-output-sized one for selective dims: the filter is pushed to
  * the scan side of the exchange.
  *
  * Building the filter is one aggregation over the SMALL side only
  * (bounded: `expectedKeys` × ~10 bits).
  */
object BloomJoin {

  def prunedJoin(big: DataFrame, small: DataFrame, key: String,
                 expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    // Probe and build on xxhash64(key), not the raw column: the native
    // predicate only accepts longs, and hashing first makes the filter
    // type-agnostic (strings, decimals, structs) with identical
    // semantics on both sides.
    val hashed = small.na.drop(Seq(key)).select(xxhash64(col(key)).as("_h"))
    val bf = hashed.stat.bloomFilter("_h", expectedKeys, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray),
      Bridge.expression(xxhash64(col(key)))))
    big.filter(mightContain).join(small, key)
  }
}
