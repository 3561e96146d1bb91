package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
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
    val bf = small.na.drop(Seq(key)).stat.bloomFilter(key, expectedKeys, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray),
      Bridge.expression(col(key).cast("long"))))
    big.filter(mightContain).join(small, key)
  }
}
