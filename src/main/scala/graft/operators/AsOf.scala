package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (attribution) join — an operator Spark lacks natively.
  *
  * For every left row, attach the latest right row with
  * `rightTs <= leftTs` for the same key (ties broken by the largest
  * `rightId`). Composed Spark-first via the union trick: tag both
  * sides, sort by (key, ts, side, id) within one shuffle, and carry
  * the last-seen right values forward with last_value(ignoreNulls).
  * ONE shuffle + ONE sort for any number of left/right rows per key —
  * versus the naive correlated join's quadratic per-key blowup. The
  * same plan shape AQE-scales: partitioning is on the key only.
  */
object AsOf {

  /** @param left     probe side (all its columns are kept)
    * @param right    reference side — only `rightId` is attached; join
    *                 back on it for more right-side columns
    * @param key      equi-join key column name (both sides)
    * @param leftTs   left event-time column
    * @param rightTs  right event-time column
    * @param rightId  right tiebreak/id column (attached as `matchCol`)
    * @param matchCol output column name for the matched right id
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, rightId: String,
           matchCol: String): DataFrame = {
    val leftCols = left.columns
    val payload = leftCols.filterNot(_ == key)
    // unified layout: key, ts, side (0=right sorts first on ties), rid, left payload
    val rCols: Seq[Column] =
      Seq(col(key), col(rightTs).as("_ts"), lit(0).as("_side"), col(rightId).as("_rid")) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val lCols: Seq[Column] =
      Seq(col(key), col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(right.schema(rightId).dataType).as("_rid")) ++ payload.map(col)
    // equi-join semantics: a NULL key or NULL timestamp matches nothing
    // — drop such right rows (left null-key rows then correctly get a
    // null match; a null-ts right row must never win the window)
    val r = right.na.drop(Seq(key, rightTs)).select(rCols: _*)
    val l = left.select(lCols: _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn(matchCol, last(col("_rid"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((col(key) +: payload.map(col) :+ col(matchCol)).toIndexedSeq: _*)
  }
}
