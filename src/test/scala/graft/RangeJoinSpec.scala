package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def t(min: Long) = new Timestamp(86400000L + min * 60000L)

  test("interval join matches across bucket boundaries, inclusive ends") {
    import spark.implicits._
    val points = Seq(
      (1L, t(0), 100L),     // == interval start (inclusive)
      (1L, t(30), 101L),    // inside
      (1L, t(60), 102L),    // == interval end (inclusive)
      (1L, t(61), 103L),    // outside
      (2L, t(30), 200L)     // right key range, wrong key
    ).toDF("k", "ts", "pid")
    val intervals = Seq((1L, t(0), t(60), 10L)).toDF("k", "start_ts", "end_ts", "iid")
    // tiny bucket (60s) so the interval spans many buckets
    val got = RangeJoin.intervalJoin(points, intervals, "k", "ts", "start_ts", "end_ts",
      bucketSec = 60L)
      .select($"pid").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(100L, 101L, 102L)), got.mkString(","))
  }

  test("no duplicate matches when an interval covers many buckets") {
    import spark.implicits._
    val points = Seq((1L, t(500), 1L)).toDF("k", "ts", "pid")
    val intervals = Seq((1L, t(0), t(1000), 10L)).toDF("k", "start_ts", "end_ts", "iid")
    assert(RangeJoin.intervalJoin(points, intervals, "k", "ts", "start_ts", "end_ts", 60L)
      .count() == 1)
  }
}
