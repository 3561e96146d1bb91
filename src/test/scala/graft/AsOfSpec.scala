package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def t(min: Long) = new Timestamp(min * 60000L)

  test("as-of join picks the latest right row at-or-before each left row") {
    import spark.implicits._
    val clicks = Seq(
      (1L, 100L, t(10)), // after views 1,2 → latest is id 2
      (1L, 101L, t(3)),  // after view 1 only
      (1L, 102L, t(1)),  // before any view → null
      (2L, 200L, t(50))  // user 2: view at same ts → eligible
    ).toDF("user_id", "click_id", "ts")
    val views = Seq(
      (1L, 1L, t(2)), (1L, 2L, t(5)),
      (2L, 10L, t(50)), (2L, 9L, t(50)) // tie on ts → larger id wins
    ).toDF("user_id", "event_id", "ts")
    val got = AsOf.join(clicks, views, "user_id", "ts", "ts", "event_id", "attributed_view")
      .collect().map(r => r.getAs[Long]("click_id") ->
        Option(r.getAs[java.lang.Long]("attributed_view")).map(_.toLong)).toMap
    assert(got == Map(100L -> Some(2L), 101L -> Some(1L), 102L -> None, 200L -> Some(10L)))
  }

  test("plan: one exchange, one sort") {
    import spark.implicits._
    val l = Seq((1L, 10L, t(1))).toDF("k", "lid", "ts")
    val r = Seq((1L, 20L, t(0))).toDF("k", "rid", "ts")
    val plan = AsOf.join(l, r, "k", "ts", "ts", "rid", "m")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
}
