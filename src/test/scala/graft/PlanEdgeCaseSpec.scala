package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{GroupTopK, Sessionize}

class PlanEdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("custom plans handle empty input") {
    import spark.implicits._
    val emptyOrders = Seq.empty[(Long, Long, Double)].toDF("g", "id", "v")
    assert(GroupTopK.topK(emptyOrders, Seq("g"),
      Seq(GroupTopK.Sort("v", desc = true)), 2).count() == 0)
    val emptyEvents = Seq.empty[(Long, Timestamp, Long)].toDF("user_id", "ts", "event_id")
    assert(Sessionize.withSessionIds(emptyEvents, "user_id", "ts", 30).count() == 0)
  }

  test("GroupTopK groups null keys together, like groupBy") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), 10L, 5.0), (Some(1L), 11L, 4.0),
      (None, 20L, 9.0), (None, 21L, 8.0), (None, 22L, 7.0)
    ).toDF("g", "id", "v")
    val got = GroupTopK.topK(df, Seq("g"),
      Seq(GroupTopK.Sort("v", desc = true), GroupTopK.Sort("id")), 2)
      .select($"id").as[Long].collect().sorted
    assert(got.sameElements(Array(10L, 11L, 20L, 21L)), got.mkString(","))
  }

  test("Sessionize single-event users and exact-gap boundaries") {
    import spark.implicits._
    def t(min: Long) = new Timestamp(min * 60000L)
    val df = Seq(
      (1L, t(0), 1L),
      (2L, t(0), 2L), (2L, t(30), 3L),  // exactly 30min → same session
      (3L, t(0), 4L), (3L, t(31), 5L)   // 31min → new session
    ).toDF("user_id", "ts", "event_id")
    val got = Sessionize.withSessionIds(df, "user_id", "ts", 30)
      .select($"event_id", $"session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
  }
}
