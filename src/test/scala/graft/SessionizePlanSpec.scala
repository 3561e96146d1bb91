package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Sessionize
import graft.sources.Tables

class SessionizePlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("custom plan matches the window-function formulation exactly") {
    val win = queries.Relational.defs("q_sessionize").fn(spark, TestSpark.sf)
    val custom = queries.Relational.defs("q_sessionize_plan").fn(spark, TestSpark.sf)
    assert(win.exceptAll(custom).count() == 0)
    assert(custom.exceptAll(win).count() == 0)
  }

  test("physical plan: one shuffle, one sort, SessionizeExec present") {
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sf).select($"user_id", $"ts", $"event_id")
    val df = Sessionize.withSessionIds(ev, "user_id", "ts", 30)
    val plan = df.queryExecution.executedPlan.toString
    // physical nodes render without the Exec suffix
    assert(plan.contains("Sessionize"), s"plan:\n$plan")
    assert("Exchange".r.findAllIn(plan).length == 1, s"expected 1 shuffle:\n$plan")
    assert(!plan.contains("Window"), "custom path must not use Window")
  }

  test("session ids split exactly on >30min gaps") {
    import spark.implicits._
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), 2L), // = gap → same session
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:01"), 3L), // > gap → new
      (2L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val got = Sessionize.withSessionIds(rows, "user_id", "ts", 30)
      .select($"event_id", $"session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("string keys are copied safely across buffer reuse") {
    import spark.implicits._
    val rows = (1 to 1000).map(i =>
      (s"user_${i % 7}", java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00"), i.toLong))
      .toDF("uid", "ts", "event_id")
    val n = Sessionize.withSessionIds(rows, "uid", "ts", 30)
      .select("uid", "session_id").distinct().count()
    assert(n > 0)
  }
}
