package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DataQuality
import graft.operators.DataQuality.Rule

class DataQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("audit counts row violations, nulls violate, uniqueness via distinct") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0), "a"),
      (2L, Some(-1.0), "b"),  // range violation
      (3L, None, "a"),        // null → violation of the range rule
      (3L, Some(2.0), "zz")   // dup id + domain violation
    ).toDF("id", "x", "cat")
    val got = DataQuality.audit(df, "t",
        Seq(
          Rule("x_nonneg", $"x" < 0),
          Rule("cat_domain", !$"cat".isin("a", "b"))),
        uniqueKeys = Seq("id_unique" -> $"id"))
      .collect().map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("violations"), r.getAs[Boolean]("pass")))).toMap
    assert(got == Map(
      "x_nonneg" -> ((2L, false)),   // -1 plus the null row
      "cat_domain" -> ((1L, false)),
      "id_unique" -> ((1L, false))))
    // every rule row carries the same scan-wide total
    val totals = DataQuality.audit(df, "t", Seq(Rule("x_nonneg", $"x" < 0)))
      .collect().map(_.getAs[Long]("total")).toSet
    assert(totals == Set(4L))
  }

  test("audit is one aggregate pass — a single scan of the input") {
    import spark.implicits._
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "x")
    val plan = DataQuality.audit(df, "t",
        Seq(Rule("a", $"x" < 0), Rule("b", $"x" > 1)),
        uniqueKeys = Seq("u" -> $"id"))
      .queryExecution.executedPlan.toString
    // one scan of the local relation, not one per rule
    assert("LocalTableScan".r.findAllIn(plan).length <= 1, plan)
  }

  test("orphans finds missing parents and keeps child count") {
    import spark.implicits._
    val child = Seq((1L, 10L), (2L, 11L), (3L, 99L)).toDF("id", "fk")
    val parent = Seq((10L, "x"), (11L, "y")).toDF("pk", "payload")
    val r = DataQuality.orphans("c->p", child, $"fk", parent, $"pk").collect()(0)
    assert(r.getAs[Long]("child_rows") == 3L)
    assert(r.getAs[Long]("orphans") == 1L)
    assert(!r.getAs[Boolean]("intact"))
  }
}
