package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.operators.ClickThru
import graft.sources.JsonLogs

class CtrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val schema = StructType(Seq(
    StructField("impressionId", StringType),
    StructField("referrer", StringType),
    StructField("adId", StringType)))

  test("JsonLogs strips noise prefixes and drops poison lines") {
    import spark.implicits._
    val raw = Seq(
      """2014-04-01 garbage {"impressionId":"i1","referrer":"r1","adId":"a1"}""",
      """{"impressionId":"i2","referrer":"r2","adId":"a2"}""",
      "no json here",
      "{{{{broken",
      "").toDF("value")
    val got = JsonLogs.parse(raw, schema).collect()
    assert(got.length == 2)
    assert(got.map(_.getString(0)).sorted.sameElements(Array("i1", "i2")))
  }

  test("ClickThru.ctr matches the reference reducer semantics") {
    import spark.implicits._
    // i1: 3 duplicate clicks → still one clicked impression (ClickThru.java:137-147)
    val imps = Seq(("i1", "r1", "a1"), ("i2", "r1", "a1"), ("i3", "r2", "a9"))
      .toDF("impressionId", "referrer", "adId")
    val clks = Seq("i1", "i1", "i1", "i3", "iUNKNOWN").toDF("impressionId")
    val got = ClickThru.ctr(imps, clks, "impressionId", Seq("referrer", "adId"))
      .orderBy("referrer").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("impressions") == 2 && got(0).getAs[Long]("clicks") == 1)
    assert(math.abs(got(0).getAs[Double]("ctr") - 0.5) < 1e-12)
    assert(got(1).getAs[Double]("ctr") == 1.0)
  }

  test("ctr_referrer query is internally consistent") {
    import spark.implicits._
    val df = queries.Ctr.defs("ctr_referrer").fn(spark, TestSpark.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val imp = r.getAs[Long]("impressions")
      val clk = r.getAs[Long]("clicks")
      assert(clk <= imp)
      assert(math.abs(r.getAs[Double]("ctr") - clk.toDouble / imp) < 1e-12)
    }
    // total impressions = total events
    val total = rows.map(_.getAs[Long]("impressions")).sum
    assert(total == spark.read.parquet(s"${TestSpark.sf}/events.parquet").count())
  }
}
