package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Definition-level checks for the third round-10 batch: shot
  * boundaries flag exactly the planted cut, and JSD drift is zero-ish
  * only for sources that match the corpus mix, positive and larger for
  * a divergent source. */
class Round10cEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mm_shot_boundaries: a single loud frame among quiet ones flags its two transitions") {
    // frames: 4 quiet ('|') + 1 loud (' ') + 1 quiet. Deltas (5 of
    // them): [0,0,0,588800,588800]; mean 235520 — the two transition
    // deltas are >=2x mean, the zero deltas are not.
    val text = "|" * 256 + " " * 64 + "|" * 64
    val dir = Files.createTempDirectory("shotspec").toString
    Seq((9L, text)).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("mm_shot_boundaries")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (9L, 4L, 588800L, 5L),
      (9L, 5L, 588800L, 5L)), got.toString)
  }

  test("text_jsd_drift: symmetric sources tie, a divergent-vocab source drifts more") {
    val dir = Files.createTempDirectory("jsdspec").toString
    Seq((1L, "x y x y", "a"), (2L, "x y x y", "b"), (3L, "z z z z", "c"))
      .toDF("doc_id", "text", "source").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_jsd_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(got.keySet == Set("a", "b", "c"), got.toString)
    assert(got("a") == got("b"), "identical sources must score identically")
    assert(got("c") > got("a"), "disjoint-vocab source must drift more")
    got.values.foreach { j =>
      assert(j >= -1e-9 && j <= math.log(2.0) + 1e-6, s"JSD out of range: $j")
    }
  }
}
