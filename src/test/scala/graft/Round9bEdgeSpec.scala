package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Hand-traced semantics for the second round-9 batch: HITS converges
  * to the obvious hub/authority split on a 2-hubs→1-authority graph,
  * and sequential pair mining respects the strict-after / within-window
  * / same-ms-excluded boundaries. */
class Round9bEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graph_hits: two hubs pointing at one authority reach the exact fixpoint") {
    // trade edges 0→1 and 2→1: nation 1 is the sole authority
    // (auth_nano = 1e9), nations 0 and 2 are equal hubs (5e8 each).
    // Integer L1 trajectory: h0 = 333333333 each; a(1) = 1e9 from the
    // first rescale and the system is stationary from iteration 1.
    val dir = Files.createTempDirectory("r9bhits").toString
    Seq((0L, "ALGERIA"), (1L, "BRAZIL"), (2L, "CANADA"))
      .toDF("n_nationkey", "n_name").coalesce(1)
      .write.parquet(s"$dir/nation.parquet")
    Seq((1L, 0L), (2L, 2L)).toDF("c_custkey", "c_nationkey").coalesce(1)
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 1L)).toDF("s_suppkey", "s_nationkey").coalesce(1)
      .write.parquet(s"$dir/supplier.parquet")
    Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey").coalesce(1)
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (20L, 1L)).toDF("l_orderkey", "l_suppkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("graph_hits")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("ALGERIA", 500000000L, 0L),
      ("BRAZIL", 0L, 1000000000L),
      ("CANADA", 500000000L, 0L)), got.toString)
  }

  test("events_seq_pairs: strict-after, 1h-inclusive window, same-ms excluded") {
    // u1: a@0s, b@10s, c@2h  -> only (a,b); both *→c gaps exceed 1h
    // u2: b@0ms and a@0ms (same ms -> excluded), a@exactly+1h -> (a,a),(b,a)
    def ts(ms: Long) = new Timestamp(ms)
    val dir = Files.createTempDirectory("r9bseq").toString
    Seq(
      (1L, ts(0L), 1L, "a", 0.0, ""),
      (2L, ts(10000L), 1L, "b", 0.0, ""),
      (3L, ts(7200000L), 1L, "c", 0.0, ""),
      (4L, ts(0L), 2L, "b", 0.0, ""),
      (5L, ts(0L), 2L, "a", 0.0, ""),
      (6L, ts(3600000L), 2L, "a", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("events_seq_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("a", "a", 1L, 500000000L),
      ("a", "b", 1L, 500000000L),
      ("b", "a", 1L, 500000000L)), got.toString)
  }

  test("text_pmi_bigrams: lift is cxy*N/(cx*cy), support floor at 5, desc order") {
    // doc1 "x y"×5 interleaved -> (x,y)=5, (y,x)=4 (below support);
    // doc2 "z"×6 -> (z,z)=5. Unigrams x:5 y:5 z:6, N=16.
    // lift(x,y) = 5·16·1e9/25 = 3200000000; lift(z,z) = 80e9//36 = 2222222222.
    val dir = Files.createTempDirectory("r9bpmi").toString
    Seq((1L, "x y x y x y x y x y"), (2L, "z z z z z z"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_pmi_bigrams")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("x", "y", 5L, 3200000000L),
      ("z", "z", 5L, 2222222222L)), got.toString)
  }

  test("q_ktruss: pendant triangle peels away, K4 survives with support 2") {
    // order 10 -> K4 on {1,2,3,4}; order 20 -> triangle {4,5,6}.
    // Triangle edges have support 1 (< 2) and peel in round 1; every
    // K4 edge sits in exactly 2 triangles and is stable.
    val dir = Files.createTempDirectory("r9btruss").toString
    (Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L),
      (20L, 4L), (20L, 5L), (20L, 6L)))
      .toDF("l_orderkey", "l_partkey").coalesce(1)
      .write.parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_ktruss")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)), got.toString)
  }
}
