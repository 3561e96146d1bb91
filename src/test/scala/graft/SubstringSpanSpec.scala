package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup => DedupOps}

/** Round-13 item (r12 VERDICT #3): duplicateSpans must deliver the
  * Lee-et-al substring-dedup contract — MAXIMAL repeated spans, not
  * window hits. Planted corpus: two docs share one 60-token passage at
  * different offsets, surrounded by unique noise; a third doc is all
  * noise. The ledger must contain exactly one span per sharing doc,
  * covering exactly the passage (maximality: never split into window
  * fragments, never extended into the unique surroundings). */
class SubstringSpanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val passage = (0 until 60).map(i => s"shared$i").mkString(" ")
  private def noise(tag: String, n: Int) =
    (0 until n).map(i => s"${tag}u$i").mkString(" ")

  test("planted shared passage: one maximal span per doc, exact boundaries") {
    // doc 1: 17 noise tokens + passage + 12 noise → span tokens 18..77
    // doc 2: 5 noise + passage + 30 noise        → span tokens 6..65
    // doc 3: pure noise
    val docs = Seq(
      (1L, s"${noise("a", 17)} $passage ${noise("b", 12)}"),
      (2L, s"${noise("c", 5)} $passage ${noise("d", 30)}"),
      (3L, noise("e", 80))
    ).toDF("doc_id", "text")
    val got = DedupOps.duplicateSpans(docs, n = 10, minTokens = 50)
      .orderBy($"doc_id")
      .select($"doc_id", $"span_start", $"span_end", $"span_tokens", $"n_windows")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // 60-token passage = 51 windows of 10; span = [start, start+59]
    assert(got == Seq((1L, 18L, 77L, 60L, 51L), (2L, 6L, 65L, 60L, 51L)))
  }

  test("a sub-threshold shared passage produces no ledger rows") {
    val short = (0 until 49).map(i => s"s$i").mkString(" ") // 49 < 50 tokens
    val docs = Seq(
      (1L, s"${noise("a", 10)} $short"),
      (2L, s"$short ${noise("b", 10)}")
    ).toDF("doc_id", "text")
    assert(DedupOps.duplicateSpans(docs, n = 10, minTokens = 50).count() == 0)
  }

  test("two separated shared passages stay two spans (no over-merge)") {
    val p2 = (0 until 50).map(i => s"two$i").mkString(" ")
    // gap of 11 unique tokens between passages > n=10 → must NOT merge
    val docs = Seq(
      (1L, s"$passage ${noise("a", 11)} $p2"),
      (2L, s"$p2 ${noise("b", 11)} $passage")
    ).toDF("doc_id", "text")
    val got = DedupOps.duplicateSpans(docs, n = 10, minTokens = 50)
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L))
  }

  test("whole-doc duplication chains to one full-length span") {
    val body = (0 until 70).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, body), (2L, body)).toDF("doc_id", "text")
    val got = DedupOps.duplicateSpans(docs, n = 10, minTokens = 50)
      .select($"doc_id", $"span_start", $"span_end").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 1L, 70L), (2L, 1L, 70L)))
  }

  test("CheckpointBlocks.unpersist actually frees localCheckpoint storage") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck = spark.range(1000).toDF("id").localCheckpoint()
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint registered no persistent RDD")
    // the r12-ADVICE no-op: Dataset.unpersist does NOT release these
    ck.unpersist(blocking = true)
    assert((sc.getPersistentRDDs.keySet & added) == added,
      "Dataset.unpersist unexpectedly released checkpoint blocks — helper obsolete")
    assert(org.apache.spark.sql.graft.CheckpointBlocks.unpersist(ck, blocking = true))
    assert((sc.getPersistentRDDs.keySet & added).isEmpty,
      "CheckpointBlocks.unpersist left checkpoint RDDs registered")
  }
}
