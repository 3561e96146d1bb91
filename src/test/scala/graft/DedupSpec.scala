package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  val base = "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door"
  val nearDup = base.replace("warm", "cold") // 1-word edit
  val other = "completely different content about spark catalyst optimizer rules and physical plan strategies here now"

  test("dedup_incremental plans a hash anti-join on the content hash, not a nested loop") {
    val qe = SparkEntry.all("dedup_incremental").fn(spark, TestSpark.sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti-join in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in plan:\n$plan")
  }

  test("dedup_minhash: range+sortWithinPartitions output IS the (doc_id, perm) total order, kernel evaluated once") {
    // r16 optimization: the global orderBy was replaced by
    // repartitionByRange(doc_id) + sortWithinPartitions(doc_id, perm) so
    // the signature kernel is no longer re-executed by the sort's range-
    // sampling pass (and no longer pushed into the scan stage as a
    // filter condition). The output contract — total (doc_id, perm)
    // order — must be preserved exactly.
    val df = SparkEntry.all("dedup_minhash").fn(spark, TestSpark.sf)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.sameElements(got.sortBy(identity)), "output not in (doc_id, perm) total order")
    assert(got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter (size(minhashsigmd5"),
      s"signature kernel pushed into a pre-shuffle filter:\n$plan")
  }

  test("dedup_streaming_replay emits exactly the batch-distinct hash set") {
    val got = SparkEntry.all("dedup_streaming_replay").fn(spark, TestSpark.sf)
      .collect().map(_.getString(0))
    val want = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .selectExpr("md5(text) AS th").distinct().orderBy("th")
      .collect().map(_.getString(0))
    assert(got.sameElements(want))
  }

  test("exactSurvivors keeps the lowest doc_id per duplicate group") {
    val d = docs(Seq((1L, base), (2L, base), (3L, other), (7L, base)))
    val got = Dedup.exactSurvivors(d).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 3L -> 1L))
  }

  test("minhashPairs finds planted near-duplicates, not unrelated docs") {
    val d = docs(Seq((1L, base), (2L, nearDup), (3L, other)))
    val pairs = Dedup.minhashPairs(d, threshold = 0.5).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(pairs(0).getAs[Double]("est_jaccard") > 0.5)
  }

  test("simhashPairs finds hamming-close docs only") {
    val d = docs(Seq((1L, base), (2L, nearDup), (3L, other)))
    val pairs = Dedup.simhashPairs(d, maxDist = 16).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("ngramJaccardPairs computes exact jaccard") {
    // a: shingles of "w1 w2 w3 w4" = {w1 w2 w3, w2 w3 w4}
    // b: "w1 w2 w3 w5" = {w1 w2 w3, w2 w3 w5} → inter=1, union=3 → 1/3
    val d = docs(Seq((1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w5")))
    val got = Dedup.ngramJaccardPairs(spark, d).collect()
    assert(got.length == 1)
    assert(math.abs(got(0).getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-9)
  }

  test("jaccardJoin: prefix filtering is lossless vs the all-pairs baseline") {
    // small-vocab random docs → dense shingle sharing, the adversarial
    // regime for prefix pruning (fat buckets, high overlap everywhere)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val rows = (0L until 40L).map { i =>
      i -> Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } ++ Seq(100L -> "x y z x y z x y", 101L -> "x y z x y z x y w") // planted near-dup
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val d = docs(rows)
      val got = Dedup.jaccardJoin(spark, d, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = Dedup.ngramJaccardPairs(spark, d)
        .filter(s"jaccard >= $tau")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"tau=$tau: prefix join diverged from exact baseline")
    }
  }

  test("jaccardJoin finds the planted near-dup and nothing else") {
    // one word changed in 20 → 3 of 21 union shingles differ → j = 15/21 ≈ 0.714
    val d = docs(Seq((1L, base), (2L, nearDup), (3L, other)))
    val got = Dedup.jaccardJoin(spark, d, tau = 0.7).collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L && got(0).getLong(1) == 2L)
    assert(got(0).getDouble(2) > 0.7)
  }

  test("clusters: chains merge into one component, min doc_id wins") {
    import spark.implicits._
    // chain 1-2, 2-3 plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters: 100-hop chain converges logarithmically, not O(diameter)") {
    import spark.implicits._
    // a single 101-node path: min-label propagation needs 100 rounds;
    // the star-contraction must close it well inside maxIters=20
    val pairs = (1L to 100L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.clustersWithRounds(spark, pairs, maxIters = 20)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 101 && got.values.forall(_ == 1L),
      s"all 101 chain nodes must label 1, got ${got.toSeq.sortBy(_._1).take(8)}...")
    assert(rounds < 20, s"star contraction took $rounds rounds — not logarithmic")
  }

  test("clusters: random graph matches a single-node union-find ground truth") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (1 to 400).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val pairs = edges.toDF("doc_a", "doc_b")
    val got = Dedup.clusters(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    assert(got == want, s"CC mismatch: ${(got.toSet -- want.toSet).take(5)}")
  }

  test("dedup_embedding plan: pair generation is an equi-join, no corpus-sized nested loop") {
    // VERDICT r5 #4: the registered embedding near-dup query must not
    // carry an O(n²) BroadcastNestedLoopJoin/CartesianProduct over the
    // corpus. The only nested-loop allowed is the bounded centroid
    // crossJoin (a k-row broadcast into the scan).
    val plan = SparkEntry.queries("dedup_embedding")(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "no cartesian product")
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 1, s"only the centroid cross-join may be nested-loop, found $bnlj")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "intra-cell pairs must come from an equi-join")
  }

  test("banded LSH (r=8) bounds bucket width on a skewed corpus where r=1 blows up") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 60 docs that all share one hot shingle ("aaa bbb ccc") but are
    // otherwise unique — the hot-minhash skew case from ADVICE r5: under
    // any permutation where the shared shingle is the min, an r=1
    // (perm, minhash) bucket holds MANY docs; an 8-row band key requires
    // agreement on 8 permutations at once, which unrelated docs don't have.
    val rows = (0L until 60L).map(i =>
      (i, s"aaa bbb ccc u${i}a u${i}b u${i}c u${i}d u${i}e"))
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val sig = rows.toDF("doc_id", "text")
      .select($"doc_id", graft.functions.Fns.minhash_sig_md5($"text", 32).as("sig"))
      .select($"doc_id", posexplode($"sig").as(Seq("perm", "minhash")))
    val r1MaxBucket = sig.groupBy($"perm", $"minhash").count()
      .agg(max($"count")).head.getLong(0)
    assert(r1MaxBucket >= 10L,
      s"skew corpus must produce a hot r=1 bucket, got max=$r1MaxBucket")

    val banded = SparkEntry.queries("dedup_minhash_banded")(spark, dir).collect()
    assert(banded.length == 4) // 4 bands of 8 perms
    val maxBucket = banded.map(_.getAs[Long]("max_bucket")).max
    assert(maxBucket <= 2L,
      s"r=8 band buckets must stay narrow on the skewed corpus, got $maxBucket")
    assert(banded.map(_.getAs[Long]("n_docs")).forall(_ == 60L))
  }

  test("banded LSH recall: byte-identical docs collide in every band") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-banddup").toString
    val text = "key agg row scan slow fast table value part hash merge batch"
    Seq((1L, text), (2L, text),
      (3L, "window spark order data column agg join small line customer query stream"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("dedup_minhash_banded")(spark, dir).collect()
    // docs 1,2 share every band key → 1 candidate pair per band
    assert(got.map(_.getAs[Long]("n_cand_pairs")).forall(_ == 1L))
    assert(got.map(_.getAs[Long]("max_bucket")).forall(_ == 2L))
  }

  test("dedup_minhash_recall: planted near-dups caught, low-sim pairs missed (the S-curve)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mh-recall").toString
    // 3 near-dup pairs (1-word edits, jaccard ~0.9) + a low-sim pair
    // sharing exactly one 3-shingle run
    val lowA = "alpha beta gamma " + (1 to 20).map(i => s"ax$i").mkString(" ")
    val lowB = "alpha beta gamma " + (1 to 20).map(i => s"bx$i").mkString(" ")
    Seq(
      (1L, base), (2L, nearDup),
      (3L, base.replace("quick", "swift")), (4L, base.replace("quick", "rapid")),
      (5L, lowA), (6L, lowB), (7L, other))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("dedup_minhash_recall")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // high-similarity deciles (>=0.8): every pair caught by r=8 banding
    val hi = got.filter(_._1 >= 8).values
    assert(hi.nonEmpty && hi.forall { case (n, c) => c == n }, s"high-sim missed: $got")
    // mid/low-sim pairs (cross-pairs of different edits, j<=0.75) exist
    // and sit below the banding S-curve knee: none caught
    val lo = got.filter(_._1 <= 7).values
    assert(lo.nonEmpty && lo.forall { case (_, c) => c == 0 }, s"low-sim caught: $got")
  }

  test("minhash est_jaccard approximates true jaccard") {
    val d = docs(Seq((1L, base), (2L, nearDup)))
    val est = Dedup.minhashPairs(d, threshold = 0.0).collect()(0).getAs[Double]("est_jaccard")
    val exact = Dedup.ngramJaccardPairs(spark, d).collect()(0).getAs[Double]("jaccard")
    assert(math.abs(est - exact) < 0.25, s"est=$est exact=$exact") // 128 perms → ~±0.09 stddev
  }
}
