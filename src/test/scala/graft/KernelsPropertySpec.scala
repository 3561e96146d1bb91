package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Kernels

/** Seeded randomized property checks for the hash/sketch kernels. */
class KernelsPropertySpec extends AnyFunSuite {

  val rnd = new scala.util.Random(42)
  val vocab = (0 until 50).map(i => s"w$i")
  def doc(n: Int): String = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  def u8(s: String) = UTF8String.fromString(s)

  def exactJaccard(a: String, b: String, w: Int = 3): Double = {
    def sh(s: String) = s.split(" ").sliding(w).map(_.mkString(" ")).toSet
    val (x, y) = (sh(a), sh(b))
    x.intersect(y).size.toDouble / x.union(y).size
  }

  def estJaccard(a: String, b: String): Double = {
    val (sa, sb) = (Kernels.minhashSig(u8(a), 128, 3), Kernels.minhashSig(u8(b), 128, 3))
    sa.zip(sb).count { case (x, y) => x == y } / 128.0
  }

  test("langTrigramHits == reference per-char extraction on adversarial inputs") {
    // reference: ASCII case-fold per CODEPOINT, then count char-window
    // trigram matches — the semantics the DuckDB oracle replays
    def ref(s: String): Seq[Long] = {
      val folded = s.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      val grams =
        if (folded.length < 3) Seq.empty
        else (0 to folded.length - 3).map(i => folded.substring(i, i + 3))
      Kernels.LangTrigramProfiles.map { case (_, prof) =>
        grams.count(prof.contains).toLong
      }
    }
    def kernel(s: String): Seq[Long] = {
      val a = Kernels.langTrigramHits(u8(s))
      (0 until a.numElements()).map(a.getLong)
    }
    val adversarial = Seq(
      "", "xy", "THE THE the", "singing In The Rain",
      "Überraschung IST GROSS und SCHÖN", // non-ASCII + caps (Turkish-İ class)
      "İstanbul the city", // U+0130: length-changing under full lowercase
      "日本語のテキスト the quick brown fox", // CJK + ASCII mix
      "aİtheıund", // dotted/dotless I adjacent to profile grams
      "KKelvin the sign") // U+212A lowers to ASCII 'k' under FULL fold — ours must not
    adversarial.foreach { s =>
      assert(kernel(s) == ref(s), s"mismatch on '$s': ${kernel(s)} vs ${ref(s)}")
    }
    // randomized: mixed-case vocab + occasional multi-byte injections
    val mixVocab = vocab ++ Seq("The", "AND", "Ingenious", "schön", "ÜBER", "que", "LES")
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(30))(mixVocab(rnd.nextInt(mixVocab.size))).mkString(" ")
      assert(kernel(s) == ref(s), s"mismatch on '$s'")
    }
  }

  test("sortedIntersectCount == set intersection size on sorted distinct arrays") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    (1 to 200).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(60))(rnd.nextLong() % 1000).distinct.sorted
      val b = Seq.fill(rnd.nextInt(60))(rnd.nextLong() % 1000).distinct.sorted
      val got = Kernels.sortedIntersectCount(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray))
      assert(got == a.toSet.intersect(b.toSet).size, s"a=$a b=$b")
    }
    // empty edges
    assert(Kernels.sortedIntersectCount(
      ArrayData.toArrayData(Array.empty[Long]),
      ArrayData.toArrayData(Array(1L, 2L))) == 0)
  }

  test("boundedLevenshtein == exact levenshtein when within bound, sentinel above") {
    def mutate(s: String, edits: Int): String = {
      var cs = s.toVector
      (1 to edits).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 if cs.nonEmpty => cs = cs.updated(rnd.nextInt(cs.size), ('a' + rnd.nextInt(26)).toChar)
          case 1 if cs.nonEmpty => cs = cs.patch(rnd.nextInt(cs.size), Nil, 1)
          case _ => cs = cs.patch(rnd.nextInt(cs.size + 1), Seq(('a' + rnd.nextInt(26)).toChar), 0)
        }
      }
      cs.mkString
    }
    (1 to 200).foreach { _ =>
      val a = doc(3 + rnd.nextInt(15))
      val b = if (rnd.nextBoolean()) mutate(a, rnd.nextInt(12)) else doc(3 + rnd.nextInt(15))
      val k = rnd.nextInt(25)
      val exact = u8(a).levenshteinDistance(u8(b))
      val got = Kernels.boundedLevenshtein(u8(a), u8(b), k)
      if (exact <= k) assert(got == exact, s"a=$a b=$b k=$k exact=$exact got=$got")
      else assert(got == k + 1, s"a=$a b=$b k=$k exact=$exact got=$got")
    }
    // edges: empty strings, identical, k=0
    assert(Kernels.boundedLevenshtein(u8(""), u8(""), 0) == 0)
    assert(Kernels.boundedLevenshtein(u8("abc"), u8("abc"), 0) == 0)
    assert(Kernels.boundedLevenshtein(u8("abc"), u8("abd"), 0) == 1)
    assert(Kernels.boundedLevenshtein(u8(""), u8("abc"), 2) == 3)
    assert(Kernels.boundedLevenshtein(u8(""), u8("ab"), 2) == 2)
  }

  test("minhash estimate tracks exact jaccard within 3 sigma over 50 random pairs") {
    var maxErr = 0.0
    for (_ <- 1 to 50) {
      val a = doc(40 + rnd.nextInt(40))
      // mutate a little → related doc; or fresh doc → unrelated
      val b = if (rnd.nextBoolean()) {
        val toks = a.split(" ")
        toks.updated(rnd.nextInt(toks.length), vocab(rnd.nextInt(vocab.size))).mkString(" ")
      } else doc(40 + rnd.nextInt(40))
      val err = math.abs(estJaccard(a, b) - exactJaccard(a, b))
      maxErr = math.max(maxErr, err)
    }
    // stddev of the estimator ≈ sqrt(j(1-j)/128) ≤ 0.045; 3σ ≈ 0.14
    assert(maxErr < 0.14, s"max |est-exact| = $maxErr")
  }

  test("simhash hamming distance orders by similarity on average") {
    var nearSum = 0; var farSum = 0
    for (_ <- 1 to 30) {
      val a = doc(60)
      val toks = a.split(" ")
      val near = toks.updated(rnd.nextInt(toks.length), vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val far = doc(60)
      nearSum += java.lang.Long.bitCount(Kernels.simhash64(u8(a)) ^ Kernels.simhash64(u8(near)))
      farSum += java.lang.Long.bitCount(Kernels.simhash64(u8(a)) ^ Kernels.simhash64(u8(far)))
    }
    assert(nearSum < farSum, s"near=$nearSum far=$farSum")
  }

  test("kernels are pure: same input, same output, across many inputs") {
    for (_ <- 1 to 20) {
      val s = doc(30)
      assert(Kernels.simhash64(u8(s)) == Kernels.simhash64(u8(s)))
      assert(Kernels.rollingHash(u8(s)) == Kernels.rollingHash(u8(s)))
      assert(Kernels.minhashSig(u8(s), 128, 3).toSeq == Kernels.minhashSig(u8(s), 128, 3).toSeq)
    }
  }

  test("md5 minhash estimate tracks exact jaccard over 30 random pairs") {
    def estMd5(a: String, b: String): Double = {
      val sa = Kernels.minhashSigMd5(u8(a), 32).toLongArray()
      val sb = Kernels.minhashSigMd5(u8(b), 32).toLongArray()
      sa.zip(sb).count { case (x, y) => x == y } / 32.0
    }
    for (_ <- 1 to 30) {
      val a = doc(40 + rnd.nextInt(40))
      val toks = a.split(" ").toBuffer
      toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
      val b = toks.mkString(" ")
      val exact = exactJaccard(a, b)
      val est = estMd5(a, b)
      // 32 perms -> sigma = sqrt(j(1-j)/32) <= 0.09; allow 4 sigma
      assert(math.abs(est - exact) <= 0.36, s"est=$est exact=$exact")
    }
  }

  test("md5 minhash/simhash values stay in their declared ranges") {
    for (_ <- 1 to 20) {
      val d = doc(5 + rnd.nextInt(100))
      val sig = Kernels.minhashSigMd5(u8(d), 32).toLongArray()
      assert(sig.length == 32)
      assert(sig.forall(v => v >= 0 && v < 2147483647L), sig.mkString(","))
      val sh = Kernels.simhashMd5(u8(d))
      assert((sh >>> 60) == 0L)
      assert(Kernels.md5Hash60(d) >= 0 && (Kernels.md5Hash60(d) >>> 60) == 0L)
    }
  }

  test("minhash handles degenerate docs") {
    assert(Kernels.minhashSig(u8(""), 128, 3).forall(_ == 0L))
    assert(Kernels.minhashSig(u8("one two"), 128, 3).forall(_ == 0L)) // < shingle width
    assert(Kernels.shingleHashes(u8("a b c"), 3).length == 1)
  }

  test("textScan matches the definitional regex/split formulas on random unicode text") {
    val stop = Set("the", "a", "and", "of", "to")
    val pieces = Seq("the", "a", "and", "of", "to", "word", "W9x", "42", "7",
      "café", "über", "naïve", "世界", "x!y", "a.b,c", "", "--", "(k)")
    (1 to 300).foreach { _ =>
      // random spacing, incl. leading/trailing/double spaces via empty pieces
      val s = Seq.fill(rnd.nextInt(12))(pieces(rnd.nextInt(pieces.size))).mkString(" ")
      val row = Kernels.textScan(u8(s))
      val chars = s.codePointCount(0, s.length).toLong
      val toks = s.split(" ", -1)
      assert(row.getLong(0) == chars, s"chars of '$s'")
      assert(row.getLong(1) == toks.length, s"tokens of '$s'")
      val punct = java.util.regex.Pattern.compile("[^A-Za-z0-9 ]")
        .matcher(s).results().count()
      assert(row.getLong(2) == punct, s"punct of '$s'")
      assert(row.getLong(3) == toks.count(stop), s"stop hits of '$s'")
      assert(row.getLong(4) == chars - s.count(_ == ' '), s"word chars of '$s'")
      val bpe = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")
        .matcher(s).results().count()
      assert(row.getLong(5) == bpe, s"bpe tokens of '$s'")
    }
    // the empty document: one empty token, zero everything else
    val e = Kernels.textScan(u8(""))
    assert(e.getLong(0) == 0 && e.getLong(1) == 1 && e.getLong(2) == 0 &&
      e.getLong(3) == 0 && e.getLong(4) == 0 && e.getLong(5) == 0)
  }

  test("dsirBuckets matches the definitional split + md5Hash60 histogram") {
    def reference(s: String, n: Int): Map[Long, Long] =
      s.split(" ", -1).filter(_.nonEmpty)
        .groupBy(t => Kernels.md5Hash60(t) % n).map { case (b, ts) => b -> ts.length.toLong }
    (1 to 100).foreach { _ =>
      val s = doc(rnd.nextInt(60))
      val n = Seq(16, 256, 1024)(rnd.nextInt(3))
      val arr = Kernels.dsirBuckets(u8(s), n)
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2); r.getLong(0) -> r.getLong(1)
      }.toMap
      assert(got == reference(s, n), s"histogram of '$s' at $n buckets")
      // sparse contract: occupied buckets only, ascending, in range
      val bs = (0 until arr.numElements()).map(i => arr.getStruct(i, 2).getLong(0))
      assert(bs == bs.sorted && bs.forall(b => b >= 0 && b < n))
      assert((0 until arr.numElements()).forall(i => arr.getStruct(i, 2).getLong(1) > 0))
    }
    // degenerate inputs: empty text and multi-space runs
    assert(Kernels.dsirBuckets(u8(""), 64).numElements() == 0)
    assert(Kernels.dsirBuckets(u8("   "), 64).numElements() == 0)
    val one = Kernels.dsirBuckets(u8("  x  x "), 64)
    assert(one.numElements() == 1 && one.getStruct(0, 2).getLong(1) == 2)
  }

  test("KmvSketch: any reduce/merge partitioning yields the k smallest distinct hashes") {
    val k = 16
    (1 to 100).foreach { _ =>
      val agg = new graft.functions.KmvSketch(k)
      // duplicates on purpose: sketch must dedup within AND across partitions
      val vals = Seq.fill(rnd.nextInt(200))(math.abs(rnd.nextLong() % 50) * 7 + 1)
      val nParts = 1 + rnd.nextInt(5)
      val parts = vals.grouped(math.max(1, (vals.size + nParts - 1) / nParts)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val expect = vals.distinct.sorted.take(k)
      assert(merged.toSeq == expect, s"vals=$vals parts=$nParts")
    }
    // merge with empty on either side
    val agg = new graft.functions.KmvSketch(k)
    val s1 = Seq(5L, 3L, 9L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(s1, agg.zero).toSeq == Seq(3L, 5L, 9L))
    assert(agg.merge(agg.zero, s1).toSeq == Seq(3L, 5L, 9L))
  }
}
