package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Flac

/** Round-15 (cont.): the from-scratch FLAC codec. FLAC is LOSSLESS,
  * so the contract is total: decode(encode(x)) == x for EVERY
  * 16-bit signal — constant, ramp, noise, mixed — across every
  * subframe type, stereo decorrelation mode, Rice parameter the
  * planner picks, block boundary, the LPC arm and wasted bits. */
class FlacCodecSpec extends AnyFunSuite {

  private def rt(chs: Array[Array[Int]], rate: Int = 44100,
                 blockSize: Int = 256, chMode: Int = -1,
                 lpc: Boolean = false, wasted: Int = 0): Array[Array[Int]] = {
    val b = Flac.encode(rate, chs, blockSize, chMode, lpc, wasted)
    val (gotRate, out) = Flac.decode(b).getOrElse(fail("decode returned None"))
    assert(gotRate == rate)
    out
  }

  private def det(seed: Int, n: Int): Array[Int] = {
    // deterministic pseudo-noise in 16-bit range (xorshift, no RNG dep)
    var x = seed | 1
    Array.fill(n) {
      x ^= x << 13; x ^= x >>> 17; x ^= x << 5
      (x % 30000)
    }
  }

  test("mono round-trip across subframe types: constant, ramp, noise, mixed") {
    val const = Array.fill(700)(-123)
    assert(rt(Array(const)).head.toSeq == const.toSeq)
    val ramp = Array.tabulate(700)(i => 3 * i - 1000) // fixed order 1/2 wins
    assert(rt(Array(ramp)).head.toSeq == ramp.toSeq)
    val noise = det(42, 700)
    assert(rt(Array(noise)).head.toSeq == noise.toSeq)
    val mixed = Array.tabulate(900)(i =>
      if (i < 256) 55 else if (i < 512) 20 * (i - 256) - 2000 else det(7, 900)(i))
    assert(rt(Array(mixed)).head.toSeq == mixed.toSeq)
  }

  test("block boundaries: non-multiple lengths, single-sample tail") {
    val s = det(9, 257) // 256-block + 1-sample tail
    assert(rt(Array(s)).head.toSeq == s.toSeq)
    val t = det(11, 1024 + 300)
    assert(rt(Array(t), blockSize = 1024).head.toSeq == t.toSeq)
  }

  test("stereo: independent and all three decorrelation modes are exact") {
    val l = det(3, 600)
    val r = Array.tabulate(600)(i => l(i) / 2 + 100) // correlated channels
    for (mode <- Seq(-1, 8, 9, 10)) {
      val out = rt(Array(l, r), chMode = mode)
      assert(out(0).toSeq == l.toSeq, s"left broken in mode $mode")
      assert(out(1).toSeq == r.toSeq, s"right broken in mode $mode")
    }
    // decorrelation must actually pay: mid/side smaller than independent
    val ind = Flac.encode(44100, Array(l, r), 256, -1)
    val ms = Flac.encode(44100, Array(l, r), 256, 10)
    assert(ms.length < ind.length,
      "mid/side should compress correlated stereo better")
  }

  test("compression is real: a ramp beats verbatim size by a wide margin") {
    val ramp = Array.tabulate(4096)(i => 2 * i)
    val b = Flac.encode(44100, Array(ramp), 1024)
    // raw PCM = 8192 bytes; fixed-order-2 residuals are all zero
    assert(b.length < 1000, s"ramp encoded to ${b.length} bytes")
    val noise = det(5, 4096)
    val nb = Flac.encode(44100, Array(noise), 1024)
    assert(nb.length < 4096 * 2 + 200, "noise must not blow past verbatim+headers")
  }

  test("LPC subframe arm round-trips bit-exactly") {
    val s = det(21, 800).zipWithIndex.map { case (v, i) => v / 4 + 10 * i }
    val out = rt(Array(s), lpc = true)
    assert(out.head.toSeq == s.toSeq)
    // and the stream genuinely contains an LPC subframe, not a fallback
    val plain = Flac.encode(44100, Array(s), 256)
    val lpcb = Flac.encode(44100, Array(s), 256, lpcBlocks = true)
    assert(!java.util.Arrays.equals(plain, lpcb))
  }

  test("wasted-bits subframes round-trip (samples with low zero bits)") {
    val s = det(13, 500).map(v => (v / 4) * 4) // 2 wasted bits
    val out = rt(Array(s), wasted = 2)
    assert(out.head.toSeq == s.toSeq)
    // the shift must actually shrink the stream vs encoding raw
    val raw = Flac.encode(44100, Array(s), 256)
    val shifted = Flac.encode(44100, Array(s), 256, wasted = 2)
    assert(shifted.length <= raw.length)
  }

  test("CRC integrity: one flipped bit anywhere in a frame refuses to decode") {
    val s = det(17, 300)
    val good = Flac.encode(44100, Array(s), 256)
    assert(Flac.decode(good).isDefined)
    // flip a bit in the frame body (past magic + 38-byte metadata)
    Seq(50, good.length / 2, good.length - 3).foreach { at =>
      val bad = good.clone()
      bad(at) = (bad(at) ^ 0x10).toByte
      val dec = Flac.decode(bad)
      assert(dec.isEmpty || dec.get._2.head.toSeq != s.toSeq,
        s"corruption at $at went unnoticed")
    }
  }

  test("malformed inputs degrade to None, never a throw") {
    assert(Flac.decode(Array.empty[Byte]).isEmpty)
    assert(Flac.decode("fLaCnope".getBytes).isEmpty)
    assert(Flac.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    val good = Flac.encode(8000, Array(det(1, 300)), 256)
    Seq(4, 20, 41, good.length / 2, good.length - 1).foreach { cut =>
      assert(Flac.decode(good.take(cut)).isEmpty, s"cut at $cut must be None")
    }
  }

  test("extreme values: full 16-bit range survives every mode") {
    val s = Array.tabulate(300)(i =>
      if (i % 3 == 0) 32767 else if (i % 3 == 1) -32768 else 0)
    assert(rt(Array(s)).head.toSeq == s.toSeq)
    // anti-correlated within the 16-bit range: side = L-R spans ±65535,
    // which needs the side channel's 17th bit
    val r = s.map(v => if (v == 32767) -32768 else if (v == -32768) 32767 else 0)
    for (mode <- Seq(8, 9, 10)) {
      val out = rt(Array(s, r), chMode = mode)
      assert(out(0).toSeq == s.toSeq && out(1).toSeq == r.toSeq, s"mode $mode")
    }
  }

  test("STREAMINFO block-size fields stay in the legal range (RFC 9639)") {
    // 70 samples at blockSize 64: the ragged 6-sample tail must NOT
    // surface as STREAMINFO min block size — 1..15 are reserved and
    // the encoder is fixed-blocksize (min == max; the last frame is
    // explicitly allowed to be shorter). Round-trip must stay exact.
    val xs = Array.tabulate(70)(i => 100 - 3 * i)
    val b = Flac.encode(44100, Array(xs), 64, -1, false, 0)
    def be16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    // STREAMINFO starts right after "fLaC" + 4-byte block header
    val minBlock = be16(8)
    val maxBlock = be16(10)
    assert(minBlock == maxBlock, "fixed-blocksize stream must report min == max")
    assert(minBlock >= 16, s"reserved block size $minBlock in STREAMINFO")
    val (_, out) = Flac.decode(b).getOrElse(fail("decode returned None"))
    assert(out.head.toSeq == xs.toSeq)
    // degenerate all-in-one-tiny-block stream clamps both fields to 16
    val tiny = Array.tabulate(9)(i => i * 7)
    val tb = Flac.encode(8000, Array(tiny), 64, -1, false, 0)
    def tbe16(o: Int): Int = ((tb(o) & 0xff) << 8) | (tb(o + 1) & 0xff)
    assert(tbe16(8) == 16 && tbe16(10) == 16)
    assert(Flac.decode(tb).get._2.head.toSeq == tiny.toSeq)
  }
}
