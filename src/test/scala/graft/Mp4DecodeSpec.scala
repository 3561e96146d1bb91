package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Jpeg, Multimodal => MM}

/** Round-15 (cont.): the ISO-BMFF (MP4/MOV) walk — box tree, 64-bit
  * largesize headers, and the four-way sample-table join
  * (stsc × stco/co64 × stsz × stts). Frames are our own baseline
  * JPEGs, so the decode cross-check runs the whole stack:
  * container → byte range → T.81 pipeline. */
class Mp4DecodeSpec extends AnyFunSuite {

  private def gray(v: Int) = (v << 16) | (v << 8) | v

  /** Constant-cell frames (DC-only, quant-8 exact) — frame f's block
    * (bx, by) holds value (11*bx + 7*by + f) % 100. */
  private def frames(w: Int, h: Int, n: Int): Seq[Array[Byte]] = {
    val nbx = (w + 7) / 8
    (0 until n).map { f =>
      Jpeg.encode(w, h, (x, y) =>
        gray(((11 * (x / 8) + 7 * (y / 8) + f) % 100)))
    }
  }

  private def lumaOf(w: Int, h: Int, f: Int): Long = {
    var s = 0L
    for (y <- 0 until h; x <- 0 until w)
      s += (11 * (x / 8) + 7 * (y / 8) + f) % 100
    s
  }

  test("walk round-trips geometry: dims, timescales, durations, sample count") {
    val fs = frames(16, 8, 5)
    val b = MM.mp4MjpegVideo(16, 8, fs, timescale = 90000, sampleDelta = 3000)
    val info = MM.mp4Walk(b).get
    assert(info.timescale == 1000)
    val v = info.tracks.find(_.handler == "vide").get
    assert(v.trackId == 1 && v.fourcc == "jpeg")
    assert(v.width == 16 && v.height == 8)
    assert(v.timescale == 90000 && v.duration == 6L * 3000)
    assert(v.samples.length == 5)
    // stts run-length: 4 samples at 3000, the last at 6000
    assert(v.samples.map(_._3).toSeq == Seq(3000L, 3000L, 3000L, 3000L, 6000L))
  }

  test("sample table resolves the exact payload bytes (chunked, spc=3)") {
    val fs = frames(8, 8, 7)
    val b = MM.mp4MjpegVideo(8, 8, fs, timescale = 90000, sampleDelta = 3000,
      samplesPerChunk = 3)
    val v = MM.mp4Walk(b).get.tracks.find(_.handler == "vide").get
    assert(v.samples.length == 7)
    v.samples.zip(fs).foreach { case ((off, len, _), f) =>
      assert(len == f.length)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + len), f),
        "resolved byte range must be exactly the original sample")
    }
  }

  test("co64 (64-bit chunk offsets) resolves identically to stco") {
    val fs = frames(8, 8, 4)
    val a = MM.mp4MjpegVideo(8, 8, fs, 90000, 3000, samplesPerChunk = 2)
    val c = MM.mp4MjpegVideo(8, 8, fs, 90000, 3000, samplesPerChunk = 2,
      co64 = true)
    val va = MM.mp4Walk(a).get.tracks.head
    val vc = MM.mp4Walk(c).get.tracks.head
    assert(va.samples.map(s => (s._2, s._3)).toSeq ==
      vc.samples.map(s => (s._2, s._3)).toSeq)
    // both decode to the same pixels
    assert(MM.mp4MjpegFrameLuma(a).get._3.map(_.sum).toSeq ==
      MM.mp4MjpegFrameLuma(c).get._3.map(_.sum).toSeq)
  }

  test("an interleaved audio track never confuses the video walk") {
    val fs = frames(16, 16, 3)
    val b = MM.mp4MjpegVideo(16, 16, fs, 90000, 3000, audioTrack = true)
    val info = MM.mp4Walk(b).get
    assert(info.tracks.length == 2)
    val Seq(v, a) = info.tracks.sortBy(_.trackId)
    assert(v.handler == "vide" && a.handler == "soun")
    assert(a.fourcc == "twos" && a.samples.length == 3)
    // audio chunk bytes resolve too — and are NOT jpeg data
    val (ao, al, _) = a.samples(0)
    assert(b.slice(ao.toInt, ao.toInt + al).forall(_ == 1.toByte))
    // video still decodes through the full JPEG stack
    val (w, h, lum) = MM.mp4MjpegFrameLuma(b).get
    assert(w == 16 && h == 16 && lum.length == 3)
    assert(lum(0).sum == lumaOf(16, 16, 0))
  }

  test("frame decode agrees with direct Jpeg.decode on every sample") {
    val fs = frames(24, 16, 4)
    val b = MM.mp4MjpegVideo(24, 16, fs, 90000, 3000, samplesPerChunk = 2)
    val got = MM.mp4MjpegFrameLuma(b).get._3
    fs.zip(got).foreach { case (f, g) =>
      val direct = Jpeg.luminanceWithDims(f).get._3
      assert(java.util.Arrays.equals(direct, g))
    }
    (0 until 4).foreach(f => assert(got(f).sum == lumaOf(24, 16, f)))
  }

  test("64-bit largesize box headers are walked") {
    val fs = frames(8, 8, 2)
    val b = MM.mp4MjpegVideo(8, 8, fs, 90000, 3000)
    // rewrite the trailing moov box with a size==1 + largesize header;
    // moov is last, so no stco offset shifts
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val moovAt = {
      // find the top-level moov: walk sizes from 0
      var off = 0; var found = -1
      while (off < b.length && found < 0) {
        val size = ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
          ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
        if (new String(b, off + 4, 4, "US-ASCII") == "moov") found = off
        else off += size.toInt
      }
      found
    }
    assert(moovAt > 0)
    val oldSize = ((b(moovAt) & 0xffL) << 24) | ((b(moovAt + 1) & 0xffL) << 16) |
      ((b(moovAt + 2) & 0xffL) << 8) | (b(moovAt + 3) & 0xffL)
    val out = new java.io.ByteArrayOutputStream()
    out.write(b, 0, moovAt)
    out.write(be32(1), 0, 4)                       // size == 1: largesize follows
    out.write(b, moovAt + 4, 4)                    // 'moov'
    out.write(be32(0), 0, 4); out.write(be32(oldSize + 8), 0, 4) // 64-bit size
    out.write(b, moovAt + 8, (oldSize - 8).toInt)  // payload unchanged
    val patched = out.toByteArray
    val v = MM.mp4Walk(patched).get.tracks.find(_.handler == "vide").get
    assert(v.samples.length == 2)
    assert(MM.mp4MjpegFrameLuma(patched).get._3(0).sum == lumaOf(8, 8, 0))
  }

  test("fragmented MP4: moof/traf/trun samples resolve byte-exactly") {
    val fs = frames(16, 8, 7)
    val b = MM.mp4FragmentedMjpeg(16, 8, fs, timescale = 90000,
      sampleDelta = 3000, framesPerFragment = 3) // fragments of 3, 3, 1
    val info = MM.mp4Walk(b).get
    val v = info.tracks.find(_.handler == "vide").get
    assert(v.width == 16 && v.height == 8 && v.fourcc == "jpeg")
    assert(v.samples.length == 7)
    // fragmented mdhd duration is 0: reported duration is Σ trun deltas
    assert(v.duration == 8L * 3000)
    assert(v.samples.map(_._3).toSeq ==
      Seq(3000L, 3000L, 3000L, 3000L, 3000L, 3000L, 6000L))
    v.samples.zip(fs).foreach { case ((off, len, _), f) =>
      assert(len == f.length)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + len), f),
        "trun-resolved byte range must be exactly the original sample")
    }
  }

  test("fragmented and unfragmented layouts decode to identical pixels") {
    val fs = frames(24, 16, 5)
    val flat = MM.mp4MjpegVideo(24, 16, fs, 90000, 3000, samplesPerChunk = 2)
    val frag = MM.mp4FragmentedMjpeg(24, 16, fs, 90000, 3000, framesPerFragment = 2)
    val a = MM.mp4MjpegFrameLuma(flat).get
    val c = MM.mp4MjpegFrameLuma(frag).get
    assert(a._1 == c._1 && a._2 == c._2)
    a._3.zip(c._3).foreach { case (x, y) => assert(java.util.Arrays.equals(x, y)) }
    // and both sample tables agree on (size, duration) content
    val ta = MM.mp4Walk(flat).get.tracks.head.samples.map(s => (s._2, s._3))
    val tc = MM.mp4Walk(frag).get.tracks.head.samples.map(s => (s._2, s._3))
    assert(ta.toSeq == tc.toSeq)
  }

  test("fragmented malformed paths: truncated moof/mdat, moof before moov") {
    val fs = frames(8, 8, 4)
    val good = MM.mp4FragmentedMjpeg(8, 8, fs, 90000, 3000, framesPerFragment = 2)
    Seq(good.length / 2, good.length - 3).foreach { cut =>
      assert(MM.mp4Walk(good.take(cut)).isEmpty, s"cut at $cut must be None")
    }
    // a stream whose moof precedes any moov cannot name a track
    val moofAt = {
      var off = 0; var found = -1
      while (off < good.length && found < 0) {
        val size = ((good(off) & 0xffL) << 24) | ((good(off + 1) & 0xffL) << 16) |
          ((good(off + 2) & 0xffL) << 8) | (good(off + 3) & 0xffL)
        if (new String(good, off + 4, 4, "US-ASCII") == "moof") found = off
        else off += size.toInt
      }
      found
    }
    assert(moofAt > 0)
    assert(MM.mp4Walk(java.util.Arrays.copyOfRange(good, moofAt, good.length)).isEmpty)
  }

  test("malformed inputs degrade to None, never a throw") {
    val fs = frames(8, 8, 3)
    val good = MM.mp4MjpegVideo(8, 8, fs, 90000, 3000)
    assert(MM.mp4Walk(Array.empty[Byte]).isEmpty)
    assert(MM.mp4Walk("not an mp4 at all".getBytes).isEmpty)
    // truncation at every box-ish boundary
    Seq(4, 12, good.length / 2, good.length - 3).foreach { cut =>
      assert(MM.mp4Walk(good.take(cut)).isEmpty, s"cut at $cut must be None")
    }
    // a sample table pointing past EOF (corrupt stco) must refuse:
    // dropping trailing moov bytes is caught by the box walk itself
    assert(MM.mp4MjpegFrameLuma(good.take(good.length - 3)).isEmpty)
    // non-jpeg fourcc: patch the stsd entry fourcc bytes
    val patched = good.clone()
    val at = {
      val s = new String(patched, "ISO-8859-1")
      s.indexOf("jpeg", s.indexOf("stsd"))
    }
    assert(at > 0)
    "avc1".getBytes.copyToArray(patched, at)
    assert(MM.mp4Walk(patched).isDefined, "walk still parses unknown codecs")
    assert(MM.mp4MjpegFrameLuma(patched).isEmpty,
      "frame decode refuses a non-jpeg entry")
  }

  test("ragged final chunk gets its own stsc run (ISO-BMFF conformance)") {
    // 7 frames at 2 per chunk: chunks of 2,2,2,1 — a single-entry stsc
    // would claim 2 samples for the last chunk (a phantom sample a
    // spec-strict reader plans). The builder must emit a second run.
    val fs = frames(8, 8, 7)
    val b = MM.mp4MjpegVideo(8, 8, fs, 90000, 3000, samplesPerChunk = 2)
    // locate the stsc box and read its entry count + runs
    def be32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val idx = (0 until b.length - 4).find(i =>
      b(i) == 's' && b(i + 1) == 't' && b(i + 2) == 's' && b(i + 3) == 'c').get
    val entryCount = be32(idx + 8) // skip fourcc + version/flags
    assert(entryCount == 2, s"ragged chunking needs 2 stsc runs, got $entryCount")
    val run1 = (be32(idx + 12), be32(idx + 16)) // (first_chunk, spc)
    val run2 = (be32(idx + 24), be32(idx + 28))
    assert(run1 == ((1L, 2L)))
    assert(run2 == ((4L, 1L)), s"final-run remainder wrong: $run2")
    // the walker still resolves all 7 samples to their exact bytes
    val v = MM.mp4Walk(b).get.tracks.find(_.handler == "vide").get
    assert(v.samples.length == 7)
    v.samples.zip(fs).foreach { case ((off, len, _), f) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + len), f))
    }
  }
}
