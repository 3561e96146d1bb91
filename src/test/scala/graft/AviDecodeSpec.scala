package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Round-13: REAL AVI video-container decode — the video milestone
  * after images (BMP/PNG/GIF) and audio (WAV). The RIFF tree walk
  * (nested LISTs, word alignment) and the raw-DIB frame raster
  * (bottom-up BGR, 4-byte stride padding) must round-trip synthesized
  * known-pixel clips exactly and degrade to None on malformed input.
  * Frame rasters share the BMP layout, so a single frame written as a
  * BMP must decode to the identical luma — the cross-container check
  * that pins the raster rules to an already-ImageIO-validated path. */
class AviDecodeSpec extends AnyFunSuite {

  private def gray(v: Int) = (v << 16) | (v << 8) | v

  test("round-trips a known multi-frame clip, with and without a JUNK chunk") {
    val pix = (f: Int, x: Int, y: Int) => gray((f * 41 + x * 7 + y * 13) % 256)
    for (junk <- Seq(false, true); (w, h, n) <- Seq((5, 3, 4), (8, 6, 7), (13, 9, 2))) {
      val avi = Multimodal.aviRawVideo(w, h, n, pix, junk = junk)
      val got = Multimodal.aviFrameLuma(avi)
      assert(got.isDefined, s"decode failed (junk=$junk $w x $h x $n)")
      val (gw, gh, frames) = got.get
      assert(gw == w && gh == h && frames.length == n)
      for (f <- 0 until n; i <- 0 until w * h)
        assert(frames(f)(i) == (pix(f, i % w, i / w) & 0xff).toLong,
          s"frame $f pixel $i (junk=$junk)")
    }
  }

  test("an AVI frame and the same image as BMP decode to identical luma") {
    val rgb = (x: Int, y: Int) => ((x * 19 + 3) % 256) << 16 |
      ((y * 31 + 7) % 256) << 8 | ((x + y) % 256)
    val avi = Multimodal.aviRawVideo(11, 7, 1, (_, x, y) => rgb(x, y))
    val bmp = Multimodal.bmpImage(11, 7, rgb)
    val aviLuma = Multimodal.aviFrameLuma(avi).get._3.head.toSeq
    val bmpLuma = Multimodal.bmpLuminance(bmp).get.toSeq
    assert(aviLuma == bmpLuma, "raster rules diverged between AVI frames and BMP")
  }

  test("truncated streams degrade to None, never throw") {
    val avi = Multimodal.aviRawVideo(9, 5, 3, (f, x, y) => gray((f + x + y) % 256))
    // mid-signature, mid-hdrl, mid-strf, mid-movi, mid-frame, mid-idx1
    for (cut <- Seq(3, 11, 40, 120, 200, avi.length / 2, avi.length - 20))
      assert(Multimodal.aviFrameLuma(avi.take(cut)).isEmpty, s"cut=$cut")
  }

  test("malformed variants degrade to None: bad signature, compressed stream, wrong bpp, frame-size lie") {
    val avi = Multimodal.aviRawVideo(9, 5, 3, (f, x, y) => gray((f * x * y) % 256))
    def mut(off: Int, v: Byte): Array[Byte] = { val b = avi.clone(); b(off) = v; b }
    assert(Multimodal.aviFrameLuma(mut(8, 'X'.toByte)).isEmpty, "bad AVI tag")
    // strf layout: ...LIST strl: strh(8+56) then 'strf' size(4) then BITMAPINFOHEADER;
    // find it by scanning for the tag
    def find(tag: String, from: Int): Int = {
      var i = from
      while (!(0 until 4).forall(k => avi(i + k) == tag(k).toByte)) i += 1
      i
    }
    val strf = find("strf", 12)
    assert(Multimodal.aviFrameLuma(mut(strf + 8 + 14, 8.toByte)).isEmpty, "8-bpp stream")
    assert(Multimodal.aviFrameLuma(mut(strf + 8 + 16, 1.toByte)).isEmpty, "BI_RLE8 compression")
    // lie about the first frame chunk's size: decoder must reject, not misparse
    val movi = find("movi", strf)
    val bad = avi.clone(); bad(movi + 4 + 4) = 1 // first 00db size low byte
    assert(Multimodal.aviFrameLuma(bad).isEmpty, "frame-size lie")
    assert(Multimodal.aviFrameLuma(Array[Byte](1, 2, 3)).isEmpty, "garbage")
    assert(Multimodal.aviFrameLuma("not an avi".getBytes("UTF-8")).isEmpty)
  }

  test("planted-cut margins are exact: within-shot vs cut deltas never overlap") {
    // replicate mm_avi_shots' formula at its smallest frame (w=4,h=3)
    // and check the 64*w*h threshold splits the two regimes with room
    val w = 4; val h = 3; val n = 10; val c = 5; val id = 77L
    val avi = Multimodal.aviRawVideo(w, h, n, (f, x, y) => {
      val base = ((id * 31 + f + y.toLong * w + x) % 120).toInt
      gray(if (f < c) base else 128 + base)
    })
    val frames = Multimodal.aviFrameLuma(avi).get._3
    val deltas = (1 until n).map { f =>
      (0 until w * h).map(i => math.abs(frames(f)(i) - frames(f - 1)(i))).sum
    }
    val thresh = 64L * w * h
    deltas.zipWithIndex.foreach { case (d, f0) =>
      val isCutFrame = (f0 + 1) == c
      assert((d > thresh) == isCutFrame,
        s"frame ${f0 + 1}: delta $d vs thresh $thresh (cut at $c)")
    }
  }

  test("MJPEG: container frames decode identically to Jpeg.decode on the raw bytes") {
    import graft.operators.Jpeg
    val w = 11; val h = 9; val nbx = (w + 7) / 8
    def gray(v: Int) = (v << 16) | (v << 8) | v
    // constant 8x8 cells -> the encode is bit-exact, so the container
    // path must reproduce Jpeg.luminance byte for byte
    val jpegs = (0 until 4).map { f =>
      Jpeg.encode(w, h, (x, y) =>
        gray(((7L * f + (y / 8).toLong * nbx + (x / 8)) % 100).toInt + f),
        gray = f % 2 == 0, subsample420 = f % 2 == 1)
    }
    for (junk <- Seq(false, true)) {
      val avi = Multimodal.aviMjpegVideo(w, h, jpegs, junk = junk)
      val (gw, gh, frames) = Multimodal.aviMjpegFrameLuma(avi).get
      assert(gw == w && gh == h && frames.length == 4)
      frames.zip(jpegs).zipWithIndex.foreach { case ((got, src), f) =>
        val direct = Jpeg.luminance(src).get
        assert(got.sameElements(direct), s"frame $f diverges from direct Jpeg.decode")
      }
    }
  }

  test("MJPEG malformed variants degrade to None: raw-DIB stream, garbage frame, dim lie, truncation") {
    import graft.operators.Jpeg
    val w = 8; val h = 8
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val jpeg = Jpeg.encode(w, h, (_, _) => gray(50), gray = true)
    val good = Multimodal.aviMjpegVideo(w, h, Seq(jpeg, jpeg))
    assert(Multimodal.aviMjpegFrameLuma(good).isDefined)
    // a raw-DIB AVI is not MJPEG (and vice versa: the raw decoder
    // refuses the compressed stream)
    val raw = Multimodal.aviRawVideo(w, h, 2, (_, _, _) => gray(50))
    assert(Multimodal.aviMjpegFrameLuma(raw).isEmpty)
    assert(Multimodal.aviFrameLuma(good).isEmpty)
    // a frame chunk of garbage bytes is an undecodable JPEG
    val garbage = Multimodal.aviMjpegVideo(w, h,
      Seq(jpeg, Array.fill[Byte](64)(0x55)))
    assert(Multimodal.aviMjpegFrameLuma(garbage).isEmpty)
    // header dims disagreeing with the frames' own SOF dims
    val lied = Multimodal.aviMjpegVideo(w + 8, h, Seq(jpeg))
    assert(Multimodal.aviMjpegFrameLuma(lied).isEmpty)
    // truncation never throws
    for (cut <- Seq(4, 40, good.length / 2, good.length - 3))
      assert(Multimodal.aviMjpegFrameLuma(good.take(cut)).isEmpty, s"cut=$cut")
  }

  test("MJPEG with an audio stream still decodes: the video strf is latched, not last-writer-wins") {
    import graft.operators.Jpeg
    val w = 10; val h = 6
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val jpegs = (0 until 3).map(f =>
      Jpeg.encode(w, h, (_, _) => gray(40 + f), gray = true))
    val avi = Multimodal.aviMjpegVideo(w, h, jpegs, audioStream = true)
    val (gw, gh, frames) = Multimodal.aviMjpegFrameLuma(avi)
      .getOrElse(fail("valid MJPEG+PCM AVI rejected — audio strf clobbered the video format"))
    assert(gw == w && gh == h && frames.length == 3)
    frames.zipWithIndex.foreach { case (lum, f) =>
      assert(lum.forall(_ == 40L + f), s"frame $f pixels wrong")
    }
  }

  test("MJPEG with audio declared FIRST: video is stream 1, its 01dc frames are followed") {
    import graft.operators.Jpeg
    val w = 10; val h = 6
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val jpegs = (0 until 3).map(f =>
      Jpeg.encode(w, h, (_, _) => gray(60 + f), gray = true))
    val avi = Multimodal.aviMjpegVideo(w, h, jpegs, audioFirst = true)
    val (gw, gh, frames) = Multimodal.aviMjpegFrameLuma(avi)
      .getOrElse(fail("audio-first MJPEG AVI rejected — frame tag hardwired to stream 00"))
    assert(gw == w && gh == h && frames.length == 3)
    frames.zipWithIndex.foreach { case (lum, f) =>
      assert(lum.forall(_ == 60L + f), s"frame $f pixels wrong")
    }
  }
}
