package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Round-13 item (r12 VERDICT #2): REAL PNG pixel decode — IDAT
  * inflate + all five scanline de-filters — must round-trip synthesized
  * known-pixel PNGs exactly, degrade to None (never throw) on
  * truncated / corrupt / unsupported streams, and agree with the BMP
  * decoder on identical pixel content (cross-container dedup). */
class PngDecodeSpec extends AnyFunSuite {

  private def gray(v: Int) = (v << 16) | (v << 8) | v

  private def expectedLuma(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Long] =
    Array.tabulate(w * h) { i =>
      val c = rgb(i % w, i / w)
      (299L * ((c >>> 16) & 0xff) + 587L * ((c >>> 8) & 0xff) + 114L * (c & 0xff)) / 1000L
    }

  test("round-trips a known gradient for EVERY scanline filter type, RGB and RGBA") {
    val rgb = (x: Int, y: Int) => ((x * 7 + y * 31) % 256) << 16 |
      ((x * 13 + y * 3) % 256) << 8 | ((x + y * 17) % 256)
    val want = expectedLuma(9, 7, rgb).toSeq
    for (seed <- 0 until 5; alpha <- Seq(false, true)) {
      // filterSeed pins row 0's filter type; 7 rows cycle through all 5
      val img = Multimodal.pngImage(9, 7, rgb, alpha = alpha, filterSeed = seed)
      val got = Multimodal.pngLuminance(img)
      assert(got.isDefined, s"decode failed (seed=$seed alpha=$alpha)")
      assert(got.get.toSeq == want, s"pixel mismatch (seed=$seed alpha=$alpha)")
    }
  }

  test("each filter type alone reconstructs (single-filter images)") {
    // h=1 forces exactly one row → exactly the seeded filter type runs
    val rgb = (x: Int, y: Int) => gray((x * 41 + 5) % 256)
    val want = expectedLuma(16, 1, rgb).toSeq
    for (ft <- 0 until 5) {
      val img = Multimodal.pngImage(16, 1, rgb, alpha = false, filterSeed = ft)
      assert(Multimodal.pngLuminance(img).map(_.toSeq).contains(want),
        s"filter type $ft failed")
    }
  }

  test("same pixels as BMP and as PNG produce the same perceptual hash") {
    val rgb = (x: Int, y: Int) => gray(if (x >= 10) 220 else 30) // bright right half
    val bmp = Multimodal.bmpImage(20, 6, rgb)
    val png = Multimodal.pngImage(20, 6, rgb, alpha = true, filterSeed = 3)
    assert(Multimodal.bmpLuminance(bmp).get.toSeq ==
      Multimodal.pngLuminance(png).get.toSeq)
    assert(Multimodal.perceptualHash60(bmp) == Multimodal.perceptualHash60(png))
    // and the hash reflects CONTENT: exactly the bright-half block bits set
    val h = Multimodal.perceptualHash60(png)
    (0 until 60).foreach { k =>
      // block k covers columns [k*120/60/6, ...) — row-major: block = i*60/120
      val i0 = k * 120 / 60 // first sample index in block k
      val brightBlock = (i0 % 20) >= 10
      assert(((h >> k) & 1L) == (if (brightBlock) 1L else 0L), s"bit $k")
    }
  }

  test("truncated streams degrade to None, never throw") {
    val img = Multimodal.pngImage(12, 9, (x, y) => gray((x * y) % 256), filterSeed = 1)
    // every truncation point: mid-signature, mid-IHDR, mid-IDAT, missing IEND
    for (cut <- Seq(4, 20, 40, img.length / 2, img.length - 6, img.length - 1))
      assert(Multimodal.pngLuminance(img.take(cut)).isEmpty, s"cut=$cut")
  }

  test("corrupt zlib stream and bad filter byte degrade to None") {
    val img = Multimodal.pngImage(12, 9, (x, y) => gray((x + y) % 256))
    // find first IDAT data region and trash its middle bytes
    def beInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    var off = 8
    var idatOff = -1; var idatLen = 0
    while (idatOff < 0) {
      val len = beInt(img, off)
      if (new String(img, off + 4, 4, "US-ASCII") == "IDAT") {
        idatOff = off + 8; idatLen = len
      } else off += 12 + len
    }
    val bad = img.clone()
    for (i <- idatOff + 2 until math.min(idatOff + idatLen, idatOff + 12))
      bad(i) = (~bad(i)).toByte
    assert(Multimodal.pngLuminance(bad).isEmpty)
  }

  test("unsupported variants degrade to None: palette, 16-bit, interlace, gray") {
    val img = Multimodal.pngImage(6, 6, (_, _) => gray(128))
    def mut(off: Int, v: Byte): Array[Byte] = {
      val b = img.clone(); b(off) = v; b
    }
    // IHDR layout: sig(8) len(4) 'IHDR'(4) w(4) h(4) depth@24 color@25 ... interlace@28
    assert(Multimodal.pngLuminance(mut(24, 16)).isEmpty, "16-bit depth")
    assert(Multimodal.pngLuminance(mut(25, 3)).isEmpty, "palette color type")
    assert(Multimodal.pngLuminance(mut(25, 0)).isEmpty, "grayscale color type")
    assert(Multimodal.pngLuminance(mut(28, 1)).isEmpty, "Adam7 interlace")
    assert(Multimodal.pngLuminance(Array[Byte](1, 2, 3)).isEmpty, "garbage")
    assert(Multimodal.pngLuminance("not a png at all".getBytes("UTF-8")).isEmpty)
  }

  test("zero-dimension and dimension-bomb headers degrade to None") {
    val img = Multimodal.pngImage(6, 6, (_, _) => gray(1))
    def be(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    val zw = img.clone(); be(zw, 16, 0)
    assert(Multimodal.pngLuminance(zw).isEmpty, "w=0")
    val bomb = img.clone(); be(bomb, 16, 1 << 20); be(bomb, 20, 1 << 20)
    assert(Multimodal.pngLuminance(bomb).isEmpty, "2^40-pixel allocation bomb")
  }
}
