package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Round-13: REAL GIF pixel decode — the first container where the
  * compression codec itself (variable-width LZW, 9→12-bit codes,
  * CLEAR/EOI, deferred table-full) is implemented from scratch rather
  * than delegated to the JDK. Cross-validated BOTH directions against
  * the independent GIF codec that ships in the JDK (javax.imageio):
  * our encoder's bytes must decode pixel-identically under ImageIO,
  * and ImageIO-written GIFs must decode identically under ours — so
  * the pair cannot pass by a shared self-consistent bug. */
class GifDecodeSpec extends AnyFunSuite {

  private def expectedLuma(w: Int, h: Int, idx: (Int, Int) => Int): Seq[Long] =
    Seq.tabulate(w * h)(i => (idx(i % w, i / w) & 0xff).toLong)

  test("round-trips a known gradient, sequential and interlaced, with and without extensions") {
    val idx = (x: Int, y: Int) => (x * 7 + y * 31) % 256
    val want = expectedLuma(23, 17, idx)
    for (il <- Seq(false, true); cm <- Seq(false, true)) {
      val img = Multimodal.gifImage(23, 17, idx, interlaced = il, comment = cm)
      val got = Multimodal.gifLuminance(img)
      assert(got.isDefined, s"decode failed (interlaced=$il comment=$cm)")
      assert(got.get.toSeq == want, s"pixel mismatch (interlaced=$il comment=$cm)")
    }
  }

  test("interlaced and sequential encodings of the same image decode identically") {
    val idx = (x: Int, y: Int) => (x * x + y * 13) % 256
    // heights hitting every interlace-pass boundary case, incl. h < 8
    for (h <- Seq(1, 2, 3, 4, 5, 7, 8, 9, 16, 21)) {
      val seqD = Multimodal.gifLuminance(Multimodal.gifImage(11, h, idx))
      val ilD = Multimodal.gifLuminance(Multimodal.gifImage(11, h, idx, interlaced = true))
      assert(seqD.isDefined && ilD.isDefined, s"h=$h")
      assert(seqD.get.toSeq == ilD.get.toSeq, s"interlace reorder wrong at h=$h")
    }
  }

  test("LZW table-full path: a noise image forces a mid-stream CLEAR and still round-trips") {
    // 200x160 of splitmix-ish noise => >4096 distinct sequences, so the
    // encoder's dictionary fills, emits CLEAR, resets — and the decoder
    // must ride the deferred-clear state without adding entries.
    val idx = (x: Int, y: Int) => {
      var z = x.toLong * 2654435761L + y.toLong * 40503L + 12345L
      z ^= z >>> 13; z *= 0x9E3779B97F4A7C15L; z ^= z >>> 31
      (z & 0xff).toInt
    }
    val img = Multimodal.gifImage(200, 160, idx)
    val got = Multimodal.gifLuminance(img)
    assert(got.isDefined)
    assert(got.get.toSeq == expectedLuma(200, 160, idx))
  }

  test("our encoder's bytes decode pixel-identically under the JDK's independent GIF codec") {
    val idx = (x: Int, y: Int) => (x * 19 + y * 5 + 3) % 256
    for (il <- Seq(false, true); (w, h) <- Seq((13, 9), (64, 48))) {
      val img = Multimodal.gifImage(w, h, idx, interlaced = il, comment = true)
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(img))
      assert(bi != null, s"ImageIO rejected our GIF (il=$il $w x $h)")
      assert(bi.getWidth == w && bi.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = idx(x, y)
        assert((bi.getRGB(x, y) & 0xffffff) == ((v << 16) | (v << 8) | v),
          s"ImageIO pixel ($x,$y) mismatch (il=$il)")
      }
    }
  }

  test("ImageIO-written GIFs decode identically under our decoder") {
    val w = 31; val h = 22
    val idx = (x: Int, y: Int) => (x * 3 + y * 47) % 256
    // explicit 256-gray IndexColorModel so the JDK writer passes the
    // palette through losslessly instead of quantizing
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w) {
      val v = idx(x, y); bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", bos), "JDK has no GIF writer?")
    val got = Multimodal.gifLuminance(bos.toByteArray)
    assert(got.isDefined, "our decoder rejected a JDK-written GIF")
    assert(got.get.toSeq == expectedLuma(w, h, idx))
  }

  test("same pixels as BMP, PNG and GIF produce the same perceptual hash") {
    val idx = (x: Int, y: Int) => if (x >= 10) 220 else 30
    val rgb = (x: Int, y: Int) => { val v = idx(x, y); (v << 16) | (v << 8) | v }
    val bmp = Multimodal.bmpImage(20, 6, rgb)
    val png = Multimodal.pngImage(20, 6, rgb, alpha = true, filterSeed = 3)
    val gif = Multimodal.gifImage(20, 6, idx, interlaced = true)
    assert(Multimodal.gifLuminance(gif).get.toSeq ==
      Multimodal.bmpLuminance(bmp).get.toSeq)
    assert(Multimodal.perceptualHash60(gif) == Multimodal.perceptualHash60(bmp))
    assert(Multimodal.perceptualHash60(gif) == Multimodal.perceptualHash60(png))
  }

  test("truncated streams degrade to None, never throw") {
    val img = Multimodal.gifImage(25, 14, (x, y) => (x * y) % 256, comment = true)
    // comment ext follows the GCT; image descriptor after it
    val descOff = 13 + 768 + 2 + 1 + "graft synthetic fixture".length + 1
    // mid-signature, mid-screen-descriptor, mid-GCT, mid-extension,
    // mid-image-descriptor, a handful of LZW bytes (≪ the 350 pixels'
    // worth of codes), missing sub-block terminator. NOT img.length/2
    // or -1: cuts past the last NEEDED code decode fine — the decoder
    // stops at w*h pixels like every tolerant reader.
    for (cut <- Seq(3, 9, 100, 13 + 768 + 1, descOff + 4,
      descOff + 10 + 1 + 1 + 5, img.length - 2))
      assert(Multimodal.gifLuminance(img.take(cut)).isEmpty, s"cut=$cut")
    // and a missing trailer alone is tolerated, not an error
    assert(Multimodal.gifLuminance(img.take(img.length - 1)).isDefined)
  }

  test("malformed variants degrade to None: bad signature, no GCT, local color table, bounds overflow") {
    val img = Multimodal.gifImage(10, 10, (x, y) => (x + y) % 256)
    def mut(off: Int, v: Byte): Array[Byte] = { val b = img.clone(); b(off) = v; b }
    assert(Multimodal.gifLuminance(mut(0, 'J'.toByte)).isEmpty, "bad signature")
    assert(Multimodal.gifLuminance(mut(10, 0x07.toByte)).isEmpty, "no global color table")
    // image descriptor sits right after GCT: 13+768; flags byte at +9
    val desc = 13 + 768
    assert(Multimodal.gifLuminance(mut(desc + 9, 0x87.toByte)).isEmpty, "local color table")
    assert(Multimodal.gifLuminance(mut(desc + 5, 0xff.toByte)).isEmpty, "image wider than screen")
    assert(Multimodal.gifLuminance(Array[Byte](1, 2, 3)).isEmpty, "garbage")
    assert(Multimodal.gifLuminance("not a gif at all".getBytes("UTF-8")).isEmpty)
  }

  test("corrupt LZW codes degrade to None") {
    val img = Multimodal.gifImage(16, 16, (x, y) => (x * 5 + y) % 256)
    // first data sub-block starts after descriptor + minCodeSize byte;
    // set bytes that decode to out-of-range dynamic codes
    val dataOff = 13 + 768 + 10 + 1 + 1 // +1 min code size, +1 sub-block len
    val bad = img.clone()
    for (i <- dataOff + 3 until math.min(bad.length - 2, dataOff + 10))
      bad(i) = 0xff.toByte
    // either decodes to None (out-of-range code / short stream) or — if
    // the trash happens to form valid codes — still never throws
    Multimodal.gifLuminance(bad) // must not throw
    // a stream cut INSIDE the codes is always None
    val short = img.take(dataOff + 2) ++ Array[Byte](0, 0x3B)
    assert(Multimodal.gifLuminance(short).isEmpty)
  }
}
