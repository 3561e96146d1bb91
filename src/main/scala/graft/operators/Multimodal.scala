package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2-F).
  *
  * Media assets are opaque `binary` columns plus a typed metadata
  * struct. Decode / feature-extraction runs BATCHED per partition via
  * `Dataset.mapPartitions` (the Scala analog of `mapInPandas`): the
  * decoder sees a buffered batch of blobs, amortizing any per-model /
  * per-codec setup cost, and emits fixed-width feature rows. At 100 TB
  * the batch size bounds executor memory per task and the blobs never
  * pass through a shuffle — features (tiny) do.
  *
  * The actual image/audio codecs are NOT in this container, so the
  * real decoders are stubbed (`StubImageDecoder` et al.) behind the
  * `Decoder` interface; `ByteStatsDecoder` is a deterministic, fully
  * real implementation used by the verified query path.
  */
object Multimodal {

  case class Asset(doc_id: Long, modality: String, blob: Array[Byte])
  case class Features(doc_id: Long, n_bytes: Long, head_byte: Long, byte_sum: Long)

  /** A batched blob decoder. Implementations must be deterministic. */
  trait Decoder extends Serializable {
    def batchSize: Int = 64
    def decode(batch: Seq[Asset]): Seq[Features]
  }

  /** Real decoder: byte-level statistics (works on any modality). */
  object ByteStatsDecoder extends Decoder {
    def decode(batch: Seq[Asset]): Seq[Features] = batch.map { a =>
      val n = a.blob.length.toLong
      val head = if (n > 0) (a.blob(0) & 0xff).toLong else -1L
      var sum = 0L
      var i = 0
      while (i < a.blob.length) { sum += (a.blob(i) & 0xffL); i += 1 }
      Features(a.doc_id, n, head, sum)
    }
  }

  /** REAL pure-JVM image-header decoder: parses PNG IHDR, BMP
    * BITMAPINFOHEADER, GIF logical-screen and JPEG SOF dimensions
    * straight from the blob bytes — no codec library. Emits
    * Features(doc_id, n_bytes, width, height) using the (head_byte,
    * byte_sum) slots [[resizePlan]] reads as (w, h); unrecognized or
    * truncated blobs decode to (-1, -1) so a mixed corpus flows
    * through without task failures. Height is |height|: a negative
    * BMP height just means top-down row order. Full pixel decode
    * still needs codecs absent from this container — this covers the
    * header/metadata half for real, across the four dominant web
    * image containers. */
  object HeaderImageDecoder extends Decoder {
    private val PngSig: Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    private def beInt(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    private def leInt(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def leShort(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8))
    private def beShort(b: Array[Byte], off: Int): Long =
      (((b(off) & 0xffL) << 8) | (b(off + 1) & 0xffL))
    /** JPEG: walk the marker segments to the first SOFn frame header
      * (0xC0-0xCF minus the non-frame C4/C8/CC), which carries
      * height@+5 (BE16) then width@+7. Segment lengths include their
      * own 2 length bytes, so a zero-payload length would loop — bail
      * on any length < 2 (malformed). */
    private def jpegDims(b: Array[Byte]): Option[(Long, Long)] = {
      var i = 2
      while (i + 9 <= b.length) {
        if ((b(i) & 0xff) != 0xff) return None
        val marker = b(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return Some((beShort(b, i + 7), beShort(b, i + 5)))
        if (marker == 0xff) i += 1 // fill byte padding
        else if (marker == 0xd9) return None // EOI: no frame header can follow
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else {
          val len = beShort(b, i + 2).toInt
          if (len < 2) return None
          i += 2 + len
        }
      }
      None
    }
    /** WebP: RIFF container ("RIFF"....."WEBP"), first chunk tag at 12
      * picks the variant. VP8 (lossy): keyframe sync 9D 01 2A at 23,
      * then 14-bit LE width@26 / height@28. VP8L (lossless): 0x2F
      * signature at 20, then 14-bit width-1 and height-1 bit-packed
      * LE from 21. VP8X (extended): 24-bit LE canvas width-1@24 /
      * height-1@27. All per the public container spec. */
    private def webpDims(b: Array[Byte]): Option[(Long, Long)] = {
      def tag(off: Int, s: String) = s.indices.forall(i => b(off + i) == s(i).toByte)
      if (b.length < 30 || !tag(0, "RIFF") || !tag(8, "WEBP")) None
      else if (tag(12, "VP8 ") && (b(23) & 0xff) == 0x9d &&
          (b(24) & 0xff) == 0x01 && (b(25) & 0xff) == 0x2a)
        Some((leShort(b, 26) & 0x3fff, leShort(b, 28) & 0x3fff))
      else if (tag(12, "VP8L") && (b(20) & 0xff) == 0x2f) {
        val bits = leInt(b, 21).toLong & 0xffffffffL
        Some(((bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1))
      } else if (tag(12, "VP8X")) {
        def le24(off: Int): Long =
          (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) | ((b(off + 2) & 0xffL) << 16)
        Some((le24(24) + 1, le24(27) + 1))
      } else None
    }
    /** (width, height) if the blob is a parseable PNG/BMP/GIF/JPEG/WebP header. */
    def dims(blob: Array[Byte]): Option[(Long, Long)] =
      if (blob.length >= 24 && blob.startsWith(PngSig) &&
          blob(12) == 'I' && blob(13) == 'H' && blob(14) == 'D' && blob(15) == 'R')
        Some((beInt(blob, 16), beInt(blob, 20))) // IHDR: width@16, height@20, big-endian
      else if (blob.length >= 26 && blob(0) == 'B' && blob(1) == 'M')
        Some((leInt(blob, 18).toLong, math.abs(leInt(blob, 22)).toLong)) // BITMAPINFOHEADER, little-endian
      else if (blob.length >= 10 && blob(0) == 'G' && blob(1) == 'I' && blob(2) == 'F' &&
          blob(3) == '8' && (blob(4) == '7' || blob(4) == '9') && blob(5) == 'a')
        Some((leShort(blob, 6), leShort(blob, 8))) // logical screen, little-endian 16-bit
      else if (blob.length >= 4 && (blob(0) & 0xff) == 0xff && (blob(1) & 0xff) == 0xd8)
        jpegDims(blob)
      else if (blob.length >= 30 && blob(0) == 'R' && blob(1) == 'I')
        webpDims(blob)
      else None
    def decode(batch: Seq[Asset]): Seq[Features] = batch.map { a =>
      val (w, h) = dims(a.blob).getOrElse((-1L, -1L))
      Features(a.doc_id, a.blob.length.toLong, w, h)
    }
  }

  /** STUB — full image decode (JPEG → pixels) needs codecs absent from
    * this container. Deterministic fake: derives a pseudo
    * width/height/channel feature from the blob hash so the plumbing
    * (schema, batching, partitioning) is exercised end-to-end. Use
    * [[HeaderImageDecoder]] for real PNG/BMP dimensions. */
  object StubImageDecoder extends Decoder {
    def decode(batch: Seq[Asset]): Seq[Features] = batch.map { a =>
      val h = graft.functions.Kernels.fnv64(a.blob, 0, a.blob.length)
      Features(a.doc_id, a.blob.length.toLong, math.abs(h % 4096), math.abs((h >>> 12) % 4096))
    }
  }

  /** Blockhash-style 60-bit binary fingerprint over raw blob bytes:
    * split the blob into 60 contiguous blocks (byte i → block
    * i·60/n, integer division), set bit k iff block k's MEAN byte
    * value exceeds the blob mean — compared as sum_k·n > total·cnt_k,
    * exact integer math (mean-normalized, so uneven block sizes when
    * 60 ∤ n can't masquerade as content). The byte-level stand-in
    * for a perceptual image hash: with a real pixel decoder the same
    * fingerprint runs over luminance blocks; near-dup pairs come from
    * Hamming banding exactly like SimHash. 60 bits so engine-portable
    * SQL can rebuild it without signed-shift overflow. */
  def blockHash60(blob: Array[Byte]): Long = {
    val n = blob.length
    if (n == 0) return 0L
    val sums = new Array[Long](60)
    val cnts = new Array[Long](60)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = blob(i) & 0xffL
      val k = ((i.toLong * 60) / n).toInt
      sums(k) += v
      cnts(k) += 1
      total += v
      i += 1
    }
    var h = 0L
    var k = 0
    while (k < 60) { if (sums(k) * n > total * cnts(k)) h |= 1L << k; k += 1 }
    h
  }

  /** Near-duplicate fingerprint pairs by Hamming ≤ maxDist over a
    * (doc_id, bh) blockhash table — the SimHash pigeonhole trick on
    * the 60-bit fingerprint ((maxDist+1) bands: a ≤maxDist-bit
    * difference leaves ≥1 band intact), so the only corpus-sized join
    * is a band-key equi-join. On byte-level text blobs small edits
    * shift every block and Hamming stays high (MultimodalSpec shows
    * the discrimination on structured blobs); with a real pixel
    * decoder this runs over luminance-block hashes where near-dup
    * images land within a few bits. */
  def blockhashPairs(sigs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 30,
      "pigeonhole banding needs 0 <= maxDist < 30 (60-bit hash, bands need >= 2 bits)")
    val nBands = maxDist + 1
    val width = 60 / nBands
    val mask = (1L << width) - 1
    val banded = sigs.select(col("doc_id"), col("bh"),
        explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("bits",
        expr(s"shiftrightunsigned(bh, band * $width)").bitwiseAND(lit(mask)))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.bh").bitwiseXOR(col("b.bh"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist) // prune BEFORE the distinct shuffle
      .distinct()
  }

  /** Minimal 54-byte BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) for a
    * `w`×`h` image — deterministic synthetic assets for exercising
    * the REAL header-decode path on a corpus with no image columns.
    * Width little-endian at offset 18, height at 22, exactly where
    * [[HeaderImageDecoder.dims]] reads them back. */
  def bmpHeader(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](54)
    def le(v: Int, off: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
      b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le(54, 2)  // file size (header-only blob)
    le(54, 10) // pixel-array offset
    le(40, 14) // BITMAPINFOHEADER size
    le(w, 18)
    le(h, 22)
    b
  }

  /** Full uncompressed 24-bpp BMP for a `w`×`h` image with pixel
    * colors from `rgb(x, y)` (packed 0xRRGGBB, row 0 = TOP row) —
    * pairs with [[bmpLuminance]] for spec-level known-pixel
    * round-trips. Rows are stored bottom-up (positive height) and
    * padded to 4-byte boundaries per the BMP spec. */
  def bmpImage(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val b = new Array[Byte](54 + rowBytes * h)
    def le(v: Int, off: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
      b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le(b.length, 2)   // file size
    le(54, 10)        // pixel-array offset
    le(40, 14)        // BITMAPINFOHEADER size
    le(w, 18); le(h, 22)
    b(26) = 1         // planes
    b(28) = 24        // bpp
    le(0, 30)         // BI_RGB (uncompressed)
    for (y <- 0 until h; x <- 0 until w) {
      val c = rgb(x, y)
      val off = 54 + (h - 1 - y) * rowBytes + x * 3 // bottom-up rows, BGR order
      b(off) = (c & 0xff).toByte
      b(off + 1) = ((c >>> 8) & 0xff).toByte
      b(off + 2) = ((c >>> 16) & 0xff).toByte
    }
    b
  }

  /** REAL pure-JVM BMP pixel decode (r11 VERDICT #8): for an
    * uncompressed (BI_RGB) 24- or 32-bpp BMP, returns the per-pixel
    * integer luminance in row-major TOP-DOWN order — BT.601 luma
    * y = (299·R + 587·G + 114·B) div 1000, exact integer math.
    * Handles bottom-up (positive height) and top-down (negative
    * height) row order, 4-byte row padding, and the pixel-array
    * offset from the file header. None for any other container,
    * compression, or a truncated pixel array — callers fall back to
    * byte-level features rather than failing the task. */
  def bmpLuminance(b: Array[Byte]): Option[Array[Long]] = {
    def leInt(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def leShort(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val pixOff = leInt(10)
    if (leInt(14) < 40) return None // pre-BITMAPINFOHEADER variants
    val w = leInt(18)
    val hRaw = leInt(22)
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val bpp = leShort(28)
    val comp = leInt(30)
    if (w <= 0 || h == 0 || comp != 0 || (bpp != 24 && bpp != 32)) return None
    val px = bpp / 8
    val rowBytes = (w * px + 3) & ~3
    if (pixOff < 54 || pixOff.toLong + rowBytes.toLong * h > b.length) return None
    val out = new Array[Long](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val off = pixOff + srcRow * rowBytes + x * px
        val bl = b(off) & 0xffL
        val g = b(off + 1) & 0xffL
        val r = b(off + 2) & 0xffL
        out(y * w + x) = (299L * r + 587L * g + 114L * bl) / 1000L
        x += 1
      }
      y += 1
    }
    Some(out)
  }

  // ---------------------------------------------------------------
  // PNG: real pure-JVM pixel decode (r12 VERDICT #2). The container's
  // codec stack (zlib) ships with the JDK — java.util.zip — so unlike
  // JPEG/WebP there is nothing to stub: IDAT inflate + the five
  // scanline filters IS the full decode for the dominant lossless web
  // container.
  // ---------------------------------------------------------------

  private val pngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def crc32(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue.toInt
  }

  /** PNG scanline filter application (encode direction), filter types
    * 0-4 (None/Sub/Up/Average/Paeth) per the PNG spec §6. `cur` is the
    * raw scanline (no filter byte), `prior` the raw previous scanline
    * (zeros for row 0), `bpp` bytes per pixel. Returns the filtered
    * bytes; [[pngLuminance]] inverts every type, so fixtures encoded
    * with a mix of filters prove the de-filter math, not just type 0. */
  private def pngFilter(ft: Int, cur: Array[Byte], prior: Array[Byte],
                        bpp: Int): Array[Byte] = {
    val n = cur.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = cur(i) & 0xff
      val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
      val b = prior(i) & 0xff
      val c = if (i >= bpp) prior(i - bpp) & 0xff else 0
      out(i) = (ft match {
        case 0 => x
        case 1 => x - a
        case 2 => x - b
        case 3 => x - (a + b) / 2
        case 4 =>
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
          val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          x - pred
      }).toByte
      i += 1
    }
    out
  }

  /** Full valid PNG for a `w`×`h` image with pixel colors from
    * `rgb(x, y)` (packed 0xRRGGBB, row 0 = TOP row; PNG is natively
    * top-down). 8-bit, color type 2 (RGB) or 6 (RGBA, alpha 255 —
    * luma-neutral). Each row `y` is filtered with type
    * `(y + filterSeed) % 5`, so a corpus of these exercises every
    * de-filter branch of [[pngLuminance]]. Deterministic: fixed-level
    * Deflater, no timestamps. */
  def pngImage(w: Int, h: Int, rgb: (Int, Int) => Int,
               alpha: Boolean = false, filterSeed: Int = 0): Array[Byte] = {
    val bpp = if (alpha) 4 else 3
    // raw filtered stream: per row one filter-type byte + filtered bytes
    val raw = new java.io.ByteArrayOutputStream(h * (1 + w * bpp))
    var prior = new Array[Byte](w * bpp)
    for (y <- 0 until h) {
      val cur = new Array[Byte](w * bpp)
      for (x <- 0 until w) {
        val c = rgb(x, y)
        cur(x * bpp) = ((c >>> 16) & 0xff).toByte
        cur(x * bpp + 1) = ((c >>> 8) & 0xff).toByte
        cur(x * bpp + 2) = (c & 0xff).toByte
        if (alpha) cur(x * bpp + 3) = 0xff.toByte
      }
      val ft = ((y + filterSeed) % 5 + 5) % 5
      raw.write(ft)
      raw.write(pngFilter(ft, cur, prior, bpp))
      prior = cur
    }
    val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    defl.setInput(raw.toByteArray); defl.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) zBuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val idat = zBuf.toByteArray

    val out = new java.io.ByteArrayOutputStream(64 + idat.length)
    out.write(pngSig, 0, 8)
    def beInt(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(beInt(data.length), 0, 4)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      out.write(beInt(crc32(body, 0, body.length)), 0, 4)
    }
    chunk("IHDR", beInt(w) ++ beInt(h) ++
      Array[Byte](8, if (alpha) 6 else 2, 0, 0, 0))
    // split IDAT in two when possible: decoders must concatenate
    if (idat.length > 1) {
      val cut = idat.length / 2
      chunk("IDAT", idat.slice(0, cut))
      chunk("IDAT", idat.slice(cut, idat.length))
    } else chunk("IDAT", idat)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** REAL pure-JVM PNG pixel decode (r12 VERDICT #2): for an 8-bit,
    * non-interlaced, color-type 2 (RGB) or 6 (RGBA) PNG, returns
    * per-pixel integer luminance in row-major top-down order — the
    * same exact BT.601 rule as [[bmpLuminance]], so the two
    * containers feed one luma path. The full decode pipeline is real:
    * chunk walk (multiple IDATs concatenated), zlib inflate
    * (java.util.zip.Inflater), and all five scanline de-filters
    * (None/Sub/Up/Average/Paeth). None — never a throw — for any
    * other bit depth / color type / interlace, a bad signature or
    * IHDR, a truncated or corrupt IDAT stream, or an inflate that
    * yields the wrong byte count: mixed corpora degrade to byte-level
    * features instead of failing the task. CRCs are NOT verified
    * (inflate integrity subsumes pixel correctness; web crawls are
    * full of CRC-sloppy encoders). */
  def pngLuminance(b: Array[Byte]): Option[Array[Long]] = {
    if (b.length < 8 + 25 || !pngSig.indices.forall(i => b(i) == pngSig(i)))
      return None
    def beInt(off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    // IHDR must be the first chunk
    if (beInt(8) != 13 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return None
    val w = beInt(16); val h = beInt(20)
    val bitDepth = b(24) & 0xff; val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0 ||
      (colorType != 2 && colorType != 6)) return None
    val bpp = if (colorType == 6) 4 else 3
    if (w.toLong * h > (1L << 28)) return None // 256M-pixel sanity bound
    // walk chunks, concatenating IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8 + 25
    var sawEnd = false
    while (!sawEnd) {
      if (off + 8 > b.length) return None // truncated chunk header
      val len = beInt(off)
      if (len < 0 || off + 12L + len > b.length) return None // truncated data
      val typ = new String(b, off + 4, 4, "US-ASCII")
      if (typ == "IDAT") idat.write(b, off + 8, len)
      if (typ == "IEND") sawEnd = true
      off += 12 + len
    }
    val expect = h.toLong * (1L + w.toLong * bpp)
    if (expect > Int.MaxValue) return None
    val rawZ = idat.toByteArray
    if (rawZ.isEmpty) return None
    val raw = new Array[Byte](expect.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(rawZ)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated zlib stream
        got += n
      }
      if (got != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None // corrupt stream
    } finally inf.end()
    // de-filter scanlines in place (prior row already reconstructed)
    val stride = 1 + w * bpp
    val out = new Array[Long](w * h)
    var y = 0
    while (y < h) {
      val rowOff = y * stride + 1
      val priorOff = rowOff - stride
      val ft = raw(y * stride) & 0xff
      if (ft > 4) return None
      var i = 0
      while (i < w * bpp) {
        val a = if (i >= bpp) raw(rowOff + i - bpp) & 0xff else 0
        val up = if (y > 0) raw(priorOff + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) raw(priorOff + i - bpp) & 0xff else 0
        val x = raw(rowOff + i) & 0xff
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + (a + up) / 2
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        raw(rowOff + i) = (v & 0xff).toByte
        i += 1
      }
      var px = 0
      while (px < w) {
        val o = rowOff + px * bpp
        out(y * w + px) = (299L * (raw(o) & 0xffL) + 587L * (raw(o + 1) & 0xffL) +
          114L * (raw(o + 2) & 0xffL)) / 1000L
        px += 1
      }
      y += 1
    }
    Some(out)
  }

  // ---------------------------------------------------------------
  // WAV: real pure-JVM PCM16 decode (r12 VERDICT #6) — the audio twin
  // of the BMP/PNG milestones. RIFF is a plain chunk container and
  // PCM16 needs no codec, so header+sample parse IS the full decode.
  // ---------------------------------------------------------------

  /** Real RIFF/WAVE file: canonical "fmt " (PCM, 16-bit) + "data"
    * chunks, channels interleaved little-endian. `junkChunk` inserts a
    * LIST chunk (with odd length, exercising RIFF word-alignment)
    * between fmt and data, so decoders that assume data follows fmt
    * directly — instead of walking chunks — break on the fixtures. */
  def wavPcm16(sampleRate: Int, channels: Int, samples: Array[Short],
               junkChunk: Boolean = false): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0)
    val junk = if (junkChunk) Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'I', 'N', 'F', 'O', 'x', 0) // 5-byte payload + pad to even
    else Array.empty[Byte]
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + junk.length + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + junk.length + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    b.put(junk)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => b.putShort(s))
    b.array()
  }

  /** REAL pure-JVM WAV decode: RIFF chunk walk (word-aligned — odd
    * chunk sizes pad one byte), "fmt " parse, PCM16 sample read, and
    * an exact integer mono mixdown (channel sum / channel count,
    * truncating toward zero — the division both engines agree on).
    * Returns (sampleRate, channels, monoSamples). None — never a
    * throw — for non-RIFF/WAVE bytes, compressed or non-16-bit
    * formats, a missing fmt/data chunk, zero/absurd channel counts,
    * or a data chunk that overruns the file: mixed corpora degrade to
    * byte-level features instead of failing the task. */
  def wavSamples(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 44) return None
    def tag(off: Int, s: String) =
      s.indices.forall(i => b(off + i) == s(i).toByte)
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    def leInt(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def leShort(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    var off = 12
    var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
    while (off + 8 <= b.length) {
      val size = leInt(off + 4)
      if (size < 0 || off + 8L + size > b.length) return None // overrun
      if (tag(off, "fmt ")) {
        if (size < 16) return None
        val audioFormat = leShort(off + 8)
        val channels = leShort(off + 10)
        val rate = leInt(off + 12)
        val bits = leShort(off + 22)
        if (audioFormat != 1 || bits != 16 ||
          channels < 1 || channels > 8 || rate <= 0) return None
        fmt = Some((channels, rate))
      } else if (tag(off, "data")) {
        if (fmt.isEmpty) return None // fmt must precede data
        val (channels, rate) = fmt.get
        val frames = size / (2 * channels)
        val out = new Array[Int](frames)
        var f = 0
        while (f < frames) {
          var sum = 0
          var c = 0
          while (c < channels) {
            val o = off + 8 + (f * channels + c) * 2
            sum += leShort(o).toShort.toInt // sign-extend LE int16
            c += 1
          }
          out(f) = sum / channels // truncates toward zero, both engines
          f += 1
        }
        return Some((rate, channels, out))
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    None
  }

  /** [[frameBandEnergy]] over DECODED PCM samples instead of raw
    * bytes: frames of `frameSize` samples, `nBands` equal slices,
    * energy = Σ s² of the signed 16-bit samples (fits a long:
    * 32768² × frame ≪ 2⁶³). Short final frames keep their real
    * residue; bands past the end are 0. */
  def sampleBandEnergy(samples: Array[Int], frameSize: Int,
                       nBands: Int): Array[Array[Long]] = {
    require(frameSize > 0 && nBands > 0 && frameSize % nBands == 0)
    val bandSize = frameSize / nBands
    val frames = (samples.length + frameSize - 1) / frameSize
    Array.tabulate(frames) { f =>
      Array.tabulate(nBands) { band =>
        val lo = f * frameSize + band * bandSize
        val end = math.min(lo + bandSize, samples.length)
        var sum = 0L
        var i = lo
        while (i < end) { sum += samples(i).toLong * samples(i); i += 1 }
        sum
      }
    }
  }

  /** [[blockHash60]] generalized to any integer sample sequence —
    * blocks over samples instead of raw bytes, identical bit rule
    * (block mean > global mean, exact cross-multiplied integers). */
  def blockHash60Samples(vals: Array[Long]): Long = {
    val n = vals.length
    if (n == 0) return 0L
    val sums = new Array[Long](60)
    val cnts = new Array[Long](60)
    var total = 0L
    var i = 0
    while (i < n) {
      val k = ((i.toLong * 60) / n).toInt
      sums(k) += vals(i)
      cnts(k) += 1
      total += vals(i)
      i += 1
    }
    var h = 0L
    var k = 0
    while (k < 60) { if (sums(k) * n > total * cnts(k)) h |= 1L << k; k += 1 }
    h
  }

  // ---------------------------------------------------------------
  // Compressed audio: G.711 μ-law (ITU-T G.711 — the stateless 8-bit
  // companding every telephony corpus ships in) and IMA/DVI ADPCM
  // (the classic 4-bit predictive WAV codec, fmt tag 0x11). Both
  // implemented from the public specs, both directions — the audio
  // analog of the MJPEG milestone: WAV was container-only (PCM16),
  // these add real codecs behind the same chunk walk.
  // ---------------------------------------------------------------

  /** G.711 μ-law encode: signed 16-bit sample → 8-bit codeword.
    * Classic bias-132/clip-32635 segment search (G.711 Table 2a). */
  def ulawEncode(sample: Int): Int = {
    val Bias = 0x84; val Clip = 32635
    var s = sample
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > Clip) s = Clip
    s += Bias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mantissa = (s >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mantissa) & 0xff
  }

  /** G.711 μ-law decode: 8-bit codeword → signed 16-bit sample. Pure
    * table math, stateless — decode(encode(s)) == s exactly on the
    * codec's 255 representable magnitudes. */
  def ulawDecode(u0: Int): Int = {
    val u = ~u0 & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** RIFF/WAVE with μ-law payload (fmt tag 7, 8 bits/sample),
    * channels interleaved, optional junk LIST chunk like
    * [[wavPcm16]]. Samples are int16 values, companded here. */
  def wavUlaw(sampleRate: Int, channels: Int, samples: Array[Int],
              junkChunk: Boolean = false): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0)
    val junk = if (junkChunk) Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'I', 'N', 'F', 'O', 'x', 0)
    else Array.empty[Byte]
    val dataLen = samples.length
    val b = java.nio.ByteBuffer.allocate(46 + junk.length + dataLen + (dataLen & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
      .putInt(38 + junk.length + dataLen + (dataLen & 1))
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(7) // μ-law
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels) // byte rate: 1 byte/sample
      .putShort(channels.toShort)    // block align
      .putShort(8)                   // bits per sample
      .putShort(0)                   // cbSize (G.711 carries none)
    b.put(junk)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => b.put(ulawEncode(s).toByte))
    if ((dataLen & 1) == 1) b.put(0.toByte) // RIFF word alignment
    b.array()
  }

  /** IMA/DVI ADPCM step-size table (89 entries, IMA ADPCM reference). */
  val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** IMA index-adjust table (per 3-bit magnitude). */
  val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clamp16(v: Int): Int = math.max(-32768, math.min(32767, v))

  /** One IMA decode step: (pred, index, nibble) → (pred', index'). */
  private def imaStep(pred: Int, index: Int, n: Int): (Int, Int) = {
    val step = ImaStepTable(index)
    var diff = step >> 3
    if ((n & 1) != 0) diff += step >> 2
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 4) != 0) diff += step
    val p = clamp16(if ((n & 8) != 0) pred - diff else pred + diff)
    val i = math.max(0, math.min(88, index + ImaIndexTable(n & 7)))
    (p, i)
  }

  /** IMA ADPCM mono encode into standard WAV blocks: per block a
    * 4-byte header (int16 predictor = the block's first sample
    * verbatim, step index, reserved) then `spb - 1` nibbles packed
    * low-first. Each block restarts at index 0 with its own exact
    * first sample, so a per-block-constant signal round-trips
    * EXACTLY (nibble 0 at step 7 decodes to +0) — the audio analog
    * of the constant-cell JPEG oracle trick; arbitrary signals decode
    * within the codec's tracking error. `samples.length` must be a
    * whole number of blocks. */
  def imaEncodeMono(samples: Array[Int], spb: Int): Array[Byte] = {
    require(spb >= 3 && spb % 2 == 1, s"samplesPerBlock $spb must be odd ≥ 3")
    require(samples.nonEmpty && samples.length % spb == 0,
      s"need whole blocks of $spb samples, got ${samples.length}")
    val blockBytes = 4 + (spb - 1) / 2
    val out = new Array[Byte]((samples.length / spb) * blockBytes)
    var o = 0
    var base = 0
    while (base < samples.length) {
      var pred = clamp16(samples(base))
      var index = 0
      out(o) = (pred & 0xff).toByte; out(o + 1) = ((pred >> 8) & 0xff).toByte
      out(o + 2) = index.toByte; out(o + 3) = 0
      o += 4
      var k = 1
      while (k < spb) {
        val step = ImaStepTable(index)
        var diff = samples(base + k) - pred
        var n = 0
        if (diff < 0) { n = 8; diff = -diff }
        if (diff >= step) { n |= 4; diff -= step }
        if (diff >= (step >> 1)) { n |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) { n |= 1 }
        val (p2, i2) = imaStep(pred, index, n) // encoder mirrors decoder
        pred = p2; index = i2
        if ((k & 1) == 1) out(o + (k - 1) / 2) = (n & 0x0f).toByte
        else out(o + (k - 1) / 2) = (out(o + (k - 1) / 2) | (n << 4)).toByte
        k += 1
      }
      o += (spb - 1) / 2
      base += spb
    }
    out
  }

  /** IMA ADPCM mono decode of [[imaEncodeMono]]-shaped blocks. */
  def imaDecodeMono(data: Array[Byte], from: Int, len: Int, spb: Int): Array[Int] = {
    val blockBytes = 4 + (spb - 1) / 2
    require(len % blockBytes == 0, s"ADPCM payload $len not whole $blockBytes-byte blocks")
    val nBlocks = len / blockBytes
    val out = new Array[Int](nBlocks * spb)
    var b = 0
    while (b < nBlocks) {
      val o = from + b * blockBytes
      var pred = ((data(o) & 0xff) | ((data(o + 1) & 0xff) << 8)).toShort.toInt
      var index = math.max(0, math.min(88, data(o + 2) & 0xff))
      out(b * spb) = pred
      var k = 1
      while (k < spb) {
        val byte = data(o + 4 + (k - 1) / 2) & 0xff
        val n = if ((k & 1) == 1) byte & 0x0f else byte >> 4
        val (p2, i2) = imaStep(pred, index, n)
        pred = p2; index = i2
        out(b * spb + k) = pred
        k += 1
      }
      b += 1
    }
    out
  }

  /** RIFF/WAVE with IMA ADPCM payload (fmt tag 0x11, mono): fmt
    * carries the cbSize=2 samples-per-block extension, a `fact`
    * chunk records the true sample count (mandatory for compressed
    * WAV), data is whole [[imaEncodeMono]] blocks. */
  def wavImaAdpcm(sampleRate: Int, samples: Array[Int], spb: Int = 65): Array[Byte] = {
    val payload = imaEncodeMono(samples, spb)
    val blockAlign = 4 + (spb - 1) / 2
    val b = java.nio.ByteBuffer
      .allocate(12 + 8 + 20 + 8 + 4 + 8 + payload.length + (payload.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 8 + 20 + 8 + 4 + 8 + payload.length + (payload.length & 1))
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11) // IMA ADPCM
      .putShort(1)    // mono
      .putInt(sampleRate)
      .putInt((sampleRate.toLong * blockAlign / spb).toInt) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(4)    // bits per sample
      .putShort(2)    // cbSize
      .putShort(spb.toShort)
    b.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    b.put("data".getBytes("US-ASCII")).putInt(payload.length)
    b.put(payload)
    if ((payload.length & 1) == 1) b.put(0.toByte)
    b.array()
  }

  /** [[wavSamples]] extended to the compressed formats: returns
    * (sampleRate, channels, fmtTag, monoSamples) for PCM16 (tag 1),
    * μ-law (tag 7, 8-bit, any channel count — same exact integer
    * mixdown as PCM16) and IMA ADPCM (tag 0x11, mono). Same RIFF
    * discipline as [[wavSamples]]: word-aligned chunk walk, fmt
    * before data, overrun checks, None — never a throw — for
    * anything else. */
  def wavSamplesEx(b: Array[Byte]): Option[(Int, Int, Int, Array[Int])] = {
    if (b.length < 44) return None
    def tag(off: Int, s: String) =
      s.indices.forall(i => b(off + i) == s(i).toByte)
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    def leInt(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def leShort(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    var off = 12
    // (fmtTag, channels, rate, samplesPerBlock)
    var fmt: Option[(Int, Int, Int, Int)] = None
    while (off + 8 <= b.length) {
      val size = leInt(off + 4)
      if (size < 0 || off + 8L + size > b.length) return None
      if (tag(off, "fmt ")) {
        if (size < 16) return None
        val audioFormat = leShort(off + 8)
        val channels = leShort(off + 10)
        val rate = leInt(off + 12)
        val bits = leShort(off + 22)
        if (channels < 1 || channels > 8 || rate <= 0) return None
        audioFormat match {
          case 1 if bits == 16 => fmt = Some((1, channels, rate, 0))
          case 7 if bits == 8 => fmt = Some((7, channels, rate, 0))
          case 0x11 if bits == 4 && channels == 1 =>
            if (size < 20) return None
            val spb = leShort(off + 26)
            if (spb < 3 || spb % 2 == 0) return None
            fmt = Some((0x11, 1, rate, spb))
          case _ => return None
        }
      } else if (tag(off, "data")) {
        if (fmt.isEmpty) return None
        val (t, channels, rate, spb) = fmt.get
        val mono: Array[Int] = t match {
          case 1 =>
            val frames = size / (2 * channels)
            Array.tabulate(frames) { f =>
              var sum = 0; var c = 0
              while (c < channels) {
                val o = off + 8 + (f * channels + c) * 2
                sum += leShort(o).toShort.toInt; c += 1
              }
              sum / channels
            }
          case 7 =>
            val frames = size / channels
            Array.tabulate(frames) { f =>
              var sum = 0; var c = 0
              while (c < channels) {
                sum += ulawDecode(b(off + 8 + f * channels + c) & 0xff); c += 1
              }
              sum / channels
            }
          case _ =>
            val blockBytes = 4 + (spb - 1) / 2
            if (size % blockBytes != 0) return None
            imaDecodeMono(b, off + 8, size, spb)
        }
        return Some((rate, channels, t, mono))
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  // ---------------------------------------------------------------
  // GIF: real pure-JVM pixel decode — LZW is the entire codec and it
  // is plain bit-twiddling, so like PNG (JDK zlib) and WAV (no codec)
  // there is nothing to stub for the third classic web container.
  // Reference behavior: GIF89a spec §§18-23 (logical screen, color
  // table, image descriptor incl. 4-pass interlace, variable-width
  // LZW with CLEAR/EOI).
  // ---------------------------------------------------------------

  /** GIF87a/89a 4-pass interlace row order for an `h`-row image: the
    * order rows are STORED in the stream (pass 1 = every 8th from row
    * 0, pass 2 = every 8th from row 4, pass 3 = every 4th from row 2,
    * pass 4 = every 2nd from row 1). */
  private def gifInterlaceRows(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var n = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until h by step) {
      out(n) = y; n += 1
    }
    out
  }

  /** Real variable-width GIF LZW compression of a stream of 8-bit
    * palette indices (min code size 8: CLEAR=256, EOI=257, first
    * dynamic code 258, widths 9→12, CLEAR emitted when the table
    * fills). Returns the raw code bytes (LSB-first bit packing per
    * the GIF spec), NOT yet sliced into sub-blocks. */
  private def gifLzwEncode(indices: Array[Byte]): Array[Byte] = {
    val ClearCode = 256; val EoiCode = 257
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 16)
    var bitBuf = 0L; var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    // dict over (prefixCode << 8 | nextByte) — prefix fits 12 bits
    var dict = new java.util.HashMap[Integer, Integer](8192)
    var next = 258
    emit(ClearCode)
    var cur = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = Integer.valueOf((cur << 8) | k)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (next < 4096) {
          dict.put(key, Integer.valueOf(next))
          next += 1
          // decoder bumps width when ITS next slot reaches 1<<width;
          // its slot counter trails the encoder's by one code, so the
          // encoder bumps after assigning code value (1<<width) — the
          // classic off-by-one both sides must agree on.
          if (next == (1 << width) + 1 && width < 12) width += 1
        } else {
          emit(ClearCode)
          dict = new java.util.HashMap[Integer, Integer](8192)
          next = 258
          width = 9
        }
        cur = k
      }
      i += 1
    }
    emit(cur)
    emit(EoiCode)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** Full valid GIF89a for a `w`×`h` image whose pixels index a
    * 256-entry grayscale global color table via `idx(x, y)` (0-255;
    * palette entry v = (v,v,v), so BT.601 luma == v exactly). The LZW
    * stream is REAL variable-width compression ([[gifLzwEncode]]),
    * sliced into ≤255-byte data sub-blocks. `interlaced` stores rows
    * in the 4-pass order (decoders must de-interlace); `comment`
    * inserts an 89a comment-extension block before the image
    * (decoders must skip extensions by walking sub-blocks).
    * Deterministic: no timestamps, fixed palette. */
  def gifImage(w: Int, h: Int, idx: (Int, Int) => Int,
               interlaced: Boolean = false, comment: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && w < 65536 && h < 65536)
    val out = new java.io.ByteArrayOutputStream(64 + 768 + w * h / 2)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xF7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // no aspect ratio
    for (v <- 0 until 256) { out.write(v); out.write(v); out.write(v) } // gray GCT
    if (comment) {
      out.write(0x21); out.write(0xFE) // comment extension
      val msg = "graft synthetic fixture".getBytes("US-ASCII")
      out.write(msg.length); out.write(msg)
      out.write(0) // block terminator
    }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0x00) // no LCT; interlace bit
    val rows = if (interlaced) gifInterlaceRows(h) else Array.range(0, h)
    val indices = new Array[Byte](w * h)
    var n = 0
    for (y <- rows; x <- 0 until w) { indices(n) = (idx(x, y) & 0xff).toByte; n += 1 }
    out.write(8) // LZW minimum code size
    val lzw = gifLzwEncode(indices)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len); out.write(lzw, off, len)
      off += len
    }
    out.write(0)    // data terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** REAL pure-JVM GIF pixel decode of the FIRST image frame: returns
    * per-pixel integer luminance (exact BT.601, same rule as
    * [[bmpLuminance]] / [[pngLuminance]]) in row-major TOP-DOWN
    * order — 4-pass interlace de-interlaced, extensions skipped by
    * sub-block walking, global OR local color table, and the full
    * variable-width LZW decode (CLEAR resets, EOI, the deferred
    * 4096-table-full state, width growth at slot 2^w). None — never a
    * throw — for a bad signature, no usable color table, image bounds
    * outside the logical screen, a truncated stream, or LZW codes out
    * of range: mixed corpora degrade to byte-level features instead of
    * failing the task. */
  def gifLuminance(b: Array[Byte]): Option[Array[Long]] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    val screenW = le16(6); val screenH = le16(8)
    val packed = b(10) & 0xff
    var off = 13
    def colorTable(at: Int, size: Int): Option[Array[Int]] = {
      if (at + 3 * size > b.length) return None
      Some(Array.tabulate(size) { i =>
        ((b(at + 3 * i) & 0xff) << 16) | ((b(at + 3 * i + 1) & 0xff) << 8) |
          (b(at + 3 * i + 2) & 0xff)
      })
    }
    val global: Option[Array[Int]] = if ((packed & 0x80) != 0) {
      val size = 2 << (packed & 7)
      val t = colorTable(off, size)
      if (t.isEmpty) return None
      off += 3 * size
      t
    } else None
    // walk blocks to the first image descriptor, skipping extensions
    while (true) {
      if (off >= b.length) return None
      (b(off) & 0xff) match {
        case 0x3B => return None // trailer before any image
        case 0x21 => // extension: label byte then sub-blocks
          off += 2
          while ({
            if (off >= b.length) return None
            val len = b(off) & 0xff
            off += 1 + len
            len != 0
          }) ()
        case 0x2C =>
          if (off + 10 > b.length) return None
          val left = le16(off + 1); val top = le16(off + 3)
          val w = le16(off + 5); val h = le16(off + 7)
          val flags = b(off + 9) & 0xff
          off += 10
          val palette: Array[Int] =
            if ((flags & 0x80) != 0) { // local color table overrides
              val size = 2 << (flags & 7)
              val t = colorTable(off, size).getOrElse(return None)
              off += 3 * size
              t
            } else global.getOrElse(return None) // no usable color table
          val interlaced = (flags & 0x40) != 0
          if (w <= 0 || h <= 0 || left + w > screenW || top + h > screenH)
            return None
          if (w.toLong * h > (1L << 28)) return None // 256M-pixel sanity bound
          if (off >= b.length) return None
          val minCode = b(off) & 0xff
          off += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream(w * h / 2 + 16)
          var done = false
          while (!done) {
            if (off >= b.length) return None
            val len = b(off) & 0xff
            if (len == 0) done = true
            else {
              if (off + 1 + len > b.length) return None
              data.write(b, off + 1, len)
            }
            off += 1 + len
          }
          val lzw = data.toByteArray
          val indices = gifLzwDecode(lzw, minCode, w * h).getOrElse(return None)
          val rows = if (interlaced) gifInterlaceRows(h) else Array.range(0, h)
          val out = new Array[Long](w * h)
          var n = 0
          var r = 0
          while (r < h) {
            val y = rows(r)
            var x = 0
            while (x < w) {
              val pi = indices(n) & 0xff
              if (pi >= palette.length) return None
              val c = palette(pi)
              out(y * w + x) = (299L * ((c >>> 16) & 0xff) +
                587L * ((c >>> 8) & 0xff) + 114L * (c & 0xff)) / 1000L
              n += 1; x += 1
            }
            r += 1
          }
          return Some(out)
        case _ => return None // unknown block type
      }
    }
    None // unreachable
  }

  /** Variable-width GIF LZW decode of `expected` indices from raw code
    * bytes (LSB-first). Handles CLEAR resets, EOI, deferred-clear when
    * the table fills, and width growth when the next slot reaches
    * 2^width. None on out-of-range codes or a stream that ends short. */
  private def gifLzwDecode(lzw: Array[Byte], minCode: Int,
                           expected: Int): Option[Array[Byte]] = {
    val clearCode = 1 << minCode
    val eoiCode = clearCode + 1
    val out = new Array[Byte](expected)
    var got = 0
    // dictionary as (prefix, suffix) arrays; entries < clearCode are roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = eoiCode + 1
    var width = minCode + 1
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var prev = -1
    val stack = new Array[Byte](4096)
    def readCode(): Int = {
      while (bitCnt < width) {
        if (pos >= lzw.length) return -1
        bitBuf |= (lzw(pos) & 0xffL) << bitCnt
        bitCnt += 8; pos += 1
      }
      val c = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      c
    }
    while (got < expected) {
      val code = readCode()
      if (code < 0 || code == eoiCode) return None // short stream
      if (code == clearCode) {
        next = eoiCode + 1; width = minCode + 1; prev = -1
      } else {
        if (code >= next && !(code == next && prev >= 0)) return None
        var sp = 0
        var c = if (code == next) prev else code // KwKwK case starts from prev
        while (c >= clearCode + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= clearCode) return None // dangling dynamic code
        val first = c.toByte
        if (got < expected) { out(got) = first; got += 1 }
        while (sp > 0 && got < expected) { sp -= 1; out(got) = stack(sp); got += 1 }
        if (code == next && got < expected) { out(got) = first; got += 1 }
        // a stream encoding MORE pixels than w*h just stops at w*h,
        // like every tolerant decoder — the fixtures never hit this
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  // ---------------------------------------------------------------
  // AVI: real pure-JVM VIDEO container decode — RIFF LISTs
  // (hdrl/strl/movi) wrapping raw 24-bpp DIB frames. Reuses WAV's
  // word-aligned chunk-walk discipline and BMP's raster rules
  // (bottom-up BGR rows, 4-byte stride padding); uncompressed 'DIB '
  // video needs no codec, so header+frame parse IS the full decode.
  // ---------------------------------------------------------------

  /** Real RIFF/AVI file with one uncompressed 24-bpp 'vids' stream:
    * LIST hdrl (avih + LIST strl (strh 'vids'/'DIB ' + strf
    * BITMAPINFOHEADER)), an optional odd-length JUNK chunk between
    * hdrl and movi (word-aligned walking, not offset arithmetic),
    * LIST movi with one '00db' raw-DIB chunk per frame (bottom-up BGR
    * rows padded to 4 bytes — the BMP pixel-array layout), and a
    * trailing idx1 index. `pix(f, x, y)` is packed 0xRRGGBB with row 0
    * = TOP row. Deterministic: no timestamps. */
  def aviRawVideo(w: Int, h: Int, frames: Int, pix: (Int, Int, Int) => Int,
                  junk: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0)
    val rowBytes = (w * 3 + 3) & ~3
    val frameBytes = rowBytes * h
    val out = new java.io.ByteArrayOutputStream(512 + frames * (8 + frameBytes))
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    // sizes, computed inside-out
    val strhSize = 56; val strfSize = 40
    val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
    val avihSize = 56
    val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize)
    val junkPayload = if (junk) 7 else 0 // odd on purpose
    val moviSize = 4 + frames * (8 + frameBytes)
    val idx1Size = frames * 16
    val riffSize = 4 + (8 + hdrlSize) +
      (if (junk) 8 + junkPayload + 1 else 0) + (8 + moviSize) + (8 + idx1Size)
    tag("RIFF"); le32(riffSize); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(avihSize)
    le32(40000)            // dwMicroSecPerFrame (25 fps)
    le32(frameBytes * 25)  // dwMaxBytesPerSec
    le32(0); le32(0x10)    // padding, AVIF_HASINDEX
    le32(frames); le32(0)  // dwTotalFrames, dwInitialFrames
    le32(1)                // dwStreams
    le32(frameBytes)       // dwSuggestedBufferSize
    le32(w); le32(h)
    le32(0); le32(0); le32(0); le32(0) // reserved
    tag("LIST"); le32(strlSize); tag("strl")
    tag("strh"); le32(strhSize)
    tag("vids"); tag("DIB ")
    le32(0); le16(0); le16(0) // flags, priority, language
    le32(0)                   // initial frames
    le32(1); le32(25)         // scale, rate (25 fps)
    le32(0); le32(frames)     // start, length
    le32(frameBytes); le32(-1) // bufSize, quality
    le32(0)                   // sample size
    le16(0); le16(0); le16(w); le16(h) // rcFrame
    tag("strf"); le32(strfSize)
    le32(40); le32(w); le32(h)
    le16(1); le16(24)          // planes, bpp
    le32(0)                    // BI_RGB
    le32(frameBytes)
    le32(0); le32(0); le32(0); le32(0)
    if (junk) {
      tag("JUNK"); le32(junkPayload)
      out.write(Array.fill[Byte](junkPayload)('j'), 0, junkPayload)
      out.write(0) // word-align pad
    }
    tag("LIST"); le32(moviSize); tag("movi")
    for (f <- 0 until frames) {
      tag("00db"); le32(frameBytes)
      val fr = new Array[Byte](frameBytes)
      for (y <- 0 until h; x <- 0 until w) {
        val c = pix(f, x, y)
        val off = (h - 1 - y) * rowBytes + x * 3 // bottom-up, BGR
        fr(off) = (c & 0xff).toByte
        fr(off + 1) = ((c >>> 8) & 0xff).toByte
        fr(off + 2) = ((c >>> 16) & 0xff).toByte
      }
      out.write(fr, 0, frameBytes)
    }
    tag("idx1"); le32(idx1Size)
    var moviOff = 4 // offsets within movi LIST, from its 'movi' tag
    for (_ <- 0 until frames) {
      tag("00db"); le32(0x10) // AVIIF_KEYFRAME
      le32(moviOff); le32(frameBytes)
      moviOff += 8 + frameBytes
    }
    out.toByteArray
  }

  /** REAL pure-JVM AVI decode: walks the RIFF tree (word-aligned),
    * parses avih for dimensions, verifies the first stream is
    * uncompressed 24-bpp 'vids' via strf, then decodes every raw-DIB
    * '00db' movi chunk into per-pixel BT.601 luminance (top-down
    * row-major — the same exact rule as the BMP/PNG/GIF decoders).
    * Returns (w, h, one luma array per frame). None — never a throw —
    * for a bad signature, compressed or non-24-bpp streams, missing
    * hdrl/avih/strf/movi, a frame chunk of the wrong size, or any
    * truncation: mixed corpora degrade to byte-level features. */
  /** Parsed AVI header + frame index, shared by the raw-DIB and MJPEG
    * decoders: dimensions from avih; the VIDEO stream's bpp and
    * biCompression from the strf that follows the first 'vids' strh
    * (latched once — a later stream's strf, e.g. an audio
    * WAVEFORMATEX, must not overwrite the video format:
    * last-writer-wins rejected valid video+audio files); and the
    * (offset, length) of THAT stream's frame chunks — the chunk id's
    * two-digit stream number must match the vids stream's strl
    * position (an audio-first file numbers its video chunks '01xx',
    * not '00xx'), with `frameSuffix` picking raw ("db") vs compressed
    * ("dc") payloads. None for a bad signature, tree overrun, missing
    * header, zero frames, or a >64M-pixel frame. */
  private final case class AviStreamInfo(w: Int, h: Int, vidsBpp: Int,
                                         vidsCompression: Int,
                                         frames: Seq[(Int, Int)])

  private def aviWalk(b: Array[Byte], frameSuffix: String): Option[AviStreamInfo] = {
    if (b.length < 12) return None
    def tagAt(off: Int, s: String) =
      off + s.length <= b.length && s.indices.forall(i => b(off + i) == s(i).toByte)
    def le32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def digitAt(off: Int): Int = {
      val c = b(off) & 0xff
      if (c >= '0' && c <= '9') c - '0' else -1
    }
    if (!tagAt(0, "RIFF") || !tagAt(8, "AVI ")) return None
    var w = -1; var h = -1; var bpp = -1; var compression = -1
    var pendingVids = false // the next strf belongs to the 'vids' stream
    var streamIdx = -1      // strl position of the stream being parsed
    var vidsIdx = -1        // strl position of the FIRST 'vids' stream
    // (streamNo, off, len) of every NN<suffix> chunk; filtered to the
    // vids stream's number after the walk
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    // walk a chunk range [from, to); recurse into LISTs
    def walk(from: Int, to: Int): Boolean = {
      var off = from
      while (off + 8 <= to) {
        val size = le32(off + 4)
        if (size < 0 || off + 8L + size > to) return false // overrun
        if (tagAt(off, "LIST")) {
          if (size < 4) return false
          if (!walk(off + 12, off + 8 + size)) return false
        } else if (tagAt(off, "avih")) {
          if (size < 40) return false
          w = le32(off + 8 + 32); h = le32(off + 8 + 36)
        } else if (tagAt(off, "strh")) {
          if (size < 4) return false
          streamIdx += 1
          pendingVids = tagAt(off + 8, "vids") && vidsIdx < 0
          if (pendingVids) vidsIdx = streamIdx
        } else if (tagAt(off, "strf")) {
          if (pendingVids) {
            if (size < 20) return false
            bpp = le16(off + 8 + 14); compression = le32(off + 8 + 16)
            pendingVids = false
          }
        } else if (digitAt(off) >= 0 && digitAt(off + 1) >= 0 &&
            tagAt(off + 2, frameSuffix)) {
          frames += ((digitAt(off) * 10 + digitAt(off + 1), off + 8, size))
        }
        off += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      true
    }
    if (!walk(12, math.min(b.length, 8L + le32(4)).toInt)) return None
    val vidsFrames = frames.collect { case (s, o, l) if s == vidsIdx => (o, l) }
    if (w <= 0 || h <= 0 || vidsIdx < 0 || vidsFrames.isEmpty) return None
    if (w.toLong * h > (1L << 26)) return None // 64M-pixel frame bound
    Some(AviStreamInfo(w, h, bpp, compression, vidsFrames.toSeq))
  }

  def aviFrameLuma(b: Array[Byte]): Option[(Int, Int, Array[Array[Long]])] = {
    val info = aviWalk(b, "db") match {
      case Some(i) if i.vidsBpp == 24 && i.vidsCompression == 0 => i
      case _ => return None
    }
    val w = info.w; val h = info.h
    val frames = info.frames
    val rowBytes = (w * 3 + 3) & ~3
    if (frames.exists(_._2 != rowBytes * h)) return None // wrong frame size
    val out = frames.map { case (fOff, _) =>
      val lum = new Array[Long](w * h)
      var y = 0
      while (y < h) {
        val rowOff = fOff + (h - 1 - y) * rowBytes // bottom-up rows
        var x = 0
        while (x < w) {
          val o = rowOff + x * 3 // BGR order
          lum(y * w + x) = (299L * (b(o + 2) & 0xffL) +
            587L * (b(o + 1) & 0xffL) + 114L * (b(o) & 0xffL)) / 1000L
          x += 1
        }
        y += 1
      }
      lum
    }.toArray
    Some((w, h, out))
  }

  /** Real RIFF/AVI file carrying a Motion-JPEG ('MJPG') video stream —
    * the compressed-video layout capture pipelines and cheap cameras
    * emit: the same LIST hdrl/strl/movi tree as [[aviRawVideo]], but
    * strh/strf declare MJPG compression and each frame is a COMPLETE
    * baseline JPEG in a '00dc' (compressed-data) chunk. JPEG sizes are
    * arbitrary, so odd-length chunks genuinely exercise RIFF word
    * alignment; idx1 carries the per-frame sizes. */
  def aviMjpegVideo(w: Int, h: Int, frames: Seq[Array[Byte]],
                    junk: Boolean = false,
                    audioStream: Boolean = false,
                    audioFirst: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && frames.nonEmpty)
    // audio declared BEFORE video numbers the video stream 1: its
    // movi chunks are '01dc' — the decoder must follow the strl index
    val hasAudio = audioStream || audioFirst
    val vTag = if (audioFirst) "01dc" else "00dc"
    val maxLen = frames.map(_.length).max
    val out = new java.io.ByteArrayOutputStream(512 + frames.map(_.length + 9).sum)
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    val strhSize = 56; val strfSize = 40
    val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
    // optional second stream (PCM audio, 16-byte WAVEFORMAT strf) —
    // the camera-file shape whose strf must NOT overwrite the video
    // format in a decoder
    val strl2Size = 4 + (8 + strhSize) + (8 + 16)
    val avihSize = 56
    val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize) +
      (if (hasAudio) 8 + strl2Size else 0)
    val junkPayload = if (junk) 7 else 0 // odd on purpose
    val moviSize = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val idx1Size = frames.length * 16
    val riffSize = 4 + (8 + hdrlSize) +
      (if (junk) 8 + junkPayload + 1 else 0) + (8 + moviSize) + (8 + idx1Size)
    tag("RIFF"); le32(riffSize); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(avihSize)
    le32(40000)            // dwMicroSecPerFrame (25 fps)
    le32(maxLen * 25)      // dwMaxBytesPerSec
    le32(0); le32(0x10)    // padding, AVIF_HASINDEX
    le32(frames.length); le32(0)
    le32(if (hasAudio) 2 else 1) // dwStreams
    le32(maxLen)           // dwSuggestedBufferSize
    le32(w); le32(h)
    le32(0); le32(0); le32(0); le32(0) // reserved
    def videoStrl(): Unit = {
      tag("LIST"); le32(strlSize); tag("strl")
      tag("strh"); le32(strhSize)
      tag("vids"); tag("MJPG")
      le32(0); le16(0); le16(0) // flags, priority, language
      le32(0)                   // initial frames
      le32(1); le32(25)         // scale, rate (25 fps)
      le32(0); le32(frames.length) // start, length
      le32(maxLen); le32(-1)    // bufSize, quality
      le32(0)                   // sample size (varies per frame)
      le16(0); le16(0); le16(w); le16(h) // rcFrame
      tag("strf"); le32(strfSize)
      le32(40); le32(w); le32(h)
      le16(1); le16(24)          // planes, bpp
      tag("MJPG")                // biCompression
      le32(maxLen)               // biSizeImage (upper bound, compressed)
      le32(0); le32(0); le32(0); le32(0)
    }
    def audioStrl(): Unit = {
      tag("LIST"); le32(strl2Size); tag("strl")
      tag("strh"); le32(strhSize)
      tag("auds"); le32(0)      // fccType, fccHandler (PCM)
      le32(0); le16(0); le16(0) // flags, priority, language
      le32(0)                   // initial frames
      le32(1); le32(8000)       // scale, rate (8 kHz)
      le32(0); le32(8000)       // start, length (1 s)
      le32(8000); le32(-1)      // bufSize, quality
      le32(1)                   // sample size (8-bit mono PCM)
      le16(0); le16(0); le16(0); le16(0) // rcFrame (unused for audio)
      tag("strf"); le32(16)     // minimal WAVEFORMAT — 16 bytes, and
      le16(1); le16(1)          // its bytes at offset 14-19 are NOT a
      le32(8000); le32(8000)    // video fourcc: a last-writer-wins
      le16(1); le16(8)          // decoder would mis-latch on this
    }
    if (audioFirst) { audioStrl(); videoStrl() }
    else { videoStrl(); if (hasAudio) audioStrl() }
    if (junk) {
      tag("JUNK"); le32(junkPayload)
      out.write(Array.fill[Byte](junkPayload)('j'), 0, junkPayload)
      out.write(0) // word-align pad
    }
    tag("LIST"); le32(moviSize); tag("movi")
    frames.foreach { f =>
      tag(vTag); le32(f.length)
      out.write(f, 0, f.length)
      if ((f.length & 1) == 1) out.write(0) // word-align pad
    }
    tag("idx1"); le32(idx1Size)
    var moviOff = 4
    frames.foreach { f =>
      tag(vTag); le32(0x10) // AVIIF_KEYFRAME
      le32(moviOff); le32(f.length)
      moviOff += 8 + f.length + (f.length & 1)
    }
    out.toByteArray
  }

  /** MJPEG AVI decode, end to end ours: the same word-aligned RIFF
    * walk as [[aviFrameLuma]], but the stream must declare 'MJPG'
    * compression and every '00dc' frame chunk decodes through the
    * from-scratch baseline JPEG pipeline ([[graft.operators.Jpeg
    * .decode]] — marker walk, Huffman, dequant, IDCT). Every frame's
    * dimensions must agree with the container header. None — never a
    * throw — for a bad tree, a non-MJPG stream, an undecodable frame,
    * or a header/frame dimension mismatch. */
  def aviMjpegFrameLuma(b: Array[Byte]): Option[(Int, Int, Array[Array[Long]])] = {
    val MjpgFourcc = // 'MJPG' little-endian, as biCompression stores it
      ('M'.toInt) | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)
    val info = aviWalk(b, "dc") match {
      case Some(i) if i.vidsCompression == MjpgFourcc => i
      case _ => return None
    }
    val w = info.w; val h = info.h
    val frames = info.frames
    val out = new Array[Array[Long]](frames.length)
    var i = 0
    while (i < frames.length) {
      val (fOff, fLen) = frames(i)
      val lum = Jpeg.luminanceWithDims(
        java.util.Arrays.copyOfRange(b, fOff, fOff + fLen)) match {
        case Some((fw, fh, l)) if fw == w && fh == h => l
        case _ => return None // undecodable frame or dims disagree with header
      }
      out(i) = lum
      i += 1
    }
    Some((w, h, out))
  }

  // ── ISO-BMFF (MP4/MOV) ────────────────────────────────────────────
  // The dominant crawl-video container (ISO/IEC 14496-12). Unlike
  // RIFF, boxes are big-endian, exact-sized (no word alignment), and
  // the SAMPLE TABLE (stbl) is pure metadata: per-sample offsets,
  // sizes and durations are derived by joining stsc (chunk runs) ×
  // stco/co64 (chunk offsets) × stsz (sizes) × stts (duration runs) —
  // the payload is never scanned to find frames, which is exactly why
  // the format survives at scale: a reader plans byte ranges from
  // O(samples) metadata the way a manifest table plans files.

  /** One parsed ISO-BMFF track: identity, media geometry, and the
    * fully-resolved sample table (absolute byte offset, size, duration
    * in media-timescale ticks — stsc/stco/stsz/stts already joined). */
  final case class Mp4Track(trackId: Long, handler: String, fourcc: String,
                            width: Int, height: Int,
                            timescale: Long, duration: Long,
                            samples: Array[(Long, Int, Long)])

  /** Parsed movie: mvhd timescale/duration + every trak. */
  final case class Mp4Info(timescale: Long, duration: Long,
                           tracks: Seq[Mp4Track])

  /** Real ISO-BMFF file carrying a Motion-JPEG video track ('jpeg'
    * VisualSampleEntry — the QuickTime/MJPEG-in-MP4 layout): ftyp +
    * mdat (samples laid out in chunks of `samplesPerChunk`) + moov
    * with the full box tree (mvhd, trak(tkhd, mdia(mdhd, hdlr,
    * minf(vmhd, dinf/dref, stbl(stsd/stts/stsc/stsz/stco|co64))))).
    * `sampleDelta` is the per-sample duration in `timescale` ticks;
    * the LAST sample gets 2× (a second stts run — real encoders emit
    * run-length stts, a constant-delta-only walk would misread them).
    * `co64` stores chunk offsets as ChunkLargeOffsetBox (the 64-bit
    * arm every >4 GiB file uses). `audioTrack` adds a second 'soun'
    * trak whose chunks interleave into mdat — the decoder must follow
    * per-track sample tables, not file order. */
  def mp4MjpegVideo(w: Int, h: Int, frames: Seq[Array[Byte]],
                    timescale: Int, sampleDelta: Int,
                    samplesPerChunk: Int = 1,
                    co64: Boolean = false,
                    audioTrack: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && frames.nonEmpty && samplesPerChunk > 0)
    var out = new java.io.ByteArrayOutputStream(1024 + frames.map(_.length).sum)
    def be32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def be64(v: Long): Unit = { be32(v >>> 32); be32(v & 0xffffffffL) }
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def box(typ: String)(body: => Unit): Unit = {
      // render the body into a FRESH stream, then emit size-prefixed —
      // each byte is copied once per nesting level, never once per
      // SIBLING box (re-copying the accumulated prefix per box made
      // corpus-scale synthesis O(file × boxes); measured 2–3× on the
      // sf10 probes before this)
      val saved = out
      out = new java.io.ByteArrayOutputStream()
      body
      val payload = out
      out = saved
      be32(8L + payload.size()); tag(typ)
      payload.writeTo(out)
    }
    val n = frames.length
    // audio: tiny fixed-size PCM chunks interleaved after video chunks
    val audioChunks: Seq[Array[Byte]] =
      if (audioTrack) (0 until 3).map(i => Array.fill[Byte](11)((i + 1).toByte))
      else Nil
    // mdat layout: video chunks (spc samples each), then audio chunks
    val videoChunks = frames.grouped(samplesPerChunk).toSeq
    box("ftyp") { tag("isom"); be32(0x200); tag("isom"); tag("mp41") }
    // mdat offset = current position + 8 (its own header)
    val mdatStart = out.size() + 8
    val vChunkOffs = new Array[Long](videoChunks.length)
    val aChunkOffs = new Array[Long](audioChunks.length)
    locally {
      var off = mdatStart.toLong
      videoChunks.zipWithIndex.foreach { case (c, i) =>
        vChunkOffs(i) = off; off += c.map(_.length.toLong).sum
      }
      audioChunks.zipWithIndex.foreach { case (c, i) =>
        aChunkOffs(i) = off; off += c.length
      }
    }
    box("mdat") {
      videoChunks.foreach(_.foreach(f => out.write(f, 0, f.length)))
      audioChunks.foreach(c => out.write(c, 0, c.length))
    }
    val vDuration = if (n == 1) 2L * sampleDelta
      else (n - 1).toLong * sampleDelta + 2L * sampleDelta
    def fullBox(typ: String, ver: Int = 0, flags: Int = 0)(body: => Unit): Unit =
      box(typ) { be32(((ver.toLong << 24) | flags)); body }
    def matrix(): Unit = {
      be32(0x10000); be32(0); be32(0); be32(0); be32(0x10000); be32(0)
      be32(0); be32(0); be32(0x40000000L)
    }
    def stblBox(chunkOffs: Array[Long], sizes: Array[Int], spc: Int,
                delta: Int, lastDouble: Boolean, entry: () => Unit): Unit =
      box("stbl") {
        fullBox("stsd") { be32(1); entry() }
        fullBox("stts") {
          val k = sizes.length
          if (lastDouble && k > 1) {
            be32(2); be32(k - 1L); be32(delta); be32(1); be32(2L * delta)
          } else { be32(1); be32(k.toLong); be32(if (lastDouble) 2L * delta else delta) }
        }
        fullBox("stsc") {
          // conformant chunk-run table: when the sample count doesn't
          // divide evenly, the FINAL chunk holds the remainder and
          // needs its own run entry — a single (1, spc) entry would
          // claim spc samples for every chunk and make a spec-strict
          // reader plan a phantom sample in the last chunk
          val chunks = chunkOffs.length
          val rem = sizes.length - (chunks - 1) * spc
          if (chunks > 1 && rem != spc) {
            be32(2)
            be32(1); be32(spc); be32(1)              // chunks 1..n-1
            be32(chunks.toLong); be32(rem.toLong); be32(1) // ragged tail
          } else { be32(1); be32(1); be32(spc); be32(1) }
        }
        fullBox("stsz") { be32(0); be32(sizes.length.toLong); sizes.foreach(s => be32(s.toLong)) }
        if (co64) fullBox("co64") { be32(chunkOffs.length.toLong); chunkOffs.foreach(be64) }
        else fullBox("stco") { be32(chunkOffs.length.toLong); chunkOffs.foreach(o => be32(o)) }
      }
    def trakBox(tid: Long, handler: String, dur: Long, mediaTs: Long,
                mediaDur: Long, stbl: () => Unit, isVideo: Boolean): Unit =
      box("trak") {
        fullBox("tkhd", flags = 7) {
          be32(0); be32(0); be32(tid); be32(0); be32(dur)
          be32(0); be32(0); be16(0); be16(0); be16(if (isVideo) 0 else 0x100); be16(0)
          matrix()
          be32(if (isVideo) w.toLong << 16 else 0)
          be32(if (isVideo) h.toLong << 16 else 0)
        }
        box("mdia") {
          fullBox("mdhd") { be32(0); be32(0); be32(mediaTs); be32(mediaDur); be16(0x55c4); be16(0) }
          fullBox("hdlr") { be32(0); tag(handler); be32(0); be32(0); be32(0); tag(if (isVideo) "Video" else "Sound"); out.write(0) }
          box("minf") {
            if (isVideo) fullBox("vmhd", flags = 1) { be16(0); be16(0); be16(0); be16(0) }
            else fullBox("smhd") { be16(0); be16(0) }
            box("dinf") { fullBox("dref") { be32(1); fullBox("url ", flags = 1) {} } }
            stbl()
          }
        }
      }
    box("moov") {
      fullBox("mvhd") {
        be32(0); be32(0)       // creation, modification
        be32(1000); be32(vDuration * 1000 / timescale) // movie timescale ms
        be32(0x10000); be16(0x100); be16(0); be32(0); be32(0)
        matrix()
        (0 until 6).foreach(_ => be32(0))
        be32(if (audioTrack) 3 else 2) // next track id
      }
      trakBox(1, "vide", vDuration * 1000 / timescale, timescale, vDuration,
        () => stblBox(vChunkOffs, frames.map(_.length).toArray, samplesPerChunk,
          sampleDelta, lastDouble = true, () => box("jpeg") {
            (0 until 6).foreach(_ => out.write(0)); be16(1) // reserved, dri
            be16(0); be16(0); (0 until 3).foreach(_ => be32(0))
            be16(w); be16(h)
            be32(0x480000); be32(0x480000); be32(0); be16(1)
            out.write(new Array[Byte](32), 0, 32) // compressorname
            be16(24); be16(0xffff)
          }), isVideo = true)
      if (audioTrack)
        trakBox(2, "soun", 0, 8000, audioChunks.map(_.length.toLong).sum,
          () => stblBox(aChunkOffs, audioChunks.map(_.length).toArray, 1,
            1, lastDouble = false, () => box("twos") {
              (0 until 6).foreach(_ => out.write(0)); be16(1)
              be16(0); be16(0); be32(0)
              be16(1); be16(8); be16(0); be16(0)
              be32(8000L << 16)
            }), isVideo = false)
    }
    out.toByteArray
  }

  /** Real FRAGMENTED MP4 (fMP4 — the DASH/HLS segment layout that
    * dominates crawled streaming video): moov carries an EMPTY sample
    * table (stsd entry only; stts/stsc/stsz/stco all zero) plus
    * mvex/trex defaults, and every `framesPerFragment` samples ship as
    * a moof(mfhd, traf(tfhd[default-base-is-moof], tfdt, trun)) + mdat
    * pair — per-sample sizes/durations live in the trun, offsets are
    * moof-relative. The LAST sample still gets 2× duration (a
    * per-sample trun duration, where the unfragmented layout needed a
    * second stts run). */
  def mp4FragmentedMjpeg(w: Int, h: Int, frames: Seq[Array[Byte]],
                         timescale: Int, sampleDelta: Int,
                         framesPerFragment: Int = 2): Array[Byte] = {
    require(w > 0 && h > 0 && frames.nonEmpty && framesPerFragment > 0)
    var out = new java.io.ByteArrayOutputStream(1024 + frames.map(_.length).sum)
    def be32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def be16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def box(typ: String)(body: => Unit): Unit = {
      // fresh-stream nesting: bytes copy once per level, never per
      // sibling (see mp4MjpegVideo.box)
      val saved = out
      out = new java.io.ByteArrayOutputStream()
      body
      val payload = out
      out = saved
      be32(8L + payload.size()); tag(typ)
      payload.writeTo(out)
    }
    def fullBox(typ: String, ver: Int = 0, flags: Int = 0)(body: => Unit): Unit =
      box(typ) { be32((ver.toLong << 24) | flags); body }
    def matrix(): Unit = {
      be32(0x10000); be32(0); be32(0); be32(0); be32(0x10000); be32(0)
      be32(0); be32(0); be32(0x40000000L)
    }
    val n = frames.length
    box("ftyp") { tag("iso5"); be32(0x200); tag("iso6"); tag("dash") }
    box("moov") {
      fullBox("mvhd") {
        be32(0); be32(0); be32(1000); be32(0) // fragmented: duration unknown
        be32(0x10000); be16(0x100); be16(0); be32(0); be32(0)
        matrix(); (0 until 6).foreach(_ => be32(0)); be32(2)
      }
      box("trak") {
        fullBox("tkhd", flags = 7) {
          be32(0); be32(0); be32(1); be32(0); be32(0)
          be32(0); be32(0); be16(0); be16(0); be16(0); be16(0)
          matrix(); be32(w.toLong << 16); be32(h.toLong << 16)
        }
        box("mdia") {
          fullBox("mdhd") { be32(0); be32(0); be32(timescale.toLong); be32(0); be16(0x55c4); be16(0) }
          fullBox("hdlr") { be32(0); tag("vide"); be32(0); be32(0); be32(0); tag("Video"); out.write(0) }
          box("minf") {
            fullBox("vmhd", flags = 1) { be16(0); be16(0); be16(0); be16(0) }
            box("dinf") { fullBox("dref") { be32(1); fullBox("url ", flags = 1) {} } }
            box("stbl") {
              fullBox("stsd") {
                be32(1)
                box("jpeg") {
                  (0 until 6).foreach(_ => out.write(0)); be16(1)
                  be16(0); be16(0); (0 until 3).foreach(_ => be32(0))
                  be16(w); be16(h)
                  be32(0x480000); be32(0x480000); be32(0); be16(1)
                  out.write(new Array[Byte](32), 0, 32)
                  be16(24); be16(0xffff)
                }
              }
              fullBox("stts") { be32(0) }
              fullBox("stsc") { be32(0) }
              fullBox("stsz") { be32(0); be32(0) }
              fullBox("stco") { be32(0) }
            }
          }
        }
      }
      box("mvex") {
        fullBox("trex") { be32(1); be32(1); be32(0); be32(0); be32(0) }
      }
    }
    var seq = 1L
    var base = 0L
    frames.grouped(framesPerFragment).foreach { grp =>
      val k = grp.length
      // moof layout is fixed-shape: 8 (moof) + 16 (mfhd) + 8 (traf)
      // + 16 (tfhd) + 20 (tfdt v1) + (20 + 8k) (trun) bytes
      val moofSize = 8 + 16 + 8 + 16 + 20 + 20 + 8 * k
      val before = out.size()
      box("moof") {
        fullBox("mfhd") { be32(seq) }
        box("traf") {
          // default-base-is-moof, no optional fields
          fullBox("tfhd", flags = 0x020000) { be32(1) }
          fullBox("tfdt", ver = 1) { be32(base >>> 32); be32(base & 0xffffffffL) }
          // data-offset + per-sample duration + size
          fullBox("trun", flags = 0x301) {
            be32(k.toLong)
            be32(moofSize + 8L) // into the mdat payload that follows
            grp.zipWithIndex.foreach { case (f, i) =>
              val isLast = seq * framesPerFragment >= n && i == k - 1
              val d = if (isLast) 2L * sampleDelta else sampleDelta.toLong
              be32(d); be32(f.length.toLong)
              base += d
            }
          }
        }
      }
      require(out.size() - before == moofSize,
        s"moof layout drifted: ${out.size() - before} vs $moofSize")
      box("mdat") { grp.foreach(f => out.write(f, 0, f.length)) }
      seq += 1
    }
    out.toByteArray
  }

  /** REAL pure-JVM ISO-BMFF walk: top-level boxes (32-bit and
    * `size==1` 64-bit largesize), container recursion (moov/trak/
    * mdia/minf/stbl/dinf/edts/udta), and the full sample-table join —
    * stsc chunk runs × stco/co64 × stsz (fixed or per-sample) × stts
    * duration runs — resolved into absolute (offset, size, delta)
    * per sample. None — never a throw — for truncated boxes, a
    * malformed tree, or an inconsistent sample table (counts that
    * don't reconcile across the four boxes). */
  def mp4Walk(b: Array[Byte]): Option[Mp4Info] = {
    def be16(off: Int): Int =
      ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    def be32(off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    def be64(off: Int): Long = (be32(off) << 32) | be32(off + 4)
    def fourcc(off: Int): String =
      new String(b, off, 4, "US-ASCII")
    val containers = Set("moov", "trak", "mdia", "minf", "stbl", "dinf", "edts",
      "udta", "mvex", "moof", "traf")
    var movieTs = 0L; var movieDur = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    // per-trak parse state, finalized when the trak box closes
    final class TrakState {
      var tid = 0L; var handler = ""; var fourcc = ""; var w = 0; var h = 0
      var ts = 0L; var dur = 0L
      var stts: Array[(Long, Long)] = Array.empty
      var stsc: Array[(Long, Long)] = Array.empty
      var fixedSize = 0L; var sizes: Array[Int] = Array.empty
      var chunkOffs: Array[Long] = Array.empty
    }
    var trak: TrakState = null
    // ── fragmented-MP4 (fMP4/DASH) state ──────────────────────────
    // trex defaults per track; the open traf's accumulated samples
    val trexDefaults = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    var curMoofStart = -1L
    final class TrafState {
      var tid = -1L
      var baseOff: Option[Long] = None
      var baseIsMoof = false
      var defDur: Option[Long] = None
      var defSize: Option[Long] = None
      val samples = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    }
    var traf: TrafState = null
    def parseLeaf(typ: String, po: Int, pl: Int): Boolean = typ match {
      case "trex" =>
        if (pl < 24) return false
        val tid = be32(po + 4)
        trexDefaults(tid) = (be32(po + 12), be32(po + 16)) // (duration, size)
        true
      case "tfhd" if traf != null =>
        if (pl < 8) return false
        val flags = (be32(po) & 0xffffff).toInt
        traf.tid = be32(po + 4)
        var at = po + 8
        if ((flags & 0x1) != 0) { if (at + 8 > po + pl) return false; traf.baseOff = Some(be64(at)); at += 8 }
        if ((flags & 0x2) != 0) at += 4  // sample-description-index
        if ((flags & 0x8) != 0) { if (at + 4 > po + pl) return false; traf.defDur = Some(be32(at)); at += 4 }
        if ((flags & 0x10) != 0) { if (at + 4 > po + pl) return false; traf.defSize = Some(be32(at)); at += 4 }
        traf.baseIsMoof = (flags & 0x020000) != 0
        at <= po + pl
      case "mfhd" => pl >= 8 // sequence number: presence-checked, unused
      case "tfdt" if traf != null =>
        pl >= (if ((b(po) & 0xff) == 1) 12 else 8) // decode time: unused
      case "trun" if traf != null =>
        if (pl < 8) return false
        val flags = (be32(po) & 0xffffff).toInt
        val cnt = be32(po + 4).toInt
        var at = po + 8
        // our subset needs an explicit data offset: without one, runs
        // chain off the previous run's end — ambiguous for a reader
        // that refuses to guess
        if ((flags & 0x1) == 0) return false
        val dataOff = be32(at).toInt; at += 4 // signed i32 per spec
        if ((flags & 0x4) != 0) at += 4       // first-sample-flags
        val base = traf.baseOff.getOrElse {
          // spec default: relative to the enclosing moof's first byte
          if (curMoofStart < 0) return false
          curMoofStart
        }
        var off = base + dataOff
        var i = 0
        while (i < cnt) {
          val dur =
            if ((flags & 0x100) != 0) { val d = be32(at); at += 4; d }
            else traf.defDur.orElse(trexDefaults.get(traf.tid).map(_._1))
              .getOrElse(return false)
          val sz =
            if ((flags & 0x200) != 0) { val s0 = be32(at); at += 4; s0 }
            else traf.defSize.orElse(trexDefaults.get(traf.tid).map(_._2))
              .getOrElse(return false)
          if ((flags & 0x400) != 0) at += 4 // per-sample flags
          if ((flags & 0x800) != 0) at += 4 // composition offset
          if (off + sz > b.length) return false
          traf.samples += ((off, sz.toInt, dur))
          off += sz
          i += 1
        }
        at <= po + pl
      case _ => parseMoovLeaf(typ, po, pl)
    }
    def parseMoovLeaf(typ: String, po: Int, pl: Int): Boolean = typ match {
      case "mvhd" =>
        if (pl < 24) return false
        val v = b(po) & 0xff
        if (v == 1) { movieTs = be32(po + 20); movieDur = be64(po + 24) }
        else { movieTs = be32(po + 12); movieDur = be32(po + 16) }
        true
      case "tkhd" if trak != null =>
        if (pl < 84) return false
        val v = b(po) & 0xff
        trak.tid = if (v == 1) be32(po + 20) else be32(po + 12)
        true
      case "mdhd" if trak != null =>
        if (pl < 24) return false
        val v = b(po) & 0xff
        if (v == 1) { trak.ts = be32(po + 20); trak.dur = be64(po + 24) }
        else { trak.ts = be32(po + 12); trak.dur = be32(po + 16) }
        true
      case "hdlr" if trak != null =>
        if (pl < 12) return false
        trak.handler = fourcc(po + 8); true
      case "stsd" if trak != null =>
        // first sample entry: size(4) fourcc(4); video entries carry
        // width/height at entry offset 32/34
        if (pl < 16) return false
        val eo = po + 8
        if (eo + 8 > po + pl) return false
        trak.fourcc = fourcc(eo + 4)
        if (trak.handler == "vide" && eo + 36 <= po + pl) {
          trak.w = be16(eo + 32); trak.h = be16(eo + 34)
        }
        true
      case "stts" if trak != null =>
        if (pl < 8) return false
        val k = be32(po + 4).toInt
        if (pl < 8 + 8 * k || k < 0) return false
        trak.stts = Array.tabulate(k)(i =>
          (be32(po + 8 + 8 * i), be32(po + 12 + 8 * i)))
        true
      case "stsc" if trak != null =>
        if (pl < 8) return false
        val k = be32(po + 4).toInt
        if (pl < 8 + 12 * k || k < 0) return false
        trak.stsc = Array.tabulate(k)(i =>
          (be32(po + 8 + 12 * i), be32(po + 12 + 12 * i)))
        true
      case "stsz" if trak != null =>
        if (pl < 12) return false
        trak.fixedSize = be32(po + 4)
        val k = be32(po + 8).toInt
        if (trak.fixedSize == 0) {
          if (pl < 12 + 4 * k || k < 0) return false
          trak.sizes = Array.tabulate(k)(i => be32(po + 12 + 4 * i).toInt)
        } else trak.sizes = Array.fill(k)(trak.fixedSize.toInt)
        true
      case "stco" if trak != null =>
        if (pl < 8) return false
        val k = be32(po + 4).toInt
        if (pl < 8 + 4 * k || k < 0) return false
        trak.chunkOffs = Array.tabulate(k)(i => be32(po + 8 + 4 * i))
        true
      case "co64" if trak != null =>
        if (pl < 8) return false
        val k = be32(po + 4).toInt
        if (pl < 8 + 8 * k || k < 0) return false
        trak.chunkOffs = Array.tabulate(k)(i => be64(po + 8 + 8 * i))
        true
      case _ => true // unknown leaves are skipped, the format's rule
    }
    def finalizeTrak(): Boolean = {
      val t = trak
      // join the four tables into per-sample (offset, size, delta)
      val nSamples = t.sizes.length
      if (t.stts.map(_._1).sum != nSamples) return false
      val deltas = new Array[Long](nSamples)
      var di = 0
      t.stts.foreach { case (cnt, d) =>
        var c = 0L
        while (c < cnt && di < nSamples) { deltas(di) = d; di += 1; c += 1 }
      }
      val samples = new Array[(Long, Int, Long)](nSamples)
      var si = 0; var ci = 0; var run = 0
      while (ci < t.chunkOffs.length && si < nSamples) {
        while (run + 1 < t.stsc.length && t.stsc(run + 1)._1 <= ci + 1) run += 1
        if (t.stsc.isEmpty) return false
        val spc = t.stsc(run)._2
        var off = t.chunkOffs(ci)
        var k = 0L
        while (k < spc && si < nSamples) {
          if (off + t.sizes(si) > b.length) return false // points past EOF
          samples(si) = (off, t.sizes(si), deltas(si))
          off += t.sizes(si); si += 1; k += 1
        }
        ci += 1
      }
      if (si != nSamples) return false // chunk map can't place every sample
      tracks += Mp4Track(t.tid, t.handler, t.fourcc, t.w, t.h, t.ts, t.dur, samples)
      true
    }
    def walk(from: Int, to: Int): Boolean = {
      var off = from
      while (off < to) {
        if (off + 8 > to) return false
        var size = be32(off)
        var hdr = 8
        val typ = fourcc(off + 4)
        if (size == 1) {
          if (off + 16 > to) return false
          size = be64(off + 8); hdr = 16
        } else if (size == 0) size = (to - off).toLong
        if (size < hdr || off + size > to) return false
        if (containers.contains(typ)) {
          val isTrak = typ == "trak"
          val isMoof = typ == "moof"
          val isTraf = typ == "traf"
          if (isTrak) {
            if (trak != null) return false // nested trak: malformed
            trak = new TrakState
          }
          if (isMoof) curMoofStart = off.toLong
          if (isTraf) {
            if (traf != null || curMoofStart < 0) return false
            traf = new TrafState
          }
          if (!walk(off + hdr, off + size.toInt)) return false
          if (isTrak) { if (!finalizeTrak()) return false; trak = null }
          if (isTraf) {
            // merge the fragment's run into its (already-declared) track
            val at = tracks.indexWhere(_.trackId == traf.tid)
            if (at < 0) return false // moof before moov: malformed
            tracks(at) = tracks(at).copy(
              samples = tracks(at).samples ++ traf.samples)
            traf = null
          }
          if (isMoof) curMoofStart = -1L
        } else if (!parseLeaf(typ, off + hdr, (size - hdr).toInt)) return false
        off += size.toInt
      }
      true
    }
    try {
      if (b.length < 8 || !walk(0, b.length) || movieTs == 0) None
      else Some(Mp4Info(movieTs, movieDur, tracks.toSeq.map { t =>
        // a fragmented track's mdhd duration is typically 0: report
        // the sample-table truth (Σ deltas) so both layouts agree
        if (t.duration == 0 && t.samples.nonEmpty)
          t.copy(duration = t.samples.map(_._3).sum)
        else t
      }))
    } catch { case _: Exception => None }
  }

  /** MJPEG-in-MP4 decode, end to end ours: [[mp4Walk]] resolves the
    * 'vide' track's sample table, every sample's byte range decodes
    * through the from-scratch baseline JPEG pipeline, dims must agree
    * with the VisualSampleEntry. None for a bad tree, no video track,
    * a non-jpeg entry, an undecodable sample, or a dims mismatch. */
  def mp4MjpegFrameLuma(b: Array[Byte]): Option[(Int, Int, Array[Array[Long]])] = {
    val info = mp4Walk(b).getOrElse(return None)
    val v = info.tracks.find(t => t.handler == "vide" && t.fourcc == "jpeg")
      .getOrElse(return None)
    val out = new Array[Array[Long]](v.samples.length)
    var i = 0
    while (i < v.samples.length) {
      val (off, len, _) = v.samples(i)
      val lum = Jpeg.luminanceWithDims(
        java.util.Arrays.copyOfRange(b, off.toInt, off.toInt + len)) match {
        case Some((fw, fh, l)) if fw == v.width && fh == v.height => l
        case _ => return None
      }
      out(i) = lum
      i += 1
    }
    Some((v.width, v.height, out))
  }

  /** Perceptual blockhash over REAL decoded luminance when the blob is
    * a decodable BMP ([[bmpLuminance]]), PNG ([[pngLuminance]]) or GIF
    * ([[gifLuminance]]), byte-level [[blockHash60]] otherwise: a mixed
    * corpus flows, and decodable assets hash actual pixel content
    * (uniform-color images of different byte layouts collide; a
    * brightness gradient sets exactly the bright half's bits —
    * spec-pinned in Round12EdgeSpec on synthesized known-pixel BMPs).
    * All three decoders share the exact BT.601 integer luma, so the
    * SAME image stored as BMP, PNG or GIF produces the SAME hash — the
    * cross-container dedup property. */
  def perceptualHash60(blob: Array[Byte]): Long =
    bmpLuminance(blob).orElse(pngLuminance(blob)).orElse(gifLuminance(blob))
      .map(blockHash60Samples).getOrElse(blockHash60(blob))

  /** Build a binary-asset manifest from the documents table: blob =
    * UTF-8 bytes of the text (a stand-in corpus; swap the projection
    * for real image/audio columns). Partitioned by modality so
    * downstream per-modality decode jobs prune at the source. */
  def manifest(spark: SparkSession, docs: DataFrame): Dataset[Asset] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      lit("text/plain").as("modality"),
      col("text").cast("binary").as("blob"))
      .as[Asset]
  }

  /** Batched per-partition decode: the core multimodal plumbing. */
  def extractFeatures(spark: SparkSession, assets: Dataset[Asset],
                      decoder: Decoder = ByteStatsDecoder): Dataset[Features] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.grouped(decoder.batchSize).flatMap(b => decoder.decode(b))
    }
  }

  case class Frame(doc_id: Long, frame_idx: Long, frame_off: Long, frame_sum: Long)

  /** Frame sampling: treat the blob as fixed-size frames (the stand-in
    * for video GOP/frame boundaries) and keep every `everyN`-th frame
    * with a per-frame byte aggregate — the 1→N expansion every
    * video-curation pipeline needs. Runs inside the scan stage
    * (mapPartitions, no shuffle of blobs); emitted rows are fixed-width.
    * A real codec would replace the slice with demuxed frames; the
    * batching/expansion plumbing is identical. */
  def frameSample(spark: SparkSession, assets: Dataset[Asset],
                  frameSize: Int, everyN: Int): Dataset[Frame] = {
    require(frameSize > 0 && everyN > 0)
    import spark.implicits._
    assets.flatMap { a =>
      val n = a.blob.length
      val frames = (n + frameSize - 1) / frameSize
      (0 until frames).iterator.filter(_ % everyN == 0).map { f =>
        val off = f * frameSize
        val end = math.min(off + frameSize, n)
        var sum = 0L
        var i = off
        while (i < end) { sum += (a.blob(i) & 0xffL); i += 1 }
        Frame(a.doc_id, f.toLong, off.toLong, sum)
      }
    }
  }

  case class FrameEnergy(doc_id: Long, frame_idx: Long, energy: Long)

  /** Per-frame signal energy: the sum of squared deviations of each
    * byte from the unsigned-8-bit midpoint (128) — the energy measure
    * a PCM voice-activity detector thresholds on. Like frameSample,
    * runs inside the scan stage: blobs never shuffle; only fixed-width
    * (doc_id, frame_idx, energy) triples leave. Energy per frame is
    * ≤ frameSize·128² (< 2^21 at 64-byte frames), so downstream
    * integer threshold math (energy·n_frames vs Σenergy) stays in
    * BIGINT for any per-document asset size under ~2^41 bytes. */
  def frameEnergy(spark: SparkSession, assets: Dataset[Asset],
                  frameSize: Int): Dataset[FrameEnergy] = {
    require(frameSize > 0)
    import spark.implicits._
    assets.flatMap { a =>
      val n = a.blob.length
      val frames = (n + frameSize - 1) / frameSize
      (0 until frames).iterator.map { f =>
        val off = f * frameSize
        val end = math.min(off + frameSize, n)
        var sum = 0L
        var i = off
        while (i < end) {
          val d = (a.blob(i) & 0xff) - 128
          sum += d.toLong * d
          i += 1
        }
        FrameEnergy(a.doc_id, f.toLong, sum)
      }
    }
  }

  case class FrameBands(doc_id: Long, frame_idx: Long, bands: Array[Long])

  /** Per-frame BAND energies — the spectral-band stand-in a
    * constellation fingerprinter (Wang 2003 / Shazam shape) peaks over:
    * each frame is cut into `nBands` equal byte slices and each slice
    * reports its squared-deviation-from-midpoint energy. A real audio
    * pipeline would swap the byte slices for FFT bins; the framing,
    * in-scan evaluation (blobs never shuffle — only fixed-width
    * (doc, frame, bands[]) rows leave the scan), and downstream peak /
    * pair logic are the production shape. Bands past the blob end are
    * energy 0 (matching the oracle's COALESCE over an empty range). */
  def frameBandEnergy(spark: SparkSession, assets: Dataset[Asset],
                      frameSize: Int, nBands: Int): Dataset[FrameBands] = {
    require(frameSize > 0 && nBands > 0 && frameSize % nBands == 0)
    import spark.implicits._
    val bandSize = frameSize / nBands
    assets.flatMap { a =>
      val n = a.blob.length
      val frames = (n + frameSize - 1) / frameSize
      (0 until frames).iterator.map { f =>
        val off = f * frameSize
        val bands = Array.tabulate(nBands) { b =>
          val lo = off + b * bandSize
          val end = math.min(lo + bandSize, n)
          var sum = 0L
          var i = lo
          while (i < end) {
            val d = (a.blob(i) & 0xff) - 128
            sum += d.toLong * d
            i += 1
          }
          sum
        }
        FrameBands(a.doc_id, f.toLong, bands)
      }
    }
  }

  /** Aspect-preserving resize planning over decoded dimensions: the
    * metadata half of a resize stage (the pixel work is the stubbed
    * codec's job). Integer math only (rounded integer division via
    * `div`), clamped to ≥1 so no plan emits a zero-pixel dimension. */
  def resizePlan(features: DataFrame, maxDim: Long): DataFrame = {
    require(maxDim > 0)
    // StubImageDecoder emits (head_byte, byte_sum) as pseudo (w, h)
    features
      .select(col("doc_id"), col("head_byte").as("w"), col("byte_sum").as("h"))
      .selectExpr("doc_id", "w", "h",
        s"""CASE WHEN greatest(w, h) <= ${maxDim}L THEN w
           | ELSE greatest(1L, (w * ${maxDim}L + greatest(w, h) div 2) div greatest(w, h))
           |END AS out_w""".stripMargin,
        s"""CASE WHEN greatest(w, h) <= ${maxDim}L THEN h
           | ELSE greatest(1L, (h * ${maxDim}L + greatest(w, h) div 2) div greatest(w, h))
           |END AS out_h""".stripMargin)
  }
}
