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

  /** Perceptual blockhash over REAL decoded luminance when the blob is
    * a decodable BMP ([[bmpLuminance]]), byte-level [[blockHash60]]
    * otherwise — the "one container decodes for real" operating point:
    * a mixed corpus flows, and BMP assets hash actual pixel content
    * (uniform-color images of different byte layouts collide; a
    * brightness gradient sets exactly the bright half's bits —
    * spec-pinned in Round12EdgeSpec on synthesized known-pixel BMPs). */
  def perceptualHash60(blob: Array[Byte]): Long =
    bmpLuminance(blob).map(blockHash60Samples).getOrElse(blockHash60(blob))

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
