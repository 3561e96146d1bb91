package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-file Bloom filters for POINT-lookup file skipping on the
  * manifest table — the index min/max bounds cannot be: a
  * high-cardinality key (user id, doc id) scattered uniformly across
  * quality- or time-partitioned files has every file spanning the
  * full key range, so [[ManifestTable.readRange]] plans everything; a
  * per-file Bloom filter prunes to the files that may actually hold
  * the key (Delta's Bloom filter index / Iceberg's puffin blobs,
  * reduced to the manifest-entry form `bloom=<col>:<m>:<k>:<hex>`).
  *
  * Contract: NO false negatives, ever — a file containing the value
  * always says maybe (the build sets every probe bit of every row's
  * value; membership checks the same bits with the same hash). False
  * positives only cost an extra file read; the sizing below targets
  * ~1e-4 per (file, value) at 32 bits per distinct key.
  *
  * Determinism: the hash is Spark's own xxhash64 — the build side
  * uses the codegen'd [[org.apache.spark.sql.functions.xxhash64]]
  * column function, the query side evaluates the SAME Catalyst
  * expression on the driver (`XxHash64(Literal…)`), so the two sides
  * cannot drift by construction (one implementation, two call sites).
  * The K=4 probe positions are disjoint 24-bit slices of two
  * independent hashes masked to the power-of-two filter width — pure
  * shifts and masks, no overflowing arithmetic (ANSI-mode safe), and
  * nothing sampled or time-dependent: the same data always builds the
  * same filter, so the gate key's pruning census is reproducible.
  *
  * Scale shape: the build costs one codegen'd projection over the
  * staged batch plus a groupBy on (file, word) whose cardinality is
  * files × m/64 — metadata-sized, like the stats pass it rides with.
  * Query-time planning is a pure manifest fold: O(live files) bit
  * probes, zero data reads.
  */
object BloomIndex {

  /** Probes per value: 2 positions sliced from each of 2 hashes. */
  val K = 4

  /** Second-hash salt (fed as an extra hashed column, not a seed —
    * the column function pins the seed to 42). Arbitrary constant. */
  private val Salt = 0x9E3779B9L

  /** Maximum filter width: positions are 24-bit hash slices. */
  private val MaxBits = 1 << 24

  /** The two 64-bit hashes of `v` — query side. Evaluates the exact
    * Catalyst expression the build side codegens. xxhash64 is
    * type-dispatched INSIDE the one shared expression (longs hash
    * their 8 bytes, strings their UTF-8 bytes), so long and string
    * keys ride the same filter machinery without a parallel
    * implementation. */
  private def hashes(v: Any): (Long, Long) = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h1 = XxHash64(Seq(Literal(v)), 42L).eval().asInstanceOf[Long]
    val h2 = XxHash64(Seq(Literal(v), Literal(Salt)), 42L).eval().asInstanceOf[Long]
    (h1, h2)
  }

  /** Filter size in bits for a file holding `nDistinct` distinct
    * values: ~32 bits/key, power of two, floored at 1024 (128 B of
    * filter for tiny files), capped at 2^24 (2 MiB — a file with more
    * distinct keys than that should be split, not indexed harder). */
  def sizeFor(nDistinct: Long): Int = {
    var m = 1024
    while (m < nDistinct * 32 && m < MaxBits) m <<= 1
    m
  }

  /** The K probe positions of `v` in an m-bit filter — query side.
    * m must be a power of two (the mask IS the modulo). */
  def positions(v: Any, m: Int): Array[Int] = {
    require(m >= 64 && (m & (m - 1)) == 0 && m <= MaxBits,
      s"bloom width $m must be a power of two in [64, 2^24]")
    val (h1, h2) = hashes(v)
    val mask = (m - 1).toLong
    Array(
      (h1 & mask).toInt, ((h1 >>> 24) & mask).toInt,
      (h2 & mask).toInt, ((h2 >>> 24) & mask).toInt)
  }

  /** The K probe positions — build side, as an int-array Column.
    * Shifts and masks only: safe under ANSI arithmetic. */
  def positionsCol(c: Column, m: Int): Column = {
    val h1 = xxhash64(c)
    val h2 = xxhash64(c, lit(Salt))
    val mask = lit((m - 1).toLong)
    array(
      h1.bitwiseAND(mask).cast("int"),
      shiftrightunsigned(h1, 24).bitwiseAND(mask).cast("int"),
      h2.bitwiseAND(mask).cast("int"),
      shiftrightunsigned(h2, 24).bitwiseAND(mask).cast("int"))
  }

  /** Render filter words as fixed-width hex (16 chars per long). */
  def toHex(words: Array[Long]): String =
    words.map(w => f"$w%016x").mkString

  /** Does the hex-encoded m-bit filter possibly contain `v`?
    * `v` may be a Long or a String (same dispatch as the build). */
  def maybeContains(hex: String, m: Int, v: Any): Boolean =
    positions(v, m).forall { pos =>
      val word = java.lang.Long.parseUnsignedLong(
        hex.substring((pos >>> 6) * 16, (pos >>> 6) * 16 + 16), 16)
      (word & (1L << (pos & 63))) != 0L
    }

  /** Build one filter per staged part file over long column `col`:
    * returns file name → `<m>:<k>:<hex>`. One distributed pass: the
    * probe positions explode map-side, then a (file, word) bit_or
    * aggregation — collect size is files × m/64 words, metadata-sized.
    * `m` is sized from the batch's worst-file distinct count (one
    * shared width keeps the aggregation a single pass). Rows with a
    * NULL key set no bits — and a NULL probe never matches a bloom
    * (point lookups are equality lookups; NULL equals nothing). */
  def buildPerFile(staged: org.apache.spark.sql.DataFrame,
                   colName: String): Map[String, String] = {
    val keyed = staged
      .filter(col(colName).isNotNull)
      .select(input_file_name().as("_f"), col(colName).as("_v"))
    val maxDistinct = keyed.groupBy(col("_f"))
      .agg(countDistinct(col("_v")).as("nd"))
      .agg(max(col("nd"))).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .getOrElse(0L)
    val m = sizeFor(maxDistinct)
    val words = keyed
      .select(col("_f"), explode(positionsCol(col("_v"), m)).as("pos"))
      .select(col("_f"), (col("pos") / 64).cast("int").as("word"),
        expr("shiftleft(1L, pos % 64)").as("mask"))
      .groupBy(col("_f"), col("word")).agg(expr("bit_or(mask)").as("bits"))
      .collect() // files × ≤m/64 rows — metadata-sized
    words.groupBy(r =>
        new org.apache.hadoop.fs.Path(r.getString(0)).getName)
      .map { case (name, rs) =>
        val arr = new Array[Long](m / 64)
        rs.foreach(r => arr(r.getInt(1)) = r.getLong(2))
        name -> s"$m:$K:${toHex(arr)}"
      }
  }
}
