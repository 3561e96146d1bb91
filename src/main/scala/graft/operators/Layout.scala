package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * so file-level min/max statistics prune scans on EITHER dimension
  * (the Delta/Iceberg OPTIMIZE ZORDER idea, built from public
  * bit-interleaving math).
  *
  * At 100 TB the win is at the storage layer: a table laid out by
  * `zorderWrite(df, a, b)` keeps both a-ranges and b-ranges tight
  * within every parquet file, so predicates on either column skip
  * most files via footer stats — without paying two copies of the
  * data (which per-column range layouts would need).
  *
  * All math is integer-exact (rank-normalize → interleave bits), so a
  * SQL oracle reproduces z-values bit-for-bit.
  */
object Layout {

  /** Spread the low 16 bits of `x` so value bit i lands at bit 2i
    * (the classic magic-mask Morton expansion — public domain bit
    * twiddling; each step is a shift/or/mask on a 64-bit int). */
  def spread16(x: Column): Column = {
    val s1 = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit ints: a at even bits, b at odd. */
  def interleave(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Min/max-normalize an integer column into [0, 65535]. `lo`/`hi`
    * are the exact column bounds (pass them in — at scale they come
    * from table stats, not an extra scan). floor(double(x-lo)*65535
    * / span): (x-lo) is cast to double BEFORE the ×65535 so the
    * product can never overflow int64 (the old int multiply wrapped
    * for spans ≥ ~2^48). Exact while (x-lo)*65535 < 2^53, i.e.
    * spans up to ~2^37; beyond that both engines still agree (same
    * IEEE double ops), the grid just coarsens. */
  def norm16(x: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L))
      .otherwise(floor((x - lo).cast("double") * 65535L / (hi - lo)))
      .cast("long")

  /** The z-value column for two integer dimensions given their bounds. */
  def zValue(a: Column, aLo: Column, aHi: Column,
             b: Column, bLo: Column, bHi: Column): Column =
    interleave(norm16(a, aLo, aHi), norm16(b, bLo, bHi))

  /** Write `df` clustered on the Morton curve of (`colA`, `colB`):
    * range-partition by z (each output file owns a contiguous curve
    * segment → disjoint z ranges → tight per-file min/max on BOTH
    * source columns), sort within partitions, drop the helper column.
    * One extra pass for exact bounds; at scale substitute catalog
    * stats. */
  def zorderWrite(df: DataFrame, colA: String, colB: String,
                  path: String, numFiles: Int): Unit = {
    val bounds = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    if (bounds.isNullAt(0)) { // empty input: write the empty table as-is
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (aLo, aHi, bLo, bHi) =
      (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2), bounds.getLong(3))
    val z = df.withColumn("_z",
      zValue(col(colA).cast("long"), lit(aLo), lit(aHi),
             col(colB).cast("long"), lit(bLo), lit(bHi)))
    z.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
