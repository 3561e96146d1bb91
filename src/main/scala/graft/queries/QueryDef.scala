package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named query: the Spark plan plus (when SQL-expressible) the DuckDB
  * oracle the driver hash-compares against.
  *
  * Oracle-parity rules (see SURVEY.md §6):
  *  - identical output column names on both sides;
  *  - explicit total ORDER BY on both sides;
  *  - money math in exact DECIMAL(18,2), cast to DOUBLE only at the
  *    end — both engines then produce bit-identical doubles;
  *  - ratio columns as a single double division of identical operands;
  *  - integer division: Spark `div`, Scala Long/BigInt `/`, and
  *    DuckDB's integer `//` ALL truncate toward zero (measured:
  *    CAST(-7 AS HUGEINT) // 2 = -3) — never use floorDiv/floorMod on
  *    a recurrence whose operands can go negative.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries run in Bench */
    bench: Boolean = false)

object QueryDef {
  /** Exact 2-dp decimal view of a double money column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Final exact-decimal → double conversion (deterministic both engines). */
  def dbl(c: Column): Column = c.cast("double")

  /** Exact integer-cents view of a 2-dp money column: `round(x*100)` as
    * long. Integer aggregation stays in whole-stage codegen (~2.5x the
    * throughput of decimal sums here) and is exact, so the final
    * int→double conversion is bit-identical in Spark and DuckDB. */
  def cents(c: Column): Column = round(c * 100).cast("long")
  /** Integer percent view of a 2-dp rate column (discount/tax). */
  def pct(c: Column): Column = round(c * 100).cast("long")
}

/** Shared teardown for the streaming replay keys. Every replay query
  * materializes real data to a temp dir, drains a file-source stream
  * into a uniquely-named memory-sink table, and reads the result back —
  * leaving, per invocation, a temp dir on disk and a driver-memory
  * temp view that were never released (bench loops run each query 4×;
  * r12 ADVICE). `finish` pins the result rows into block storage
  * (eager localCheckpoint — the returned frame no longer references
  * the memory sink or the temp dir), then drops the temp view and
  * deletes the replay dir. Replay results are the small end-of-stream
  * aggregate/answer tables, so the checkpoint is a few blocks the
  * ContextCleaner reclaims with the frame. */
object StreamReplay {
  def finish(s: SparkSession, qname: String, root: String)(result: DataFrame): DataFrame = {
    val out = result.localCheckpoint() // eager: severs sink + temp-dir deps
    try s.catalog.dropTempView(qname) catch { case _: Throwable => }
    deleteRec(new java.io.File(root))
    out
  }
  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(): Unit
  }

  /** Force a range-partitioned replay dir to ACTUALLY stream in range
    * order: FileStreamSource picks files oldest-modification-first, and
    * the parallel tasks of one parquet write finish in random order —
    * so part-00007 can carry an earlier mtime than part-00000, the
    * watermark jumps to the end of event time on an early batch, and
    * every earlier-range file is silently LATE-DROPPED (found in r13:
    * the TTL'd LSH index lost 10 of 14 buckets this way). Stamping
    * strictly ascending mtimes in part-file path order makes the
    * chronological replay deterministic. */
  def stampChronological(dirPath: String): Unit = {
    val parts = Option(new java.io.File(dirPath).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val base = (System.currentTimeMillis() / 1000L - parts.length) * 1000L
    parts.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(base + i * 1000L): Unit
    }
  }
}
