package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/** Readers beyond parquet, and the write paths that matter at 100 TB
  * (SURVEY.md §2-G): hive-style partitioned layout for partition
  * pruning, and bucketed tables for shuffle-free co-located joins.
  */
object Sinks {

  // ---- readers ----

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  // ---- writers ----

  /** Hive-style partitioned parquet: queries filtering on `cols` prune
    * entire directories at planning time. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** ORC round-trip (columnar alternative; same pushdown/pruning via
    * the native vectorized reader). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Bucketed + sorted table: joins/aggregations on `key` between
    * tables bucketed the same way need NO shuffle and NO sort — the
    * layout cost is paid once at write time. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
}
