package graft.sources.v2

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.example.data.Group
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ManifestTable

/** Java-serializable carrier for the session's Hadoop configuration —
  * the driver plans with the session conf, and the executor-side
  * parquet readers must open files against THE SAME filesystem
  * settings (credentials, fs.* impls, IO tunables), not a blank
  * `new Configuration()` that silently works only on the local FS.
  * (Spark's own SerializableConfiguration is private[spark].) */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** The manifest table as a REAL Structured Streaming SOURCE — the
  * engine-layer half of the change feed (Delta's streaming-source
  * shape): `spark.readStream.format("graft-manifest").schema(s)
  * .load(tableDir)`.
  *
  * Offsets ARE manifest versions: a micro-batch (start, end] plans
  * exactly the data files that the interval's commits added
  * ([[graft.sources.ManifestTable.addedFilesSince]] — an O(versions
  * polled) log fold, never O(history)), one input partition per
  * added file, read executor-side with the parquet-hadoop column
  * reader. Exactly-once falls out of the offset contract: Spark
  * checkpoints the version watermark, and replanning any (start, end]
  * yields the same files.
  *
  *  - **Admission control**: `maxVersionsPerTrigger` bounds how many
  *    commits a micro-batch may drain (the Delta `maxFilesPerTrigger`
  *    analog) — a backlogged table streams in bounded batches instead
  *    of one giant catch-up batch.
  *  - **Trigger.AvailableNow**: the target version is pinned at
  *    prepare time, so a drain processes everything committed before
  *    the query started and stops — even while writers keep
  *    committing.
  *  - A ROW-REMOVING commit (compact's `reset`, deleteWhere/mergeInto
  *    `remove=`) inside an unread interval fails the stream with a
  *    clear error: the delta is not expressible as appended rows, and
  *    silently re-reading the snapshot would double-count — the
  *    consumer must restart from a fresh snapshot (exactly Delta's
  *    semantics without `ignoreChanges`).
  *  - **`readChangeFeed=true`** (Delta's streaming CDF): rows arrive
  *    tagged `_change_type`/`_commit_version` — cdf-enabled
  *    DELETE/MERGE commits stream their commit-time change files
  *    (type baked in the file), pure appends stream as constant
  *    'insert' rows, and a row-removing commit written WITHOUT change
  *    data still fails the stream. Downstream incremental view
  *    maintenance then rides a checkpointed stream instead of a
  *    hand-rolled cursor.
  *
  * Column types supported: long/int/double/boolean/string (the
  * manifest sink's own write surface). Schema must be supplied
  * explicitly — the log carries no self-describing schema. */
class ManifestStreamDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-manifest"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-manifest requires an explicit .schema(...) — supply the table's schema")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ManifestStreamTable(schema, opts.get("path"),
      Option(opts.get("maxVersionsPerTrigger")).map(_.toLong).getOrElse(Long.MaxValue),
      Option(opts.get("versionAsOf")).map(_.toLong),
      opts.getBoolean("readChangeFeed", false))
  }
}

final class ManifestStreamTable(tableSchema: StructType, dir: String,
                                maxVersionsPerTrigger: Long,
                                versionAsOf: Option[Long],
                                changeFeed: Boolean = false)
    extends Table with SupportsRead {
  require(dir != null, "graft-manifest requires a path")
  require(maxVersionsPerTrigger > 0, "maxVersionsPerTrigger must be positive")
  override def name(): String = s"graft-manifest($dir)"
  // change-feed mode serves the user's table schema PLUS the two CDF
  // meta columns (the Delta readChangeFeed contract)
  private val servedSchema: StructType =
    if (!changeFeed) tableSchema
    else tableSchema
      .add(StructField("_change_type", StringType, nullable = true))
      .add(StructField("_commit_version", LongType, nullable = true))
  override def schema(): StructType = servedSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      // captured driver-side where the session is in scope; shipped to
      // executors so readers resolve paths on the session's filesystem
      private val hadoopConf = new SerializableHadoopConf(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
      // physical column pruning: the pruned schema reaches the parquet
      // reader as a projection (ReadSupport.PARQUET_READ_SCHEMA), so
      // unrequested columns are never materialized — which also means
      // a table holding unsupported-typed columns (embedding arrays)
      // reads fine as long as the QUERY touches only scalars
      private var required: StructType = servedSchema
      override def pruneColumns(r: StructType): Unit =
        required = StructType(servedSchema.fields.filter(f =>
          r.fieldNames.contains(f.name)))
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ManifestMicroBatchStream(required, dir, maxVersionsPerTrigger,
            hadoopConf, changeFeed)
        // batch read = the SNAPSHOT (latest, or `versionAsOf` time
        // travel) — the same manifest fold ManifestTable.read plans,
        // served through the same executor-side reader as the stream
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] = {
            require(!changeFeed,
              "readChangeFeed is a streaming option; batch change reads go " +
                "through ManifestTable.readChanges")
            ManifestTable.snapshotFiles(dir, versionAsOf)
              .map(rel => ManifestFilePartition(
                ManifestStreamSource.dataFilePath(dir, rel)): InputPartition)
              .toArray
          }
          override def createReaderFactory(): PartitionReaderFactory =
            new ManifestReaderFactory(required.json, hadoopConf)
        }
      }
    }
}

private[v2] object ManifestStreamSource {
  /** Hadoop-Path resolution of a committed data file — not string
    * concatenation, so scheme-qualified table dirs (s3a://, hdfs://)
    * resolve on the filesystem the conf names. */
  def dataFilePath(dir: String, rel: String): String =
    new Path(new Path(dir, "data"), rel).toString
}

/** Offset = highest manifest version consumed (-1 = nothing yet). */
final case class ManifestOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

final class ManifestMicroBatchStream(schema: StructType, dir: String,
                                     maxVersionsPerTrigger: Long,
                                     hadoopConf: SerializableHadoopConf,
                                     changeFeed: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // pinned by prepareForTriggerAvailableNow: an AvailableNow drain
  // stops here even while writers keep committing
  @volatile private var availableNowTarget: Option[Long] = None

  private def currentLatest: Long = ManifestTable.latestVersion(dir).getOrElse(-1L)

  override def initialOffset(): Offset = ManifestOffset(-1L)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentLatest)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: latestOffset(start, limit) is the entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[ManifestOffset].version
    val target = availableNowTarget.getOrElse(currentLatest)
    // saturating stride: from + maxVersionsPerTrigger overflows for the
    // unbounded default, and an overflowed offset would be COMMITTED
    val step = math.min(maxVersionsPerTrigger, math.max(0L, target - from))
    ManifestOffset(from + step)
  }

  override def reportLatestOffset(): Offset = ManifestOffset(currentLatest)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ManifestOffset].version
    val to = end.asInstanceOf[ManifestOffset].version
    if (to <= from) return Array.empty
    if (!changeFeed)
      // throws on a replacing commit in the interval — the stream FAILS
      // rather than silently double-reading a rewritten snapshot
      return ManifestTable.addedFilesSince(dir, from, Some(to))
        .map(rel => ManifestFilePartition(
          ManifestStreamSource.dataFilePath(dir, rel)): InputPartition)
        .toArray
    // CHANGE-FEED mode (Delta streaming readChangeFeed): per commit,
    // cdf files carry their own _change_type column (read from the
    // file), pure-append files stream as constant-'insert' rows;
    // row-removing commits without change data still FAIL the stream
    // (classifyChangeCommit throws) — a feed must not guess.
    (from + 1 to to).flatMap { v =>
      val (adds, cdfRels) =
        ManifestTable.classifyChangeCommit(dir, v, s"($from, $to]")
      cdfRels.map(rel => ManifestFilePartition(
        ManifestStreamSource.dataFilePath(dir, rel), null, v): InputPartition) ++
        adds.map(rel => ManifestFilePartition(
          ManifestStreamSource.dataFilePath(dir, rel), "insert", v): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(schema.json, hadoopConf)

  override def deserializeOffset(json: String): Offset = {
    val m = """\{"version":(-?\d+)\}""".r
    json match {
      case m(v) => ManifestOffset(v.toLong)
      case _ => throw new IllegalArgumentException(s"bad manifest offset: $json")
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One committed data file. `changeType`: null = not a change-feed
  * partition OR the file bakes its own `_change_type` column (cdf
  * files); "insert" = pure-append file served with a constant type.
  * `commitVersion` feeds `_commit_version` (-1 outside feed mode). */
final case class ManifestFilePartition(file: String,
                                       changeType: String = null,
                                       commitVersion: Long = -1L)
    extends InputPartition

final class ManifestReaderFactory(schemaJson: String,
                                  hadoopConf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ManifestFilePartition]
    new ManifestPartitionReader(p.file,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      hadoopConf.value, p.changeType, p.commitVersion)
  }
}

/** Executor-side parquet read of one committed data file through the
  * public parquet-hadoop Group API, converted to InternalRows of the
  * (possibly column-pruned) schema. The pruned schema is pushed into
  * the reader as a parquet projection, so unrequested columns are
  * skipped at the column-chunk level, never decoded. */
final class ManifestPartitionReader(file: String, schema: StructType,
                                    conf: Configuration,
                                    constChangeType: String = null,
                                    commitVersion: Long = -1L)
    extends PartitionReader[InternalRow] {
  /** GroupReadSupport that projects to the requested column names
    * INSIDE init(), where the file schema is already in hand — the
    * projection keeps the file's exact types and required/optional
    * repetitions (hand-built fields would have to guess Spark's
    * nullability encoding), and the footer is read exactly once.
    * Requested columns ABSENT from the file resolve to NULL rows-wide
    * (recorded in [[presentFields]]) — the same parquet schema-
    * evolution rule as ManifestTable.read, so a table evolved by
    * appendEvolving streams its pre-evolution files instead of dying
    * on them (a pruned projection may legitimately request ONLY
    * evolved columns against an old file: every row is null). The
    * flip side — a typo'd .schema(...) surfaces as an all-NULL
    * column, exactly as it would reading the same files through
    * spark.read.schema(...).parquet — is the standard parquet
    * contract, not an error this layer can distinguish from
    * evolution. */
  private final class ProjectingReadSupport(wanted: Set[String])
      extends GroupReadSupport {
    override def init(context: org.apache.parquet.hadoop.api.InitContext)
        : org.apache.parquet.hadoop.api.ReadSupport.ReadContext = {
      val fileSchema = context.getFileSchema
      val kept = new java.util.ArrayList[org.apache.parquet.schema.Type]()
      fileSchema.getFields.forEach(f =>
        if (wanted.contains(f.getName)) kept.add(f): Unit)
      val have = new scala.collection.mutable.HashSet[String]
      kept.forEach(f => have.add(f.getName): Unit)
      presentFields = have.toSet
      new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(
        new org.apache.parquet.schema.MessageType("spark_schema", kept))
    }
  }

  // set by init() (which runs during reader build, before any get()):
  // the requested fields this file actually carries — the rest
  // NULL-backfill per row
  @volatile private var presentFields: Set[String] = Set.empty

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new ProjectingReadSupport(schema.fieldNames.toSet),
        new Path(file))
      .withConf(conf).build()
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      // change-feed meta columns: _commit_version is always partition
      // metadata; _change_type is a constant for pure-append files and
      // a REAL baked column in cdf files (falls through to the file
      // read below when no constant was assigned)
      if (f.name == "_commit_version" && commitVersion >= 0L)
        row.setLong(i, commitVersion)
      else if (f.name == "_change_type" && constChangeType != null)
        row.update(i, UTF8String.fromString(constChangeType))
      else if (!presentFields.contains(f.name) ||
          current.getFieldRepetitionCount(f.name) == 0) row.setNullAt(i)
      else f.dataType match {
        case LongType => row.setLong(i, current.getLong(f.name, 0))
        case IntegerType => row.setInt(i, current.getInteger(f.name, 0))
        case DoubleType => row.setDouble(i, current.getDouble(f.name, 0))
        case BooleanType => row.setBoolean(i, current.getBoolean(f.name, 0))
        case StringType =>
          row.update(i, UTF8String.fromString(current.getString(f.name, 0)))
        case dt => throw new UnsupportedOperationException(
          s"graft-manifest streaming read does not support $dt (column ${f.name})")
      }
      i += 1
    }
    row
  }

  override def close(): Unit = reader.close()
}
