package graft.sources.v2

import java.io.{BufferedInputStream, EOFException}
import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 batch source for the reference's noisy JSON log format
  * (SURVEY.md §2-G; semantics of `ClickThru.java:97-98` — anything
  * before the first '{' on a line is garbage to strip, unparseable
  * lines are dropped rather than fatal).
  *
  * `spark.read.format("graft-jsonlog").schema(s).load(path)`
  *
  * What makes it an ENGINE component rather than a parse helper:
  *  - **Column pruning is physical**: `SupportsPushDownRequiredColumns`
  *    narrows the Jackson parse to the requested fields — unrequested
  *    fields are token-skipped, never materialized (a 2-column read of
  *    a 40-field log parses 2 fields).
  *  - **Filter pushdown is physical**: `IsNotNull` / string & long
  *    `EqualTo` evaluate inside the reader during the parse, so
  *    non-matching rows never surface into the scan output (and a row
  *    can short-circuit as soon as a pushed filter fails mid-parse).
  *  - **Line-aligned byte-range splits**: files split at
  *    `maxSplitBytes` (default 128 MB) boundaries, TextInputFormat-
  *    style — a reader skips its leading partial line (unless at
  *    offset 0) and reads through its trailing line end, so a 1 TB
  *    log file becomes ~8000 independent partitions instead of one.
  */
class JsonLogDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-jsonlog"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-jsonlog requires an explicit .schema(...) — log lines carry no self-describing schema")
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new JsonLogTable(schema, opts.get("path"),
      Option(opts.get("maxSplitBytes")).map(_.toLong).getOrElse(128L * 1024 * 1024))
  }
}

final class JsonLogTable(schema: StructType, path: String, maxSplitBytes: Long)
    extends Table with SupportsRead {
  require(path != null, "graft-jsonlog requires a path")
  override def name(): String = s"graft-jsonlog($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonLogScanBuilder(schema, path, maxSplitBytes)
}

final class JsonLogScanBuilder(fullSchema: StructType, path: String, maxSplitBytes: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve declared field order; Catalyst may request any order
    required = StructType(fullSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** Accept the filters the reader can evaluate during the parse. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition {
      case IsNotNull(a) => fullSchema.fieldNames.contains(a)
      case EqualTo(a, _: String) =>
        fullSchema.fields.exists(f => f.name == a && f.dataType == StringType)
      case EqualTo(a, _: Long) =>
        fullSchema.fields.exists(f => f.name == a && f.dataType == LongType)
      case _ => false
    }
    pushed = sup
    unsup
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new JsonLogScan(fullSchema, required, pushed, path, maxSplitBytes)
}

final case class JsonLogInputPartition(file: String, start: Long, end: Long)
  extends InputPartition

final class JsonLogScan(fullSchema: StructType, required: StructType,
                        val pushed: Array[Filter], path: String, maxSplitBytes: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-jsonlog $path ReadSchema: ${required.simpleString} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val files = {
      val st = fs.getFileStatus(new Path(path))
      // Hadoop hidden-file convention: _SUCCESS markers and .crc
      // checksum siblings in a written directory are metadata, not log
      // lines — the same exclusion FileInputFormat applies.
      if (st.isDirectory)
        fs.listStatus(new Path(path)).filter(f => f.isFile && {
          val n = f.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }).toSeq
      else Seq(st)
    }
    files.flatMap { f =>
      // line-aligned range splits: reader at offset s>0 skips its first
      // partial line; each reader reads THROUGH the line spanning `end`
      (0L until math.max(f.getLen, 1L) by maxSplitBytes).map { s =>
        JsonLogInputPartition(f.getPath.toString, s,
          math.min(s + maxSplitBytes, f.getLen))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // the reader must PARSE filter-referenced fields even when Catalyst
    // pruned them from the output (a fully-pushed filter's column is no
    // longer read downstream) — parse schema ⊇ read schema, and the
    // emitted row projects back down to the read schema
    val filterRefs = pushed.flatMap(_.references).toSet
    val parseSchema = StructType(fullSchema.fields.filter(f =>
      required.fieldNames.contains(f.name) || filterRefs.contains(f.name)))
    val outIdx = required.fieldNames.map(parseSchema.fieldIndex)
    val schema = required
    val filters = pushed
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[JsonLogInputPartition]
      new JsonLogPartitionReader(p, parseSchema, outIdx, filters)
    }
  }
}

/** Streams one byte-range of one file: finds line boundaries, strips
  * the pre-'{' noise, Jackson-parses ONLY `schema`'s fields (read
  * columns ∪ pushed-filter columns), applies the pushed filters, and
  * emits InternalRows projected to `outIdx` (the read schema). */
final class JsonLogPartitionReader(part: JsonLogInputPartition,
                                   schema: StructType, outIdx: Array[Int],
                                   filters: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val fs = new Path(part.file).getFileSystem(new Configuration())
  private val in = fs.open(new Path(part.file))
  private val buffered = {
    in.seek(part.start)
    new BufferedInputStream(in, 64 * 1024)
  }
  private var pos = part.start
  private val jsonFactory = new JsonFactory()
  private val fieldIndex: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap
  private var current: InternalRow = _

  // a reader not at offset 0 starts mid-line: its first (partial) line
  // belongs to the previous split — skip it
  if (part.start > 0) readLine()

  /** Next raw line, or null at EOF. A line STARTING at or before `end`
    * belongs to this split (we read through its terminator even past
    * `end`); a line starting after `end` belongs to the next split. */
  private def readLine(): String = {
    if (pos > part.end) return null // next line starts past our range
    val bytes = new java.io.ByteArrayOutputStream(256)
    var b = buffered.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      bytes.write(b)
      b = buffered.read()
      pos += 1
    }
    pos += 1 // the newline (or EOF step)
    new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  override def next(): Boolean = {
    var line = readLine()
    while (line != null) {
      val row = parse(line)
      if (row != null) { current = row; return true }
      line = readLine()
    }
    false
  }

  /** Parse only `schema`'s fields; null (drop) on malformed payloads,
    * missing '{', all-null rows, or a failed pushed filter. */
  private def parse(line: String): InternalRow = {
    val brace = line.indexOf('{')
    if (brace < 0) return null
    val vals = new Array[Any](schema.length)
    var any = false
    try {
      val p: JsonParser = jsonFactory.createParser(line.substring(brace))
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null
        while (p.nextToken() == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          p.nextToken()
          fieldIndex.get(name) match {
            case Some(i) =>
              val v: Any = schema.fields(i).dataType match {
                case StringType =>
                  if (p.currentToken() == JsonToken.VALUE_NULL) null
                  else UTF8String.fromString(p.getValueAsString)
                case LongType =>
                  if (p.currentToken() == JsonToken.VALUE_NUMBER_INT) p.getLongValue else null
                case DoubleType =>
                  if (p.currentToken().isNumeric) p.getDoubleValue else null
                case BooleanType =>
                  if (p.currentToken().isBoolean) p.getBooleanValue else null
                case _ => null
              }
              vals(i) = v
              if (v != null) any = true
            case None => p.skipChildren() // unrequested field: token-skip, never materialize
          }
        }
      } finally p.close()
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => return null
      case _: EOFException => return null
    }
    if (!any) return null // PERMISSIVE-equivalent: all-null parse is a poison line
    val row = InternalRow.fromSeq(vals.toIndexedSeq)
    if (accept(row)) InternalRow.fromSeq(outIdx.toIndexedSeq.map(vals))
    else null
  }

  private def accept(row: InternalRow): Boolean = filters.forall {
    case IsNotNull(a) => !row.isNullAt(fieldIndex(a))
    case EqualTo(a, v: String) =>
      val i = fieldIndex(a)
      !row.isNullAt(i) && row.getUTF8String(i) == UTF8String.fromString(v)
    case EqualTo(a, v: Long) =>
      val i = fieldIndex(a)
      !row.isNullAt(i) && row.getLong(i) == v
    case _ => true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
