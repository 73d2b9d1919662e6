package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.lib.input.FileSplit
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for MatrixMarket coordinate files:
  * `spark.read.format("matrixmarket").load(path)` — the first-class
  * Spark face of [[MatrixMarket.read]] (same schema, same 0-based-id
  * semantics; SURVEY.md §2.A A2).
  *
  * Scale design: files are split by BYTE RANGE (default 32 MB,
  * `maxSplitBytes` option) and each split parses its own lines with
  * Hadoop's LineRecordReader — the standard "start after the first
  * newline at-or-past `start`, read through the record that crosses
  * `end`" contract, so a 100 TB .mtx parallelizes like any text scan
  * and NOTHING is ever read on the driver (the per-file header line
  * is consumed by the split that owns byte 0 of that file, where
  * LineRecordReader places it by construction — comments and the dims
  * line live at the top of a conforming file). Column pruning is
  * pushed into the reader ([[SupportsPushDownRequiredColumns]]): a
  * `select(count-ish)` plan parses only the surviving columns.
  *
  * Write path stays [[MatrixMarket.write]] (header part + body parts).
  */
class MatrixMarketSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "matrixmarket"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MatrixMarket.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MmTable(properties.asScala.toMap)
}

private final class MmTable(props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    s"matrixmarket(${props.getOrElse("path", "?")})"
  override def schema(): StructType = MatrixMarket.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MmScanBuilder(options.asScala.toMap ++ props)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MmWriteBuilder(info.options().asScala.toMap ++ props, info.schema())
}

private final class MmScanBuilder(opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = MatrixMarket.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order; an empty prune (count(*)) keeps
    // zero fields and the reader emits empty rows
    required = StructType(
      MatrixMarket.schema.filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new MmScan(opts, required)
}

private final class MmScan(opts: Map[String, String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"MatrixMarket ${opts.getOrElse("path", "?")} cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException("matrixmarket: path required"))
    val maxSplit = opts.getOrElse("maxSplitBytes", (32L << 20).toString).toLong
    require(maxSplit > 0, "maxSplitBytes must be positive")
    val conf = new Configuration()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = fs.globStatus(p) match {
      case null => Array.empty[org.apache.hadoop.fs.FileStatus]
      case sts => sts.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).filter(f => f.isFile &&
            !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
        else Array(st)
      }
    }
    files.flatMap { f =>
      val len = f.getLen
      if (len == 0) Nil
      else (0L until len by maxSplit).map { start =>
        MmInputPartition(f.getPath.toString, start,
          math.min(maxSplit, len - start)): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MmReaderFactory(required)
}

private final case class MmInputPartition(path: String, start: Long, length: Long)
    extends InputPartition

/** Distributed write: each task streams its partition to
  * `path/part-<pid>-<tid>.mtx` (bare 1-based COO lines, no header) and
  * commits (maxRow, maxCol, count); the job commit folds the messages
  * into the global dims and writes `path/header.mtx` (banner + dims
  * line). No data pass ever runs on the driver — the dims come from
  * the tasks' running maxima, and `cat header.mtx part-*.mtx` (or the
  * banner-gated reader on the directory) reassembles a conforming
  * file. Truncate (SaveMode.Overwrite) clears prior part/header files
  * before the new ones land. */
private final class MmWriteBuilder(opts: Map[String, String], schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    require(schema.fieldNames.toSeq == Seq("row", "col", "v"),
      s"matrixmarket write needs (row, col, v); got ${schema.fieldNames.mkString(",")}")
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException("matrixmarket: path required"))
    new Write {
      override def toBatch: BatchWrite = new MmBatchWrite(path, doTruncate)
    }
  }
}

private final case class MmCommit(maxRow: Long, maxCol: Long, count: Long,
    file: String) extends WriterCommitMessage

private final class MmBatchWrite(path: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new Configuration()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    if (truncate) {
      Option(fs.listStatus(dir)).getOrElse(Array.empty).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("part-") || n == "header.mtx")
          fs.delete(st.getPath, false)
      }
    }
    new MmWriterFactory(path)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: MmCommit => m }
    val nnz = ms.map(_.count).sum
    // dims from the data's maxima (0-based ids -> +1), like
    // MatrixMarket.write; an empty write records a 0x0 matrix
    val rows = if (nnz == 0) 0L else ms.map(_.maxRow).max + 1
    val cols = if (nnz == 0) 0L else ms.map(_.maxCol).max + 1
    val conf = new Configuration()
    val hp = new Path(path, "header.mtx")
    val fs = hp.getFileSystem(conf)
    val out = fs.create(hp, true)
    out.write(
      s"%%MatrixMarket matrix coordinate real general\n$rows $cols $nnz\n"
        .getBytes("UTF-8"))
    out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    messages.collect { case m: MmCommit => m }.foreach { m =>
      val p = new Path(m.file)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }
}

private final class MmWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new MmDataWriter(path, partitionId, taskId)
}

private final class MmDataWriter(path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val file = new Path(path, f"part-$partitionId%05d-$taskId.mtx")
  private val out = {
    val fs = file.getFileSystem(new Configuration())
    new java.io.BufferedOutputStream(fs.create(file, true), 1 << 16)
  }
  private var maxRow = -1L
  private var maxCol = -1L
  private var count = 0L

  override def write(record: InternalRow): Unit = {
    val r = record.getLong(0)
    val c = record.getLong(1)
    val v = record.getDouble(2)
    if (r > maxRow) maxRow = r
    if (c > maxCol) maxCol = c
    count += 1
    out.write(s"${r + 1} ${c + 1} $v\n".getBytes("UTF-8"))
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    MmCommit(maxRow, maxCol, count, file.toString)
  }

  override def abort(): Unit = {
    out.close()
    val fs = file.getFileSystem(new Configuration())
    if (fs.exists(file)) fs.delete(file, false)
  }

  override def close(): Unit = ()
}

private final class MmReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MmPartitionReader(partition.asInstanceOf[MmInputPartition], required)
}

/** Parses one byte-range split. LineRecordReader handles boundary
  * semantics (skip the partial first line unless start == 0; read one
  * record past `end` if the last line crosses it). Header detection is
  * BANNER-GATED: a conforming .mtx opens with a `%` banner/comment
  * block followed by the dims line, so the split that owns byte 0
  * skips the first non-comment line ONLY if the file's first byte is
  * `%` — bare COO part files (the write path's body shards) start
  * straight with data and lose nothing. */
private final class MmPartitionReader(split: MmInputPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val reader = {
    val conf = new Configuration()
    val r = new org.apache.hadoop.mapreduce.lib.input.LineRecordReader()
    val fsplit = new FileSplit(
      new Path(split.path), split.start, split.length, Array.empty[String])
    r.initialize(fsplit, new TaskAttemptContextImpl(conf, new TaskAttemptID()))
    r
  }
  // column projection resolved once per split, not per row
  private val proj: Array[Int] = required.fieldNames.map {
    case "row" => 0
    case "col" => 1
    case "v" => 2
  }
  private var firstLine = split.start == 0L
  private var headerPending = false
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      val line = reader.getCurrentValue.toString
      val t = line.trim
      if (firstLine) {
        firstLine = false
        headerPending = t.startsWith("%")
      }
      if (t.nonEmpty && !t.startsWith("%")) {
        if (headerPending) {
          headerPending = false // dims line: consumed, not emitted
        } else {
          val f = t.split("\\s+")
          val row = f(0).toLong - 1
          val col = f(1).toLong - 1
          val v = if (f.length > 2) f(2).toDouble else 1.0
          val values = proj.map {
            case 0 => row: java.lang.Long
            case 1 => col: java.lang.Long
            case 2 => v: java.lang.Double
          }
          current = InternalRow.fromSeq(values.toIndexedSeq)
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
