package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.lib.input.FileSplit
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

private final class MmTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"matrixmarket(${props.getOrElse("path", "?")})"
  override def schema(): StructType = MatrixMarket.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MmScanBuilder(options.asScala.toMap ++ props)
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

private final class MmReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MmPartitionReader(partition.asInstanceOf[MmInputPartition], required)
}

/** Parses one byte-range split. LineRecordReader handles boundary
  * semantics (skip the partial first line unless start == 0; read one
  * record past `end` if the last line crosses it). The header (first
  * non-comment line) is skipped only by the split that starts at
  * byte 0 — for a conforming file it is always inside that split. */
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
  private var headerPending = split.start == 0L
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (reader.nextKeyValue()) {
      val line = reader.getCurrentValue.toString
      val t = line.trim
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
