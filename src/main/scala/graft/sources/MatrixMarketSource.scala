package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.io.compress.CompressionCodecFactory
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
import org.apache.spark.sql.SparkSession

/** Hadoop Configuration is not Serializable; this is the standard
  * write/readFields envelope so executor-side readers and writers see
  * the SESSION'S Hadoop conf (spark.hadoop.* keys — S3A credentials,
  * defaultFS, codecs) instead of a bare `new Configuration()` that
  * only knows static defaults. */
private final class SerializableHadoopConf(@transient var value: Configuration)
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

private object MmConf {
  /** Driver-side: the active session's Hadoop conf (falls back to
    * defaults outside a session, e.g. in narrow unit tests). */
  def driver(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
}

/** DataSource V2 connector for MatrixMarket coordinate files:
  * `spark.read.format("matrixmarket").load(path)` — the first-class
  * Spark face of [[MatrixMarket.read]] (same schema, same 0-based-id
  * semantics; SURVEY.md §2.A A2).
  *
  * Banner semantics ([[MatrixMarket.parseBanner]]): `real`/`integer`/
  * `pattern` fields and `general`/`symmetric` symmetry are supported —
  * symmetric files mirror every off-diagonal stored entry (the flag
  * rides on each split, so mirroring is exact across byte-range
  * boundaries); `complex`/`hermitian`/`skew-symmetric`/dense `array`
  * reject loudly at PLANNING time (reader-side for single-split
  * compressed files, where the planner cannot see the banner).
  *
  * Scale design: files are split by BYTE RANGE (default 32 MB,
  * `maxSplitBytes` option) with the per-file header (comment block +
  * dims line) resolved at PLANNING time: the driver reads just the
  * header bytes of each file (bounded, 1 MB cap) and plans splits
  * starting AFTER it, so no reader ever sees banner/dims and a header
  * longer than one split cannot leak the dims line into a later split
  * as a bogus data row; a header past the 1 MB scan cap falls back to
  * one reader-side-skip split rather than corrupting. Bare COO shards
  * (no `%` first byte) plan from byte 0 unchanged. COMPRESSED files
  * (any codec — byte offsets aren't line offsets under compression)
  * get ONE split and skip their header reader-side. The only
  * driver-side I/O is the bounded per-file header scan at planning
  * time. Line-boundary semantics are Hadoop's LineRecordReader
  * contract. Column pruning is pushed into the reader
  * ([[SupportsPushDownRequiredColumns]]). A missing or empty glob is
  * an error, matching the built-in file sources — never a silent
  * empty scan.
  *
  * Write path: see [[MmBatchWrite]] (sharded COO + header folded from
  * task commit messages, temp-file + rename-on-commit protocol). */
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
    new MmWriteBuilder(info.options().asScala.toMap ++ props, info.schema(),
      info.queryId())
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

  /** (data-start offset, banner line). Offset is the byte offset of
    * the first data line: 0 for bare COO files; for headered files
    * (first byte `%`), the offset just past the dims line. Offset -1
    * means the header is still open after `cap` bytes — the caller
    * then falls back to a single reader-side-skip split rather than
    * planning from a mid-header offset (which would emit the dims
    * line as a bogus data row). The banner is the file's literal
    * first line when it starts with `%` (first 4 KB — banners are one
    * short line), so the planner can validate field/symmetry and set
    * the mirror flag BEFORE any split runs. */
  private def headerScan(fs: org.apache.hadoop.fs.FileSystem, f: FileStatus,
      cap: Long = 1L << 20): (Long, Option[String]) = {
    val in = new java.io.BufferedInputStream(fs.open(f.getPath), 64 * 1024)
    try {
      var pos = 0L
      var lineStart = true
      var commentLine = false // is the CURRENT line a comment/blank?
      val first = new java.lang.StringBuilder(96)
      var inFirst = true
      var b = in.read()
      if (b != '%') return (0L, None) // bare COO shard: no header at all
      while (b != -1 && pos < cap) {
        if (lineStart) {
          commentLine = b == '%' || b == '\n'
          lineStart = false
        }
        if (inFirst) {
          if (b == '\n') inFirst = false
          else if (first.length < 4096) first.append(b.toChar)
        }
        pos += 1
        if (b == '\n') {
          if (!commentLine) return (pos, Some(first.toString)) // dims line ended
          lineStart = true
        }
        b = in.read()
      }
      val banner = if (first.length > 0) Some(first.toString) else None
      if (b == -1) (pos, banner) // header-only file: no data bytes follow
      else (-1L, banner) // header longer than the cap: reader handles it
    } finally in.close()
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException("matrixmarket: path required"))
    val maxSplit = opts.getOrElse("maxSplitBytes", (32L << 20).toString).toLong
    require(maxSplit > 0, "maxSplitBytes must be positive")
    val conf = MmConf.driver()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val globbed = fs.globStatus(p)
    if (globbed == null || globbed.isEmpty)
      throw new IllegalArgumentException(s"matrixmarket: path not found: $path")
    // recursive listing: partitioned layouts nest parts under
    // subdirectories; dropping them silently would contradict the
    // "never a silent empty scan" contract. Hidden (_/.)-prefixed
    // files AND directories are metadata, skipped at every level.
    def listFiles(st: FileStatus): Array[FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).filter { c =>
          val n = c.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }.flatMap(listFiles)
      else Array(st)
    val files = globbed.flatMap(listFiles)
    val codecs = new CompressionCodecFactory(conf)
    files.flatMap { f =>
      val len = f.getLen
      val codec = codecs.getCodec(f.getPath)
      if (len == 0) Nil
      else if (codec != null) {
        // ANY compressed file reads as ONE split with the header AND
        // banner handled reader-side: byte offsets aren't line offsets
        // under compression, so the planner-side header scan cannot
        // apply (a splittable codec like bz2 would ALSO need
        // codec-aligned split boundaries — future work; one split is
        // always correct)
        Seq(MmInputPartition(f.getPath.toString, 0L, len,
          skipHeaderInReader = true, mirror = false,
          pattern = false): InputPartition)
      } else {
        // header resolved here; splits never contain banner or dims.
        // A first split starting at ds-1 (the header's trailing \n)
        // rides LineRecordReader's "discard up to the first newline
        // when start != 0" rule to land exactly on the first data byte.
        // The banner validates at PLANNING time: a complex/hermitian
        // file fails the query on the driver before any task runs.
        val (ds, bannerLine) = headerScan(fs, f)
        val banner = MatrixMarket.bannerOf(bannerLine)
        if (ds < 0) {
          // header longer than the scan cap: one split, reader-side
          // skip (correct for arbitrarily long headers, not parallel);
          // the reader re-derives mirror/pattern from the banner it
          // skips, so pass the planner's view for consistency
          Seq(MmInputPartition(f.getPath.toString, 0L, len,
            skipHeaderInReader = true, mirror = banner.mirror,
            pattern = banner.pattern): InputPartition)
        } else {
          val s0 = if (ds == 0) 0L else ds - 1
          (s0 until len by maxSplit).map { start =>
            MmInputPartition(f.getPath.toString, start,
              math.min(maxSplit, len - start),
              skipHeaderInReader = false, mirror = banner.mirror,
              pattern = banner.pattern): InputPartition
          }
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MmReaderFactory(required, new SerializableHadoopConf(MmConf.driver()))
}

private final case class MmInputPartition(path: String, start: Long,
    length: Long, skipHeaderInReader: Boolean, mirror: Boolean,
    pattern: Boolean) extends InputPartition

/** Distributed write: each task streams its partition to a HIDDEN
  * temp file (`.part-<pid>-<tid>.mtx.tmp` — invisible to the reader's
  * directory listing) and RENAMES it to `part-<pid>-<tid>.mtx` only
  * at task commit, so an executor lost mid-write can never leave a
  * visible orphan shard next to its retry's output. Task commit
  * returns (maxRow, maxCol, count); the job commit folds the messages
  * into the global dims, writes `path/header.mtx` (banner + dims
  * line), and sweeps any leftover temp files. No data pass ever runs
  * on the driver — the dims come from the tasks' running maxima, and
  * `cat header.mtx part-*.mtx` (or the reader on the directory)
  * reassembles a conforming file. Truncate (SaveMode.Overwrite)
  * clears prior part/header/temp files before the new ones land. */
private final class MmWriteBuilder(opts: Map[String, String],
    schema: StructType, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    require(schema.fieldNames.toSeq == Seq("row", "col", "v"),
      s"matrixmarket write needs (row, col, v); got ${schema.fieldNames.mkString(",")}")
    val path = opts.getOrElse("path",
      throw new IllegalArgumentException("matrixmarket: path required"))
    new Write {
      override def toBatch: BatchWrite =
        new MmBatchWrite(path, doTruncate, queryId)
    }
  }
}

private final case class MmCommit(maxRow: Long, maxCol: Long, count: Long,
    file: String) extends WriterCommitMessage

private final class MmBatchWrite(path: String, truncate: Boolean,
    queryId: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = MmConf.driver()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    if (truncate) {
      Option(fs.listStatus(dir)).getOrElse(Array.empty).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("part-") || n == "header.mtx" ||
            ((n.startsWith(".part-") || n.startsWith(".header-")) &&
              n.endsWith(".tmp")))
          fs.delete(st.getPath, false)
      }
    }
    new MmWriterFactory(path, new SerializableHadoopConf(conf), queryId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.collect { case m: MmCommit => m }
    var nnz = ms.map(_.count).sum
    // dims from the data's maxima (0-based ids -> +1), like
    // MatrixMarket.write; an empty write records a 0x0 matrix
    var rows = if (nnz == 0) 0L else ms.map(_.maxRow).max + 1
    var cols = if (nnz == 0) 0L else ms.map(_.maxCol).max + 1
    val conf = MmConf.driver()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val hp = new Path(dir, "header.mtx")
    // append into a directory this connector already wrote: fold the
    // standing header so dims/nnz keep describing ALL part files, not
    // just this job's (truncate deletes the header first, so overwrite
    // starts clean)
    if (fs.exists(hp)) {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(hp), "UTF-8"))
      try {
        var line = in.readLine()
        while (line != null && line.startsWith("%")) line = in.readLine()
        // a header that exists but cannot be parsed means the standing
        // counts are unrecoverable: FAIL the append loudly rather than
        // silently rewriting a header that undercounts prior parts
        val d = Option(line).map(_.trim.split("\\s+")).getOrElse(Array.empty)
        if (d.length != 3)
          throw new IllegalStateException(
            s"matrixmarket: corrupt header $hp ('$line') - repair it or " +
              "write with mode=overwrite")
        try {
          rows = math.max(rows, d(0).toLong)
          cols = math.max(cols, d(1).toLong)
          nnz += d(2).toLong
        } catch {
          case e: NumberFormatException =>
            throw new IllegalStateException(
              s"matrixmarket: corrupt header $hp ('$line')", e)
        }
      } finally in.close()
    }
    // write-to-temp + swap: a crash mid-rewrite never leaves a
    // truncated header (the standing one survives until the rename;
    // the delete+rename pair is the narrowest window the FS API
    // allows without a coordinator)
    val htmp = new Path(dir, s".header-$queryId.mtx.tmp")
    val out = fs.create(htmp, true)
    out.write(
      s"%%MatrixMarket matrix coordinate real general\n$rows $cols $nnz\n"
        .getBytes("UTF-8"))
    out.close()
    if (fs.exists(hp)) fs.delete(hp, false)
    if (!fs.rename(htmp, hp))
      throw new java.io.IOException(
        s"matrixmarket: rename $htmp -> $hp failed")
    // sweep temps from THIS write's dead attempts only (names embed
    // the queryId) — a concurrent append's live temps must survive, or
    // its task commits would fail on the missing rename source. Temps
    // are hidden, so reads were safe even before this.
    Option(fs.listStatus(dir)).getOrElse(Array.empty).foreach { st =>
      val n = st.getPath.getName
      if ((n.startsWith(".part-") || n.startsWith(".header-")) &&
          n.endsWith(".tmp") && n.contains(queryId))
        fs.delete(st.getPath, false)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = MmConf.driver()
    messages.collect { case m: MmCommit => m }.foreach { m =>
      val p = new Path(m.file)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }
}

private final class MmWriterFactory(path: String,
    conf: SerializableHadoopConf, queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new MmDataWriter(path, partitionId, taskId, conf, queryId)
}

private final class MmDataWriter(path: String, partitionId: Int, taskId: Long,
    conf: SerializableHadoopConf, queryId: String)
    extends DataWriter[InternalRow] {
  // queryId (a UUID per write) makes shard names unique ACROSS
  // applications: a fresh SparkContext restarts taskId at 0, and
  // without the uid a later app's append would rename over an earlier
  // app's shard while the header fold still counted its rows
  private val tmp =
    new Path(path, f".part-$partitionId%05d-$taskId-$queryId.mtx.tmp")
  private val dst =
    new Path(path, f"part-$partitionId%05d-$taskId-$queryId.mtx")
  private val fs = tmp.getFileSystem(conf.value)
  private val out =
    new java.io.BufferedOutputStream(fs.create(tmp, true), 1 << 16)
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
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"matrixmarket: rename $tmp -> $dst failed")
    MmCommit(maxRow, maxCol, count, dst.toString)
  }

  override def abort(): Unit = {
    // close() flushes buffered bytes and can throw on the very failure
    // (disk full, dead filesystem) that triggered the abort — the
    // temp delete must run regardless
    try out.close()
    catch { case _: java.io.IOException => }
    finally if (fs.exists(tmp)) fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}

private final class MmReaderFactory(required: StructType,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MmPartitionReader(partition.asInstanceOf[MmInputPartition], required, conf)
}

/** Parses one byte-range split. LineRecordReader handles boundary
  * semantics (skip the partial first line unless start == 0; read one
  * record past `end` if the last line crosses it) and decompression.
  * Splits of uncompressed files never contain the header — the
  * planner starts them past it — so the in-reader header skip only
  * runs for single-split compressed files (`skipHeaderInReader`),
  * where it is banner-gated: bare COO shards lose nothing. */
private final class MmPartitionReader(split: MmInputPartition,
    required: StructType, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {
  private val reader = {
    val r = new org.apache.hadoop.mapreduce.lib.input.LineRecordReader()
    val fsplit = new FileSplit(
      new Path(split.path), split.start, split.length, Array.empty[String])
    r.initialize(fsplit,
      new TaskAttemptContextImpl(conf.value, new TaskAttemptID()))
    r
  }
  // column projection resolved once per split, not per row
  private val proj: Array[Int] = required.fieldNames.map {
    case "row" => 0
    case "col" => 1
    case "v" => 2
  }
  private var firstLine = split.skipHeaderInReader
  private var headerPending = false
  // mirror/pattern come from the planner's banner scan; single-split
  // files that skip their header reader-side (compressed, capped) see
  // the banner themselves and re-derive — parseBanner throws here for
  // unsupported forms, failing the task loudly, never dropping values
  private var mirror = split.mirror
  private var pattern = split.pattern
  private var current: InternalRow = _
  private var pending: InternalRow = _ // mirrored twin of `current`

  private def toRow(row: Long, col: Long, v: Double): InternalRow =
    InternalRow.fromSeq(proj.map {
      case 0 => row: java.lang.Long
      case 1 => col: java.lang.Long
      case 2 => v: java.lang.Double
    }.toIndexedSeq)

  override def next(): Boolean = {
    if (pending != null) { // symmetric: emit the stashed (col, row, v)
      current = pending
      pending = null
      return true
    }
    while (reader.nextKeyValue()) {
      val line = reader.getCurrentValue.toString
      val t = line.trim
      if (firstLine) {
        firstLine = false
        headerPending = t.startsWith("%")
        if (t.startsWith("%%MatrixMarket") || t.startsWith("%%matrixmarket")) {
          val b = MatrixMarket.parseBanner(t)
          mirror = b.mirror
          pattern = b.pattern
        }
      }
      if (t.nonEmpty && !t.startsWith("%")) {
        if (headerPending) {
          headerPending = false // dims line: consumed, not emitted
        } else {
          val f = t.split("\\s+")
          val row = f(0).toLong - 1
          val col = f(1).toLong - 1
          val v = if (!pattern && f.length > 2) f(2).toDouble else 1.0
          current = toRow(row, col, v)
          if (mirror && row != col) pending = toRow(col, row, v)
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
