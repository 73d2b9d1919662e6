package graft.expressions

import java.io.{DataOutputStream, File, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.StandardOpenOption
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter sidecar kernels for the contamination gate
  * (SURVEY.md §2, q_text_contamination_bloom).
  *
  * The production contamination check (eval-set n-gram overlap against
  * the training corpus, per GPT-3 appendix C / [BPMF-era eval hygiene])
  * joins every train document against the eval set. At 100 TB the
  * right shape is a build-once membership sidecar: hash every distinct
  * char-n-gram of the (small, fixed-size) eval suite into a Bloom
  * filter — ~2 bytes per eval n-gram — publish it content-keyed via
  * [[graft.ArtifactStore]], and let the train-side scan test its own
  * n-grams against the bits in one codegen pass. Documents that cannot
  * possibly clear the overlap threshold never reach the candidate
  * join, so the expensive pair stage runs on a sliver of the corpus.
  *
  * Bloom filters have NO false negatives, so the gate is lossless by
  * construction (the caller picks a hit-count bound implied by its
  * Jaccard threshold); false positives only admit extra candidates
  * that the exact confirm stage kills. The contract query's DuckDB
  * oracle therefore states plain exact semantics with no Bloom at all.
  *
  * Wire format of the sidecar (`bloom.bin`, big-endian):
  * magic int 0x42463031 ("BF01"), int numHashes, long mBits, then
  * mBits/64 longs of bits. Executors lazy-load and memoize the words
  * per JVM keyed by file path — the expression ships only the path
  * string; on a cluster the path lives on the shared artifact store.
  *
  * Hash family: one md5 digest per n-gram; h1 = bytes 0-7, h2 = bytes
  * 8-15 (big-endian), position_i = (h1 + i*h2) mod mBits (double
  * hashing, Kirsch-Mitzenmacher). Build and serve share
  * [[positionsInto]], so agreement is structural, not conventional. */
object BloomOps {

  val Magic = 0x42463031

  final case class Loaded(numHashes: Int, mBits: Long, words: Array[Long])

  /** Per-JVM sidecar cache, size-bounded: artifacts are content-keyed,
    * so every corpus rewrite mints a NEW path — an unbounded path-keyed
    * map would pin every superseded bitmap in executor memory for the
    * session's lifetime. The read path stays a LOCK-FREE
    * ConcurrentHashMap hit (`graft_bloom_hits` calls [[load]] once per
    * input ROW, so a global mutex here would serialize every scan
    * thread); eviction is FIFO via an insertion-order queue — for
    * content-keyed paths a superseded entry is dead anyway, so
    * recency-of-access buys nothing over insertion order. 8 sidecars
    * comfortably covers concurrent queries. */
  private val MaxCached = 8
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Loaded]()
  private val insertionOrder = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def write(file: String, numHashes: Int, mBits: Long, words: Array[Long]): Unit = {
    require(mBits > 0 && words.length.toLong == (mBits + 63) / 64,
      s"bloom words ${words.length} do not cover $mBits bits")
    val f = new File(file)
    Option(f.getParentFile).foreach(_.mkdirs())
    val out = new DataOutputStream(new FileOutputStream(f))
    try {
      out.writeInt(Magic)
      out.writeInt(numHashes)
      out.writeLong(mBits)
      words.foreach(out.writeLong)
    } finally out.close()
  }

  def load(file: String): Loaded = {
    val hit = cache.get(file) // lock-free fast path, once per input row
    if (hit != null) return hit
    // enqueue for FIFO eviction only AFTER loadFile succeeds: a throw
    // inside the mapping function leaves no cache entry, and enqueueing
    // first would grow the queue with phantom keys on every task retry
    // against a missing/oversized sidecar
    var inserted = false
    val loaded = cache.computeIfAbsent(file, { f =>
      val l = loadFile(f)
      inserted = true
      l
    })
    if (inserted) insertionOrder.add(file)
    // FIFO-evict outside the compute (never hold the map's bin lock
    // during another entry's file I/O); benign under races — worst
    // case a just-inserted entry is evicted and reloaded on next use
    while (cache.size() > MaxCached) {
      val oldest = insertionOrder.poll()
      if (oldest == null) return loaded
      cache.remove(oldest)
    }
    loaded
  }

  private def loadFile(f: String): Loaded = {
      val ch = FileChannel.open(new File(f).toPath, StandardOpenOption.READ)
      try {
        // .toInt on a >=2 GiB file would go negative and die opaquely
        // inside allocate; fail with the contract error instead
        require(ch.size() <= Int.MaxValue,
          s"bloom sidecar too large to load: ${ch.size()} bytes in $f " +
            s"(limit ${Int.MaxValue}) — shard the eval suite's filter")
        val buf = ByteBuffer.allocate(ch.size().toInt).order(ByteOrder.BIG_ENDIAN)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        buf.flip()
        val magic = buf.getInt()
        require(magic == Magic, f"bad bloom magic 0x$magic%08x in $f")
        val k = buf.getInt()
        val m = buf.getLong()
        val words = new Array[Long](((m + 63) / 64).toInt)
        var i = 0
        while (i < words.length) { words(i) = buf.getLong(); i += 1 }
        Loaded(k, m, words)
      } finally ch.close()
  }

  /** The i-th bit position of `gram` for i in [0, numHashes). Fills
    * `out`; shared by the build-side enumeration and the serve-side
    * membership test. */
  private def positionsInto(gram: String, numHashes: Int, mBits: Long,
                            out: Array[Long]): Unit = {
    val dig = mdLocal.get()
    dig.reset()
    val bytes = dig.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val h1 = bb.getLong(0)
    val h2 = bb.getLong(8)
    var i = 0
    while (i < numHashes) {
      out(i) = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits)
      i += 1
    }
  }

  /** Build face: every bit position of every distinct char-n-gram of
    * `text` — numHashes positions per gram, duplicates across grams
    * preserved (the builder DISTINCTs downstream). */
  def gramPositions(text: UTF8String, n: Int, numHashes: Int,
                    mBits: Long): GenericArrayData = {
    val grams = ShingleOps.cgramSet(text.toString, n)
    val out = new Array[Long](grams.size * numHashes)
    val pos = new Array[Long](numHashes)
    val it = grams.iterator()
    var o = 0
    while (it.hasNext) {
      positionsInto(it.next(), numHashes, mBits, pos)
      var i = 0
      while (i < numHashes) { out(o) = pos(i); o += 1; i += 1 }
    }
    new GenericArrayData(out)
  }

  /** Serve face: how many of `text`'s distinct char-n-grams hit the
    * Bloom sidecar at `file`. Never undercounts the true overlap with
    * the indexed set (no false negatives). */
  def gramHits(text: UTF8String, n: Int, file: UTF8String): Long = {
    val b = load(file.toString)
    val grams = ShingleOps.cgramSet(text.toString, n)
    val pos = new Array[Long](b.numHashes)
    val it = grams.iterator()
    var hits = 0L
    while (it.hasNext) {
      positionsInto(it.next(), b.numHashes, b.mBits, pos)
      var i = 0
      var all = true
      while (all && i < b.numHashes) {
        val p = pos(i)
        all = (b.words((p >>> 6).toInt) & (1L << (p & 63))) != 0
        i += 1
      }
      if (all) hits += 1
    }
    hits
  }

  val registrations: Seq[Kernels.Registration] = Seq(
    (FunctionIdentifier("graft_bloom_bits"),
      new ExpressionInfo(classOf[BloomBitsAgg].getName, "graft_bloom_bits"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_bloom_bits(positions, mBits): expects exactly 2 arguments")
        require(children(1).foldable, "graft_bloom_bits: mBits must be a literal")
        val m = children(1).eval().asInstanceOf[Number].longValue()
        // the full bitmap must byte-serialize through the agg buffer:
        // words * 8 bytes <= Int.MaxValue binds first, at 2^34 - 64
        // bits ((2^28 - 1) longs); anything larger would overflow the
        // Int passed to ByteBuffer.allocate and die at runtime instead
        // of here, and would also breach the 2 GiB sidecar read limit
        require(m >= 1L && m <= (1L << 34) - 64,
          s"graft_bloom_bits: mBits $m outside [1, 2^34 - 64] (the" +
            " serialized bitmap must fit one byte array / the 2 GiB" +
            " sidecar limit) — shard the filter")
        BloomBitsAgg(children.head, m)
      }),
    (FunctionIdentifier("graft_bloom_positions"),
      new ExpressionInfo(classOf[BloomGramPositions].getName, "graft_bloom_positions"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "graft_bloom_positions(text, n, numHashes, mBits): expects exactly 4 arguments")
        BloomGramPositions(
          Cast(children(0), StringType), Cast(children(1), IntegerType),
          Cast(children(2), IntegerType), Cast(children(3), LongType))
      }),
    (FunctionIdentifier("graft_bloom_hits"),
      new ExpressionInfo(classOf[BloomGramHits].getName, "graft_bloom_hits"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_bloom_hits(text, n, path): expects exactly 3 arguments")
        BloomGramHits(
          Cast(children(0), StringType), Cast(children(1), IntegerType),
          Cast(children(2), StringType))
      }))

  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}

/** expr("graft_bloom_bits(positions, mBits)") -> the FULL Bloom bitmap
  * as binary packed big-endian longs, OR-merged executor-side — the
  * distributed build face of the sidecar (the BitmapOps discipline
  * applied to Bloom bit positions): each partial holds mBits/8 bytes
  * of state no matter how many n-grams stream past, partials combine
  * map-side, and the driver receives ONE bitmap instead of collecting
  * distinct positions (whose count grows with the indexed set — the
  * round-12 watch item). Null position arrays are ignored. */
case class BloomBitsAgg(child: Expression, mBits: Long,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_bits"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](((mBits + 63) / 64).toInt)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      val p = arr.getLong(i)
      require(p >= 0L && p < mBits,
        s"graft_bloom_bits: position $p outside [0, $mBits)")
      buf((p >>> 6).toInt) |= 1L << (p & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8).order(ByteOrder.BIG_ENDIAN)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomBitsAgg =
    copy(child = c.head)
}

/** expr("graft_bloom_positions(text, n, numHashes, mBits)") -> array<bigint>. */
case class BloomGramPositions(first: Expression, second: Expression,
                              third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_positions"

  override protected def nullSafeEval(t: Any, n: Any, k: Any, m: Any): Any =
    BloomOps.gramPositions(t.asInstanceOf[UTF8String], n.asInstanceOf[Int],
      k.asInstanceOf[Int], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, k, m) =>
      s"${ev.value} = graft.expressions.BloomOps.gramPositions($t, $n, $k, $m);")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): BloomGramPositions =
    copy(first = a, second = b, third = c, fourth = d)
}

/** expr("graft_bloom_hits(text, n, '/path/bloom.bin')") -> bigint. */
case class BloomGramHits(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bloom_hits"

  override protected def nullSafeEval(t: Any, n: Any, f: Any): Any =
    BloomOps.gramHits(t.asInstanceOf[UTF8String], n.asInstanceOf[Int],
      f.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, f) =>
      s"${ev.value} = graft.expressions.BloomOps.gramHits($t, $n, $f);")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression): BloomGramHits =
    copy(first = a, second = b, third = c)
}
