package graft.expressions

import org.apache.spark.util.sketch.CountMinSketch

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min kernels — the POINT-LOOKUP member of the frequency half
  * of the sketch family: Misra-Gries ([[MisraGries]]) surfaces a
  * bounded CANDIDATE set (who might be frequent), the Count-Min sketch
  * (Cormode-Muthukrishnan '05; Spark's own spark-sketch implementation,
  * also behind SQL's `count_min_sketch` aggregate) answers "how often
  * did THIS key occur" for ANY key from a fixed-size counter grid —
  * depth×width longs per group no matter how many distinct keys
  * stream past. Two exact properties make it store-grade: estimates
  * NEVER undercount (counters only add), and merging is counter-wise
  * addition — a merge of daily sketches is BIT-IDENTICAL to one sketch
  * built over the union (same seeded hash functions), so a daily
  * sketch table serves any date-range frequency lookup without
  * rescanning events. Overcount is bounded by eps·N with probability
  * 1-delta per lookup.
  *
  * Spark ships the BUILD aggregate (`count_min_sketch(col, eps,
  * confidence, seed)`); these kernels add the two store-side faces it
  * lacks: `graft_cms_merge` (an OR-of-counters rollup aggregate over
  * serialized sketches) and `graft_cms_estimate` (the point lookup).
  * Both CodegenFallback — they run over post-agg sketch tables, never
  * the raw stream. */
object CmsOps {

  /** Per-thread (bytes -> parsed sketch) memo for the point-lookup
    * scalar: probing N keys against one broadcast sketch row would
    * otherwise re-parse the same counter grid N times. Content
    * equality via Arrays.equals — a ~28 KB compare is far cheaper
    * than a readFrom parse, and the memo holds exactly one entry per
    * thread (the probe pattern is many keys against ONE sketch). */
  private val lastParsed: ThreadLocal[(Array[Byte], CountMinSketch)] =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  def estimateMemo(bytes: Array[Byte], key: Long): Long = {
    val cached = lastParsed.get()
    val sk =
      if (cached != null &&
          (cached._1.eq(bytes) || java.util.Arrays.equals(cached._1, bytes)))
        cached._2
      else {
        val parsed = CountMinSketch.readFrom(bytes)
        lastParsed.set((bytes.clone(), parsed))
        parsed
      }
    sk.estimateCount(java.lang.Long.valueOf(key))
  }

  val registrations: Seq[Kernels.Registration] = Seq(
    (FunctionIdentifier("graft_cms_merge"),
      new ExpressionInfo(classOf[CmsMergeAgg].getName, "graft_cms_merge"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_cms_merge(sketch): expects exactly 1 argument")
        CmsMergeAgg(children.head)
      }),
    (FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_cms_estimate(sketch, key): expects exactly 2 arguments")
        CmsEstimate(children(0), Cast(children(1), LongType))
      }))

  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}

/** expr("graft_cms_merge(sk)") -> binary counter-wise sum of
  * serialized Count-Min sketches (all inputs must share depth/width/
  * seed — Spark's mergeInPlace enforces it). Null inputs are ignored;
  * an all-null group evals to null. */
case class CmsMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[CountMinSketch]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_merge"

  // a 1-slot mutable cell: the sketch's dimensions come from the first
  // input, so the empty buffer cannot pre-allocate a grid
  override def createAggregationBuffer(): Array[CountMinSketch] =
    new Array[CountMinSketch](1)

  private def absorb(buf: Array[CountMinSketch], sk: CountMinSketch): Unit =
    if (buf(0) == null) buf(0) = sk else buf(0).mergeInPlace(sk)

  override def update(buf: Array[CountMinSketch],
                      input: InternalRow): Array[CountMinSketch] = {
    val v = child.eval(input)
    if (v != null)
      absorb(buf, CountMinSketch.readFrom(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: Array[CountMinSketch],
                     b: Array[CountMinSketch]): Array[CountMinSketch] = {
    if (b(0) != null) absorb(a, b(0))
    a
  }

  override def eval(buf: Array[CountMinSketch]): Any =
    if (buf(0) == null) null else buf(0).toByteArray

  override def serialize(buf: Array[CountMinSketch]): Array[Byte] =
    if (buf(0) == null) Array.emptyByteArray else buf(0).toByteArray

  override def deserialize(bytes: Array[Byte]): Array[CountMinSketch] = {
    val buf = createAggregationBuffer()
    if (bytes.nonEmpty) buf(0) = CountMinSketch.readFrom(bytes)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = c.head)
}

/** expr("graft_cms_estimate(sk, key)") -> bigint frequency estimate;
  * never below the key's true count. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override protected def nullSafeEval(sk: Any, key: Any): Any =
    CmsOps.estimateMemo(sk.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression): CmsEstimate =
    copy(left = a, right = b)
}
