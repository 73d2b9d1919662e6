package graft.expressions

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** KLL quantile sketch kernels — the DATA-DEPENDENT member of the
  * quantile half of the sketch-store family. The equi-width histogram
  * store (`q_agg_quantile_persisted`) needs a global domain pass to fix
  * its bin edges up front, and its error is one bin WIDTH — fine for a
  * bounded, known domain, badly sized for heavy-tailed value
  * distributions (one hot bin swallows the tail). KLL (Karnin-Lang-
  * Liberty, FOCS'16; Apache DataSketches implementation, shipped with
  * Spark) is the production answer: no domain pass, state O(k log n),
  * and a NORMALIZED-RANK error guarantee (~1.65% at k=200) that is
  * distribution-independent — the estimate for rank p is a true data
  * value whose exact rank lies within eps of p, no matter how skewed
  * the values.
  *
  * Mergeability is the point at 100 TB: per-partition/per-day sketches
  * are a few KB each, merge associatively (the shuffle carries sketch
  * bytes, never values), and a persisted sketch table serves any
  * percentile later without rescanning raw data — same build-once/
  * serve-many lifecycle as the HLL and histogram stores.
  *
  * Determinism note: KLL compaction flips coins, so two BUILDS of the
  * same data may differ in which sample values survive (each within
  * the rank guarantee). The store pattern absorbs this: the sketch
  * table is built ONCE (content-keyed ArtifactStore), and every serve
  * from a given artifact is exact-deterministic. The substitute spec
  * pins the rank-error bound and merge validity, not bit-equality of
  * independent builds. Values are LONGS (exact cents per the Det
  * discipline) so the served quantiles are exact data values. */
object KllOps {

  def quantile(bytes: Array[Byte], rank: Double): Any = {
    val sk = KllLongsSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) null
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }

  val registrations: Seq[Kernels.Registration] = Seq(
    (FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[KllAgg].getName, "graft_kll_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_kll_agg(value, k): expects exactly 2 arguments")
        require(children(1).foldable, "graft_kll_agg: k must be a literal")
        val kL = children(1).eval().asInstanceOf[Number].longValue()
        require(kL >= 8L && kL <= 65535L,
          s"graft_kll_agg: k $kL outside the KLL range [8, 65535]")
        KllAgg(Cast(children.head, LongType), kL.toInt)
      }),
    (FunctionIdentifier("graft_kll_merge"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "graft_kll_merge"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_kll_merge(sketch): expects exactly 1 argument")
        KllMergeAgg(children.head)
      }),
    (FunctionIdentifier("graft_kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "graft_kll_quantile"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_kll_quantile(sketch, rank): expects exactly 2 arguments")
        KllQuantile(children(0), Cast(children(1), DoubleType))
      }))

  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}

/** expr("graft_kll_agg(value, k)") -> binary serialized KllLongsSketch.
  * Null values are ignored. */
case class KllAgg(child: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllLongsSketch] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_agg"

  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)

  override def update(buf: KllLongsSketch, input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KllLongsSketch, b: KllLongsSketch): KllLongsSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllLongsSketch): Any = buf.toByteArray

  override def serialize(buf: KllLongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllAgg =
    copy(child = c.head)
}

/** expr("graft_kll_merge(sk)") -> binary union of serialized sketches.
  * The buffer IS the first sketch seen (heapified images are
  * updatable), so the union genuinely runs at the inputs' k — a
  * fixed-k buffer would silently re-compact high-k sketches down to
  * ITS level capacities and degrade the rank guarantee the caller
  * paid for. Null inputs are ignored; an all-null/empty group evals
  * to an empty default sketch (whose quantile serve returns null). */
case class KllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[KllLongsSketch]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_merge"

  // a 1-slot mutable cell: the union must adopt the FIRST input's k,
  // which is unknown until that input arrives
  override def createAggregationBuffer(): Array[KllLongsSketch] =
    new Array[KllLongsSketch](1)

  private def absorb(buf: Array[KllLongsSketch], sk: KllLongsSketch): Unit =
    if (buf(0) == null) buf(0) = sk else buf(0).merge(sk)

  override def update(buf: Array[KllLongsSketch],
                      input: InternalRow): Array[KllLongsSketch] = {
    val v = child.eval(input)
    if (v != null)
      absorb(buf, KllLongsSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: Array[KllLongsSketch],
                     b: Array[KllLongsSketch]): Array[KllLongsSketch] = {
    if (b(0) != null) absorb(a, b(0))
    a
  }

  private def result(buf: Array[KllLongsSketch]): KllLongsSketch =
    if (buf(0) == null) KllLongsSketch.newHeapInstance() else buf(0)

  override def eval(buf: Array[KllLongsSketch]): Any = result(buf).toByteArray

  override def serialize(buf: Array[KllLongsSketch]): Array[Byte] =
    if (buf(0) == null) Array.emptyByteArray else buf(0).toByteArray
  override def deserialize(bytes: Array[Byte]): Array[KllLongsSketch] = {
    val buf = createAggregationBuffer()
    if (bytes.nonEmpty)
      buf(0) = KllLongsSketch.heapify(Memory.wrap(bytes))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = c.head)
}

/** expr("graft_kll_quantile(sk, rank)") -> bigint data value whose
  * normalized rank is within the sketch's eps of `rank` (INCLUSIVE
  * search); null for an empty sketch. CodegenFallback: the serve path
  * runs over the tiny post-agg sketch table (one row per group), never
  * the raw data, so codegen would buy nothing. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantile"

  override protected def nullSafeEval(sk: Any, rank: Any): Any =
    KllOps.quantile(sk.asInstanceOf[Array[Byte]], rank.asInstanceOf[Double])

  override protected def withNewChildrenInternal(a: Expression, b: Expression): KllQuantile =
    copy(left = a, right = b)
}
