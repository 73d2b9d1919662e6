package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch, Union}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Theta sketch kernels — the SET-OPERABLE approximate member of the
  * sketch-store family, closing the matrix the other sketches leave
  * open: HLL gives distinct counts with lossless unions but NO
  * intersection operator; the fixed-domain bitmap gives EXACT
  * intersections but demands dense dictionary-encoded integer keys.
  * The theta sketch (Dasgupta et al., "Theta-Sketch Framework";
  * Apache DataSketches, shipped with Spark) keeps a uniform hash
  * sample below an adaptive threshold θ, so it supports union AND
  * intersection (and difference) estimates over ARBITRARY key domains
  * — the retention/cohort query on raw string or sparse keys at
  * 100 TB, where the bitmap's dense-domain precondition fails and
  * HLL's inclusion-exclusion error compounds.
  *
  * Wire state is one compact sketch per group — ≤ ~8·2^lgK bytes no
  * matter how many rows stream past; merges are map-side combining.
  * Estimates are INSERTION-ORDER- and PARTITIONING-INVARIANT by
  * construction (the retained set is "hashes < θ", a pure function of
  * the key set), so output is deterministic without an ordering
  * discipline; below 2^lgK distinct keys the sketch is in exact mode
  * and the estimates ARE the true counts. No oracle (sketch
  * implementations are not cross-engine); SketchSpec bounds the
  * estimates against the EXACT bitmap retention face. */
object ThetaOps {

  /** The store-default nominal-entries exponent (4096 retained hashes
    * — exact below that many distinct keys); referenced by
    * qAggThetaRetention so the query and this kernel cannot drift. */
  val DefaultLgK = 12

  /** Mutable agg state: an UpdateSketch while raw keys stream in, a
    * Union once partials combine — TypedImperativeAggregate never
    * interleaves update() after merge() on the same buffer, and
    * either face compacts to the same canonical sketch. */
  final class ThetaBuf(val lgK: Int) {
    var upd: UpdateSketch = _
    var uni: Union = _
    def result(): org.apache.datasketches.theta.CompactSketch =
      if (uni != null) uni.getResult
      else if (upd != null) upd.compact()
      else UpdateSketch.builder().setLogNominalEntries(lgK).build().compact()
    def absorb(sk: org.apache.datasketches.theta.Sketch): Unit = {
      if (uni == null) {
        uni = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
        if (upd != null) { uni.union(upd.compact()); upd = null }
      }
      uni.union(sk)
    }
  }

  def estimate(bytes: Array[Byte]): Long =
    math.round(Sketches.heapifySketch(Memory.wrap(bytes)).getEstimate)

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Long = {
    val in = SetOperation.builder().buildIntersection()
    in.intersect(Sketches.heapifySketch(Memory.wrap(a)))
    in.intersect(Sketches.heapifySketch(Memory.wrap(b)))
    math.round(in.getResult.getEstimate)
  }

  val registrations: Seq[Kernels.Registration] = Seq(
    (FunctionIdentifier("graft_theta_agg"),
      new ExpressionInfo(classOf[ThetaAgg].getName, "graft_theta_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_theta_agg(key, lgK): expects exactly 2 arguments")
        require(children(1).foldable, "graft_theta_agg: lgK must be a literal")
        val lgK = children(1).eval().asInstanceOf[Number].longValue()
        require(lgK >= 4L && lgK <= 26L,
          s"graft_theta_agg: lgK $lgK outside [4, 26]")
        ThetaAgg(Cast(children.head, LongType), lgK.toInt)
      }),
    (FunctionIdentifier("graft_theta_estimate"),
      new ExpressionInfo(classOf[ThetaEstimate].getName, "graft_theta_estimate"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_theta_estimate(sk): expects exactly 1 argument")
        ThetaEstimate(children.head)
      }),
    (FunctionIdentifier("graft_theta_intersect_estimate"),
      new ExpressionInfo(classOf[ThetaIntersectEstimate].getName,
        "graft_theta_intersect_estimate"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_theta_intersect_estimate(a, b): expects exactly 2 arguments")
        ThetaIntersectEstimate(children(0), children(1))
      }))

  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}

/** expr("graft_theta_agg(key, lgK)") -> binary compact theta sketch.
  * Null keys are ignored. */
case class ThetaAgg(child: Expression, lgK: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaOps.ThetaBuf] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_agg"

  override def createAggregationBuffer(): ThetaOps.ThetaBuf =
    new ThetaOps.ThetaBuf(lgK)

  override def update(buf: ThetaOps.ThetaBuf,
                      input: InternalRow): ThetaOps.ThetaBuf = {
    val v = child.eval(input)
    if (v == null) return buf
    if (buf.upd == null && buf.uni == null)
      buf.upd = UpdateSketch.builder().setLogNominalEntries(lgK).build()
    require(buf.upd != null,
      "graft_theta_agg: update after merge on one buffer")
    buf.upd.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: ThetaOps.ThetaBuf,
                     b: ThetaOps.ThetaBuf): ThetaOps.ThetaBuf = {
    a.absorb(b.result())
    a
  }

  override def eval(buf: ThetaOps.ThetaBuf): Any = buf.result().toByteArray

  override def serialize(buf: ThetaOps.ThetaBuf): Array[Byte] =
    buf.result().toByteArray
  override def deserialize(bytes: Array[Byte]): ThetaOps.ThetaBuf = {
    val buf = new ThetaOps.ThetaBuf(lgK)
    buf.absorb(Sketches.heapifySketch(Memory.wrap(bytes)))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaAgg =
    copy(child = c.head)
}

/** expr("graft_theta_estimate(sk)") -> bigint rounded estimate (exact
  * below 2^lgK distinct keys). CodegenFallback: runs over post-agg
  * sketch tables only. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_theta_estimate"

  override protected def nullSafeEval(sk: Any): Any =
    ThetaOps.estimate(sk.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** expr("graft_theta_intersect_estimate(a, b)") -> bigint rounded
  * |A ∩ B| estimate — the operator HLL cannot provide. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_theta_intersect_estimate"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.intersectEstimate(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression): ThetaIntersectEstimate =
    copy(left = a, right = b)
}
