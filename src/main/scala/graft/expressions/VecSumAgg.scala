package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Custom AGGREGATE function (the `TypedImperativeAggregate` extension
  * tier): exact-decimal ELEMENTWISE sum of array<double> columns —
  * each element is quantized like CAST(x AS DECIMAL(18,6))
  * ([[VectorOps.quantLong]]) and accumulated as scale-6 long micros
  * with overflow guards, so the result is EXACT and therefore
  * independent of row order and partial/merge combining order — the
  * property Spark's double `sum` lacks and the reason the oracle can
  * state it as per-dimension SUM(DECIMAL). One pass replaces the
  * posexplode + (group-per-dimension) hash aggregate: the q_sim_knn_*
  * centroid kernel, the NW "sum u" shape, any embedding-mean job.
  *
  * Buffer = Array[Long] (micros per dimension), lazily sized from the
  * first row; Math.addExact throws loudly on overflow (> 9.2e12 in any
  * dimension's sum) rather than degrading silently. */
case class VecSum6(child: Expression,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // input type is fixed by the registration, which casts the child to
  // array<double> (float embeddings widen exactly first)
  override def prettyName: String = "graft_vecsum6"

  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = if (buf.length == n) buf else {
      require(buf.isEmpty, s"graft_vecsum6: ragged input (${buf.length} vs $n)")
      new Array[Long](n)
    }
    var i = 0
    while (i < n) {
      acc(i) = Math.addExact(acc(i), VectorOps.quantLong(arr.getDouble(i), 1e6, 6))
      i += 1
    }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length, "graft_vecsum6: ragged partials")
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(
      buf.map(m => java.math.BigDecimal.valueOf(m, 6).doubleValue()))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum6 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum6 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecSum6 =
    copy(child = c.head)
}

object VecSum6 {
  val registrations: Seq[Kernels.Registration] = Seq(
    (FunctionIdentifier("graft_vecsum6"),
      new ExpressionInfo(classOf[VecSum6].getName, "graft_vecsum6"),
      (children: Seq[Expression]) =>
        VecSum6(Cast(children.head, ArrayType(DoubleType)))))

  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}
