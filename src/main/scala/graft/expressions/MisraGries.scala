package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Misra-Gries heavy-hitter summary as a mergeable Spark aggregate —
  * the bounded-state candidate pass of the exact two-pass heavy-hitter
  * algorithm (`q_agg_heavy_hitters`).
  *
  * Why not `groupBy(key).count`: that shuffles one record per DISTINCT
  * key — at 100 TB the key domain (users, urls, ngrams) is what's
  * huge, and the full-domain shuffle is the cost. Misra-Gries keeps at
  * most k counters per partial state no matter how many distinct keys
  * stream past, so the shuffle carries O(k * partitions) bytes total
  * and the final state is a <=k-entry candidate list.
  *
  * Guarantee (the reason two-pass is EXACT): a k-counter summary's
  * count deficit is at most n/(k+1), so every key with true frequency
  * > n/(k+1) is guaranteed to survive. Merging partials by summing
  * counters and then subtracting the (k+1)-th largest count (keeping
  * positives) preserves that bound — the "mergeable summaries"
  * construction (Agarwal et al., PODS'12) — so the survivors after ANY
  * combine tree are a superset of the true heavy hitters. The caller
  * recounts the <=k candidates exactly (an IN-filter the scan pushes
  * down) and applies the true threshold: survivor-set variation across
  * partitionings cannot reach the output, which is why the query stays
  * oracle-exact even though the sketch itself is order-sensitive.
  *
  * eval() returns the candidate keys sorted ascending (determinism of
  * the ARRAY representation, not of the set — see above). Update cost
  * is O(1) amortized per hit and O(k) per evicting miss; buffer is one
  * LongMap. Null keys are ignored. */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(k > 0, "graft_misra_gries: k must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long],
                      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[Long]
    val cur = buf.getOrElse(key, 0L) // live counters are always >= 1
    if (cur > 0L) buf.update(key, cur + 1L)
    else if (buf.size < k) buf.update(key, 1L)
    else {
      // evicting miss: decrement every counter, drop zeros — the
      // classic MG step (the new key and one unit of every counter
      // cancel; deficit grows by exactly 1)
      val dead = mutable.ArrayBuffer.empty[Long]
      buf.foreachEntry { (kk, c) =>
        if (c == 1L) dead += kk else buf.update(kk, c - 1L)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.LongMap[Long],
                     b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b.foreachEntry { (kk, c) =>
      a.update(kk, a.getOrElse(kk, 0L) + c)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, keep
      // positives: at most k survivors, error grows by that count —
      // the bound-preserving mergeable-summaries offset
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val off = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[Long]
      a.foreachEntry { (kk, c) =>
        if (c - off <= 0L) dead += kk else a.update(kk, c - off)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val keys = buf.keys.toArray
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (kk, c) => bb.putLong(kk); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m.update(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGries =
    copy(child = c.head)
}

object MisraGries {
  val registrations: Seq[Kernels.Registration] = Seq(
    (FunctionIdentifier("graft_misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "graft_misra_gries"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_misra_gries(key, k): expects exactly 2 arguments")
        require(children(1).foldable,
          "graft_misra_gries: k must be a literal")
        val k = children(1).eval().asInstanceOf[Number].intValue()
        MisraGries(Cast(children.head, LongType), k)
      }))

  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}
