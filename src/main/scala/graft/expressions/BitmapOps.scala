package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Fixed-domain bitmap distinct sketch — the EXACT, SET-OPERABLE
  * member of the sketch-store family (HLL = approximate distinct,
  * equi-width histogram = quantiles, Misra-Gries = frequencies,
  * bitmap = exact distinct + intersections): one bit per key of a
  * dense integer domain, so a group's state is domain/8 bytes no
  * matter how many rows stream past.
  *
  * What the bitmap buys over HLL: intersections. HLL unions are
  * lossless but HLL gives no intersection operator — "distinct
  * customers active in month m AND m+1" (retention) needs
  * inclusion-exclusion with compounding error. Bitmaps AND exactly —
  * the Druid/ClickHouse `groupBitmap` pattern — so cohort/retention
  * queries stay oracle-exact. The cost is the dense-domain
  * precondition: keys must be dictionary-encoded ints (at 100 TB
  * that encode pass is standard practice; here custkeys are already
  * dense). An out-of-domain key THROWS — a silently dropped bit
  * would be an invisible wrong answer.
  *
  * Merging is bitwise OR (commutative, associative, idempotent), so
  * partial aggregation combines map-side and the shuffle carries one
  * domain/8-byte bitmap per partition per group — never one row per
  * distinct key. At 100M customers a month's bitmap is 12.5 MB;
  * 80 months of sketches serve any retention/cohort matrix without
  * rescanning the fact table. */
object BitmapOps {

  /** popcount of a packed bitmap. */
  def card(b: Array[Byte]): Long = {
    var i = 0
    var n = 0L
    while (i < b.length) { n += java.lang.Integer.bitCount(b(i) & 0xff); i += 1 }
    n
  }

  /** popcount of the intersection of two same-domain bitmaps. */
  def andCard(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length,
      s"graft_bitmap_and_card: domain mismatch (${a.length} vs ${b.length} bytes)")
    var i = 0
    var n = 0L
    while (i < a.length) { n += java.lang.Integer.bitCount(a(i) & b(i) & 0xff); i += 1 }
    n
  }

  val registrations: Seq[Kernels.Registration] = Seq(
    (FunctionIdentifier("graft_bitmap_agg"),
      new ExpressionInfo(classOf[BitmapAgg].getName, "graft_bitmap_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_bitmap_agg(key, domain): expects exactly 2 arguments")
        require(children(1).foldable, "graft_bitmap_agg: domain must be a literal")
        // evaluate as Long first: Number.intValue() would silently wrap
        // a >2^31 domain to a smaller positive one, and valid keys would
        // then fail with a misleading "outside domain" error
        val domainL = children(1).eval().asInstanceOf[Number].longValue()
        require(domainL >= 1L && domainL <= Int.MaxValue.toLong,
          s"graft_bitmap_agg: domain $domainL outside [1, ${Int.MaxValue}] " +
            "— dictionary-encode keys to a dense int range first")
        BitmapAgg(Cast(children.head, LongType), domainL.toInt)
      }),
    (FunctionIdentifier("graft_bitmap_card"),
      new ExpressionInfo(classOf[BitmapCard].getName, "graft_bitmap_card"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_bitmap_card(bmp): expects exactly 1 argument")
        BitmapCard(children.head)
      }),
    (FunctionIdentifier("graft_bitmap_and_card"),
      new ExpressionInfo(classOf[BitmapAndCard].getName, "graft_bitmap_and_card"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_bitmap_and_card(a, b): expects exactly 2 arguments")
        BitmapAndCard(children(0), children(1))
      }))

  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}

/** expr("graft_bitmap_agg(key, domain)") -> binary of ceil(domain/8)
  * bytes; bit i set iff key i appeared. Keys outside [0, domain)
  * throw. Null keys are ignored. */
case class BitmapAgg(child: Expression, domain: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(domain > 0, "graft_bitmap_agg: domain must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bitmap_agg"

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte]((domain + 7) >>> 3)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[Long]
    if (key < 0L || key >= domain.toLong)
      throw new IllegalArgumentException(
        s"graft_bitmap_agg: key $key outside domain [0, $domain) — " +
          "dictionary-encode keys to a dense range first")
    buf((key >>> 3).toInt) = (buf((key >>> 3).toInt) | (1 << (key & 7L).toInt)).toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BitmapAgg =
    copy(child = c.head)
}

/** expr("graft_bitmap_card(bmp)") -> bigint popcount. */
case class BitmapCard(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_card"

  override protected def nullSafeEval(b: Any): Any =
    BitmapOps.card(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.BitmapOps.card($b)")

  override protected def withNewChildInternal(c: Expression): BitmapCard =
    copy(child = c)
}

/** expr("graft_bitmap_and_card(a, b)") -> bigint popcount of a AND b. */
case class BitmapAndCard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_and_card"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.andCard(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.BitmapOps.andCard($a, $b)")

  override protected def withNewChildrenInternal(a: Expression, b: Expression): BitmapAndCard =
    copy(left = a, right = b)
}
