package graft.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen kernels for the exact-decimal vector math used by the
  * similarity/dedup queries (SURVEY.md §2, LLM-pipeline rows). Each
  * reproduces, bit-for-bit, a decimal-quantized formulation that the
  * DuckDB oracle states in SQL — but in ONE fused whole-stage-codegen
  * pass over the array columns instead of interpreted higher-order
  * lambdas (Catalyst evaluates HOF lambda bodies interpreted, per
  * element: ~10x slower) or a posexplode 64x row blow-up + shuffle.
  *
  * Exactness contract (graft.sql.Det): each element is quantized as
  * CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)) — i.e.
  * BigDecimal.valueOf(double).setScale(6, HALF_UP), the same
  * shortest-string route Spark's Cast takes — products/sums are exact
  * decimals, and only the final value is rounded once to DOUBLE.
  *
  * The hot path never allocates: rounding runs in double/long
  * arithmetic behind a proven guard — round-to-nearest of `v` is
  * identical for every value within ±err of `v` UNLESS the window
  * touches the x.5 tie boundary, so computing on `scaled ≈ v` with
  * |scaled-v| ≤ err := |scaled|*4e-16 + 1e-9 (double-multiply relative
  * error 1.1e-16 + shortest-decimal-repr error 5e-17, with margin) and
  * falling back to BigDecimal only inside the guard band gives the
  * exact BigDecimal answer on every input. Sums/products use
  * Math.*Exact with a BigDecimal overflow fallback, so results never
  * degrade. */
object VectorOps {

  /** round_half_up(decimal(d) * 10^scale) as a long, bit-identical to
    * BigDecimal.valueOf(d).setScale(scale, HALF_UP).movePointRight.
    * pow10 must be exactly 10^scale. */
  def quantLong(d: Double, pow10: Double, scale: Int): Long = {
    val scaled = d * pow10
    val a = Math.abs(scaled)
    if (a < 1e15) {
      val fl = Math.floor(a)
      val frac = a - fl
      val err = a * 4e-16 + 1e-9
      if (Math.abs(frac - 0.5) > err) {
        val r = (if (frac > 0.5) fl + 1.0 else fl).toLong
        return if (scaled < 0) -r else r
      }
    }
    JBigDecimal.valueOf(d).setScale(scale, RoundingMode.HALF_UP)
      .movePointRight(scale).longValueExact()
  }

  /** Exact-decimal dot product: sum_i q6(a_i) * q6(b_i) as
    * DECIMAL(*,12), rounded once to double. */
  def dot6(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    try {
      var acc = 0L // units of 1e-12
      var i = 0
      while (i < n) {
        acc = Math.addExact(acc, Math.multiplyExact(
          quantLong(a.getDouble(i), 1e6, 6), quantLong(b.getDouble(i), 1e6, 6)))
        i += 1
      }
      JBigDecimal.valueOf(acc, 12).doubleValue()
    } catch {
      case _: ArithmeticException => dot6Big(a, b, n)
    }
  }

  private def dot6Big(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      val qa = JBigDecimal.valueOf(a.getDouble(i)).setScale(6, RoundingMode.HALF_UP)
      val qb = JBigDecimal.valueOf(b.getDouble(i)).setScale(6, RoundingMode.HALF_UP)
      acc = acc.add(qa.multiply(qb))
      i += 1
    }
    acc.doubleValue()
  }

  /** Quantize a whole vector once: array<double> -> array<long> of
    * scale-6 units. Pre-quantizing each vector ONCE before a pair join
    * turns the per-pair work into a pure long dot ([[dotQ12]]) — the
    * difference between O(pairs * 64) BigDecimal allocations and
    * O(vectors * 64) fast rounds. */
  def quant6Array(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = quantLong(a.getDouble(i), 1e6, 6); i += 1 }
    new GenericArrayData(out)
  }

  /** Dot product of two pre-quantized (scale-6 micros) long vectors,
    * rounded once to double from the exact scale-12 sum. */
  def dotQ12(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    try {
      var acc = 0L
      var i = 0
      while (i < n) {
        acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
        i += 1
      }
      JBigDecimal.valueOf(acc, 12).doubleValue()
    } catch {
      case _: ArithmeticException =>
        var acc = JBigDecimal.ZERO
        var i = 0
        while (i < n) {
          acc = acc.add(JBigDecimal.valueOf(a.getLong(i), 6)
            .multiply(JBigDecimal.valueOf(b.getLong(i), 6)))
          i += 1
        }
        acc.doubleValue()
    }
  }

  /** Exact-decimal squared euclidean distance: sum_i q6((a_i - b_i)^2)
    * (the q_sim_ann_ivf / q_sim_knn_centroid kernel: the DIFFERENCE is
    * double math, each squared term is quantized to DECIMAL(18,6),
    * the sum is exact).
    *
    * Scale 6, NOT 12, deliberately: at scale 12 the scaled product
    * d^2 * 1e12 sits near 4e10 where a double's ulp is ~7.6e-6, so
    * doubles landing EXACTLY on a .5 rounding tie occur about once per
    * 131k terms — and DuckDB's double->DECIMAL cast resolves such ties
    * differently from exact HALF_UP (observed at sf0.1: one term in
    * 3.2M flipped the oracle hash). At scale 6 the scaled magnitude is
    * ~1e4-1e7, ulp ~1e-9, and a tie needs a ~2^-30 coincidence —
    * rounding-rule differences become unobservable. */
  def sqDistQ(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    try {
      var acc = 0L // units of 1e-6
      var i = 0
      while (i < n) {
        val d = a.getDouble(i) - b.getDouble(i)
        acc = Math.addExact(acc, quantLong(d * d, 1e6, 6))
        i += 1
      }
      JBigDecimal.valueOf(acc, 6).doubleValue()
    } catch {
      case _: ArithmeticException => sqDistQBig(a, b, n)
    }
  }

  private def sqDistQBig(a: ArrayData, b: ArrayData, n: Int): Double = {
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc = acc.add(JBigDecimal.valueOf(d * d).setScale(6, RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }

  /** graft_dot6 / graft_sqdist12 / graft_quant6 / graft_dotq12
    * registration triples (see [[Kernels]] for the aggregate surface).
    * Double-array children are cast to array<double> so float
    * embeddings widen exactly first (Det.decf discipline). */
  val registrations: Seq[Kernels.Registration] = {
    def reg2(name: String, elem: DataType,
             make: (Expression, Expression) => Expression): Kernels.Registration =
      (FunctionIdentifier(name),
        new ExpressionInfo(classOf[DecimalDot].getName, name),
        (children: Seq[Expression]) => make(
          Cast(children(0), ArrayType(elem)),
          Cast(children(1), ArrayType(elem))))
    Seq(
      reg2("graft_dot6", DoubleType, DecimalDot(_, _)),
      reg2("graft_sqdist12", DoubleType, DecimalSqDist(_, _)),
      reg2("graft_dotq12", LongType, QuantDot(_, _)),
      (FunctionIdentifier("graft_quant6"),
        new ExpressionInfo(classOf[QuantVector].getName, "graft_quant6"),
        (children: Seq[Expression]) =>
          QuantVector(Cast(children.head, ArrayType(DoubleType)))))
  }

  /** Register the vector kernels in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}

/** expr("graft_dot6(a, b)") — see [[VectorOps.dot6]]. */
case class DecimalDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot6"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot6(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VectorOps.dot6($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecimalDot =
    copy(left = l, right = r)
}

/** expr("graft_sqdist12(a, b)") — see [[VectorOps.sqDistQ]]. The SQL
  * name keeps its historical "12" (every query and oracle formulation
  * references it); the accumulation scale is 6 — see the scaladoc. */
case class DecimalSqDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sqdist12"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sqDistQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VectorOps.sqDistQ($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecimalSqDist =
    copy(left = l, right = r)
}

/** expr("graft_quant6(a)") -> array<bigint> — see [[VectorOps.quant6Array]]. */
case class QuantVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_quant6"

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.quant6Array(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VectorOps.quant6Array($c);")

  override protected def withNewChildInternal(newChild: Expression): QuantVector =
    copy(child = newChild)
}

/** expr("graft_dotq12(qa, qb)") over pre-quantized long vectors —
  * see [[VectorOps.dotQ12]]. */
case class QuantDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dotq12"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotQ12(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VectorOps.dotQ12($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantDot =
    copy(left = l, right = r)
}
