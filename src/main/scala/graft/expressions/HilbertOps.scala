package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 16-bit 2-D grid cell — the
  * better-locality sibling of the Morton interleave in
  * [[graft.queries.Layout]]: consecutive Hilbert indexes are always
  * edge-adjacent grid cells (Morton jumps across the plane at power-
  * of-two boundaries), so files sorted by Hilbert rank have strictly
  * tighter per-file bounding boxes on adversarial query boxes.
  *
  * xy2d is the classic iterative rotate-and-accumulate (Hamilton's
  * formulation): 16 rounds from the top bit down; each round adds the
  * quadrant's contribution s*s*((3*rx) xor ry) and rotates/reflects
  * the frame. Pure long arithmetic — bit-identical in any engine, so
  * the contract query carries an exact DuckDB oracle (the same 16
  * rounds as chained CTEs). Codegen calls this static method
  * directly, same tier-b shape as [[VectorOps]]. */
object HilbertOps {
  /** Hilbert distance of (x, y) on the 65536 x 65536 grid. Inputs are
    * masked to 16 bits; result is in [0, 2^32). */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 32768L // 2^15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the (s x s) subsquare so the curve enters correctly
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  val registrations: Seq[Kernels.Registration] = Seq(
    (FunctionIdentifier("graft_hilbert16"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert16"),
      (children: Seq[Expression]) =>
        HilbertIndex(Cast(children(0), LongType), Cast(children(1), LongType))))

  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}

/** expr("graft_hilbert16(x, y)") — see [[HilbertOps.xy2d]]. */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert16"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertOps.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.HilbertOps.xy2d($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)
}
