package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the positional weighted rolling hash
  * (the q_text_fingerprint kernel): fp = sum_i ascii(c_i) * (1 + (i*i)
  * mod 97), 1-based i — identical semantics to the SQL formulation that
  * explodes one row per character, but computed in ONE whole-stage-
  * codegen pass per document: no Generator, no 300x row blow-up, no
  * shuffle. This is the (b)-tier of SURVEY.md §2's custom-operator
  * preference order — a scalar kernel the built-in expression library
  * cannot express without a Generator. */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("fpStr")
      val i = ctx.freshName("fpI")
      val acc = ctx.freshName("fpAcc")
      s"""
         |String $s = $c.toString();
         |long $acc = 0L;
         |for (int $i = 1; $i <= $s.length(); $i++) {
         |  $acc += ((long) $s.charAt($i - 1)) * (1L + (((long) $i * $i) % 97L));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {

  def compute(u: UTF8String): Long = {
    val s = u.toString
    var acc = 0L
    var i = 1
    while (i <= s.length) {
      acc += s.charAt(i - 1).toLong * (1L + ((i.toLong * i) % 97L))
      i += 1
    }
    acc
  }

  val registrations: Seq[Kernels.Registration] = Seq(
    (FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "graft_fingerprint"),
      (children: Seq[Expression]) =>
        RollingFingerprint(Cast(children.head, StringType))))

  /** Register `graft_fingerprint(str)` in the session's function
    * registry (idempotent) so it is usable from expr()/SQL — the same
    * mechanism SparkSessionExtensions.injectFunction uses. */
  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}
