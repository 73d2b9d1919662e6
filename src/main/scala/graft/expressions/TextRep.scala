package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel for the within-document repetition signals
  * (q_text_repetition): token count, distinct tokens, most-frequent-
  * bigram count, bigram count — per document, in one whole-stage-
  * codegen projection. The declarative twin explodes tokens AND bigrams
  * (two Generate pipelines + three shuffled aggregations); this kernel
  * shuffles nothing — only the 4-long struct leaves the scan, and the
  * downstream per-doc aggregate disappears entirely.
  *
  * Value contract (identical to the SQL both engines agree on):
  * tokens = split(text, ' ') with empties EXCLUDED from n_tokens /
  * n_distinct (the tok CTE's `token <> ''` filter); bigrams over the
  * RAW token array, b_i = tk[i] || ' ' || tk[i+1] for 1-based
  * i in [1, len-1]. */
object TextRep {

  val repType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))

  def rep(u: UTF8String): GenericInternalRow = {
    val tk = u.toString.split(" ", -1)
    var nTok = 0L
    val distinct = new java.util.HashSet[String](math.max(16, tk.length * 2))
    var i = 0
    while (i < tk.length) {
      if (!tk(i).isEmpty) { nTok += 1; distinct.add(tk(i)) }
      i += 1
    }
    val counts = new java.util.HashMap[String, Integer](math.max(16, tk.length * 2))
    var top = 0L
    i = 0
    while (i < tk.length - 1) {
      val b = tk(i) + " " + tk(i + 1)
      val c = counts.merge(b, 1, (x: Integer, y: Integer) => Integer.valueOf(x + y))
      if (c > top) top = c.toLong
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nTok, distinct.size.toLong, top, math.max(tk.length - 1, 0).toLong))
  }

  val registrations: Seq[Kernels.Registration] = Seq(
    (FunctionIdentifier("graft_text_rep"),
      new ExpressionInfo(classOf[TextRepSig].getName, "graft_text_rep"),
      (children: Seq[Expression]) => TextRepSig(Cast(children.head, StringType))))

  def register(spark: SparkSession): Unit =
    Kernels.registerAll(spark, registrations)
}

/** expr("graft_text_rep(text)") -> struct(n_tokens, n_distinct,
  * top_bigram_n, n_bigrams). */
case class TextRepSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextRep.repType
  override def prettyName: String = "graft_text_rep"

  override protected def nullSafeEval(input: Any): Any =
    TextRep.rep(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextRep.rep($c);")

  override protected def withNewChildInternal(newChild: Expression): TextRepSig =
    copy(child = newChild)
}
