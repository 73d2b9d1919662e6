package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSession

/** The aggregate SQL surface of every graft codegen kernel — ONE list
  * of (identifier, info, builder) triples consumed by BOTH
  * registration paths:
  *
  *  - imperatively, per session: `Kernels.register(spark)` (or each
  *    object's own `register`, which the queries call idempotently);
  *  - config-time, for every session of an application:
  *    `spark.sql.extensions=graft.plans.GraftExtensions` injects each
  *    triple via `SparkSessionExtensions.injectFunction`, so a user
  *    who wires ONLY that one config line gets the complete engine —
  *    planner rules AND scalar/aggregate kernels — with no code.
  *
  * The triple type matches SparkSessionExtensions.FunctionDescription
  * exactly, so the list needs no adaptation at the injection site. */
object Kernels {
  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  def all: Seq[Registration] =
    VectorOps.registrations ++ ShingleOps.registrations ++
      TextRep.registrations ++ VecSum6.registrations ++
      RollingFingerprint.registrations ++ MisraGries.registrations ++
      HilbertOps.registrations ++ BloomOps.registrations ++
      BitmapOps.registrations ++ KllOps.registrations ++
      ThetaOps.registrations ++ CmsOps.registrations

  def registerAll(spark: SparkSession, rs: Seq[Registration]): Unit =
    rs.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** Register every graft kernel in the session registry (idempotent). */
  def register(spark: SparkSession): Unit = registerAll(spark, all)
}
