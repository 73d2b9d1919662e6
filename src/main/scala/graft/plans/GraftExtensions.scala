package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Config-time injection point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` wires the
  * TopK rewrite + strategy into every session without code changes
  * (the SparkSessionExtensions mechanism). Same effect in-process via
  * [[TopKPerKey.register]]. Scalar kernels (graft.expressions.*) stay
  * on the function-registry path — they are registered idempotently by
  * the queries that use them. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => TopKRewrite)
    e.injectPlannerStrategy(_ => TopKStrategy)
  }
}
