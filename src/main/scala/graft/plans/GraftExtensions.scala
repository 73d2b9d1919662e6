package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Config-time injection point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` wires the
  * WHOLE engine into every session of an application without code
  * changes: the TopK rewrite + strategy AND every graft codegen kernel
  * ([[graft.expressions.Kernels.all]] — dot/sqdist/quant vector math,
  * minhash/shingle/cgram, text-rep, rolling fingerprint, vecsum
  * aggregate) as named SQL functions. Same effect in-process via
  * [[TopKPerKey.register]] + [[graft.expressions.Kernels.register]]
  * (the queries call the per-object registrations idempotently). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => TopKRewrite)
    e.injectPlannerStrategy(_ => TopKStrategy)
    graft.expressions.Kernels.all.foreach(e.injectFunction)
  }
}
