package org.apache.spark.sql

/** Test-only accessor for SparkSessionExtensions' private[sql] build
  * methods: the spark.sql.extensions conf is STATIC (read from the
  * SparkContext at creation), so the config-time path cannot be
  * exercised on the suite's shared context — this probes that the
  * injector class wires the exact rule + strategy objects the
  * in-process register() path uses. */
object GraftExtensionsProbe {
  def injects(f: SparkSessionExtensions => Unit): (Boolean, Boolean) = {
    val e = new SparkSessionExtensions
    f(e)
    (e.buildOptimizerRules(null).contains(graft.plans.TopKRewrite),
     e.buildPlannerStrategies(null).contains(graft.plans.TopKStrategy))
  }

  /** Names the injector would register into a session's function
    * registry (via the same registerFunctions call the session builder
    * makes at instantiation). */
  def injectedFunctionNames(f: SparkSessionExtensions => Unit): Set[String] = {
    val e = new SparkSessionExtensions
    f(e)
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    e.registerFunctions(reg)
    reg.listFunction().map(_.funcName).toSet
  }
}
