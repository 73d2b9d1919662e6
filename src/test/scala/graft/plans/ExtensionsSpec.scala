package graft.plans

import org.apache.spark.sql.GraftExtensionsProbe
import org.scalatest.funsuite.AnyFunSuite

/** The advertised config-time injection path
  * (spark.sql.extensions=graft.plans.GraftExtensions) must wire the
  * SAME rule + strategy objects the in-process TopKPerKey.register path
  * uses. spark.sql.extensions is a static conf applied at SparkContext
  * creation, so the full path needs spark-submit --conf; this pins the
  * injector's wiring, which is the part that can rot. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects the TopK rule and strategy") {
    val (rule, strategy) = GraftExtensionsProbe.injects(new GraftExtensions)
    assert(rule, "optimizer rule not injected")
    assert(strategy, "planner strategy not injected")
  }

  test("GraftExtensions injects every graft kernel as a SQL function") {
    val names = GraftExtensionsProbe.injectedFunctionNames(new GraftExtensions)
    val want = graft.expressions.Kernels.all.map(_._1.funcName).toSet
    assert(want.nonEmpty && want.forall(_.startsWith("graft_")))
    assert(names == want,
      s"injected $names, kernel registry declares $want")
  }
}
