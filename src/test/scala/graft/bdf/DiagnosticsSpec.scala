package graft.bdf

import graft.SparkSpec

/** R-hat convergence diagnostic: exactness on synthetic chains, and the
  * end-to-end multi-chain Gibbs run — converged chains must score near
  * 1, separated chains far above it. */
class DiagnosticsSpec extends SparkSpec {

  test("rHat is ~1 for same-distribution chains, >>1 for separated ones") {
    def lcg01(seed: Long, i: Int): Double =
      (((seed + i) * 2654435761L) % 4294967296L).toDouble / 4294967296.0
    val mixed = Seq(
      (0 until 50).map(lcg01(1L, _)),
      (0 until 50).map(lcg01(2L, _)),
      (0 until 50).map(lcg01(3L, _)))
    assert(Diagnostics.rHat(mixed) < 1.1,
      s"well-mixed chains: ${Diagnostics.rHat(mixed)}")
    val separated = Seq(
      (0 until 50).map(lcg01(1L, _)),
      (0 until 50).map(i => 10.0 + lcg01(2L, i)),
      (0 until 50).map(lcg01(3L, _)))
    assert(Diagnostics.rHat(separated) > 3.0,
      s"separated chains: ${Diagnostics.rHat(separated)}")
    // degenerate identical-constant chains define rHat = 1; UNEQUAL
    // constant chains are maximally diverged, never "converged"
    assert(Diagnostics.rHat(Seq(Seq(2.0, 2.0), Seq(2.0, 2.0))) == 1.0)
    assert(Diagnostics.rHat(Seq(Seq(2.0, 2.0), Seq(3.0, 3.0)))
      == Double.PositiveInfinity)
  }

  test("three independent Gibbs chains on the rank-2 fixture mix (R-hat small)") {
    val s = spark
    import s.implicits._
    def u(seed: Long, t: Long, i: Int, j: Int) = CbRng.gaussian(seed, t, i.toLong, j.toLong)
    val cells = for (i <- 0 until 30; j <- 0 until 20) yield {
      val x = u(7L, 1L, i, 0) * u(7L, 2L, j, 0) + u(7L, 1L, i, 1) * u(7L, 2L, j, 1) +
        0.05 * u(7L, 3L, i, j)
      (i.toLong, j.toLong, x)
    }
    val df = cells.toDF("row", "col", "v")
    val mc = Diagnostics.multiChain(spark, df, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 4, burnin = 5, samples = 6, alpha = 20.0, seed = 11L),
      m = 3)
    assert(mc.results.forall(_.sampleRmseHistory.length == 6),
      "each chain must expose one RMSE per kept sample")
    // different seeds -> genuinely different chains
    assert(mc.results.map(_.sampleRmseHistory).distinct.length == 3)
    assert(mc.rHat < 1.7, s"chains should mix on a converged fixture: ${mc.rHat}")
    // this estimator's floor is sqrt((n-1)/n) (reached when B << W),
    // NOT 1.0 — asserting >= 1 would encode a false invariant
    val n = mc.results.head.sampleRmseHistory.length
    assert(mc.rHat >= math.sqrt((n - 1).toDouble / n) - 1e-9,
      s"below the estimator's analytic floor: ${mc.rHat}")
  }
}
