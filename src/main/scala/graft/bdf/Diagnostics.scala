package graft.bdf

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-chain convergence diagnostics for the Gibbs engine: the
  * Gelman-Rubin potential scale reduction factor (R-hat) over
  * independent chains' per-sample test-RMSE traces. BPMF/Macau users
  * judge "has it burned in" by eye on the RMSE trace; R-hat is the
  * standard quantitative version — near 1 when independent chains mix
  * over the same stationary distribution, well above 1 when they are
  * still transient or stuck in different regions. Chains are fully
  * independent Gibbs runs (different seeds), so on a cluster they
  * parallelize trivially; the diagnostic itself is O(m·n) driver
  * arithmetic on the scalar traces. */
object Diagnostics {

  /** Gelman-Rubin R-hat over m ≥ 2 scalar chains of equal length n ≥ 2:
    * sqrt(((n-1)/n · W + B/n) / W) with W the mean within-chain
    * variance and B the between-chain variance of the chain means. */
  def rHat(chains: Seq[Seq[Double]]): Double = {
    require(chains.length >= 2, "R-hat needs at least 2 chains")
    val n = chains.head.length
    require(n >= 2 && chains.forall(_.length == n),
      "chains must share a length >= 2")
    val m = chains.length
    val means = chains.map(c => c.sum / n)
    val grand = means.sum / m
    val b = n.toDouble / (m - 1) * means.map(x => (x - grand) * (x - grand)).sum
    val w = chains.zip(means).map { case (c, mu) =>
      c.map(x => (x - mu) * (x - mu)).sum / (n - 1)
    }.sum / m
    if (w == 0.0) {
      // degenerate: every chain is internally constant. Equal chains
      // are perfectly converged; UNEQUAL constant chains are maximally
      // diverged (stuck in different regions) — never report 1.0 there.
      if (b == 0.0) 1.0 else Double.PositiveInfinity
    } else math.sqrt(((n - 1).toDouble / n * w + b / n) / w)
  }

  final case class MultiChain(results: Seq[Gibbs.Result], rHat: Double)

  /** Run `m` independent chains of Macau.fit (seeds seed, seed+1, …)
    * and compute R-hat over their per-sample RMSE traces. */
  def multiChain(spark: SparkSession, df: DataFrame, modeCols: Seq[String],
                 valueCol: String, opts: Gibbs.Options,
                 m: Int = 3): MultiChain = {
    val results = (0 until m).map(c =>
      Macau.fit(spark, df, modeCols, valueCol,
                opts.copy(seed = opts.seed + c)))
    MultiChain(results, rHat(results.map(_.sampleRmseHistory)))
  }
}
