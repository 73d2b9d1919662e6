package graft.sql

import graft.bdf.{CbRng, RngStream}
import org.scalacheck.{Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.3) for the determinism kit and the
  * counter-based RNG the Gibbs engine relies on. Uses scalacheck
  * directly (scalatestplus bridge is not in the offline cache). */
class DetSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("lcg bucket is stable and in range") {
    checkProp(forAll { (key: Long) =>
      val b = ((key * 2654435761L) % 4294967296L) % 10L
      b > -10 && b < 10 // Java % keeps sign; both engines agree on this
    })
  }

  test("split is a disjoint partition with ~80/20 fractions") {
    val keys = (0L until 10000L)
    val train = keys.filter(k => ((k * 2654435761L) % 4294967296L) % 10 < 8)
    val test = keys.filter(k => ((k * 2654435761L) % 4294967296L) % 10 >= 8)
    assert(train.size + test.size == keys.size)
    assert(train.toSet.intersect(test.toSet).isEmpty)
    val frac = train.size.toDouble / keys.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("CbRng is a pure function of its counters") {
    checkProp(forAll { (seed: Long, a: Long, b: Long) =>
      CbRng.gaussian(seed, a, b) == CbRng.gaussian(seed, a, b) &&
        CbRng.uniform(seed, a, b) > 0.0 && CbRng.uniform(seed, a, b) < 1.0
    })
  }

  test("CbRng gaussians have roughly standard moments") {
    val xs = (0 until 20000).map(i => CbRng.gaussian(42L, i.toLong))
    val mean = xs.sum / xs.size
    val varr = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
    assert(math.abs(mean) < 0.03, s"mean $mean")
    assert(math.abs(varr - 1.0) < 0.05, s"var $varr")
  }

  test("RngStream gamma draws are positive with the right mean") {
    val rng = new RngStream(7L, 1L)
    val xs = (0 until 5000).map(_ => rng.nextGamma(3.0))
    assert(xs.forall(_ > 0))
    val mean = xs.sum / xs.size
    assert(math.abs(mean - 3.0) < 0.15, s"gamma mean $mean")
  }

  test("clamp is idempotent and bounded") {
    checkProp(forAll { (x: Double) =>
      val c = math.min(math.max(x, 10.0), 20.0)
      val c2 = math.min(math.max(c, 10.0), 20.0)
      (c >= 10.0 && c <= 20.0 && c == c2) || x.isNaN
    })
  }
}
