package graft.expressions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

/** The exactness claim behind every graft_* decimal kernel: the
  * double/long fast path in [[VectorOps.quantLong]] must agree with the
  * BigDecimal reference (Spark's CAST(double AS DECIMAL(18,s)) route)
  * on EVERY input — the guard band sends ambiguous roundings to the
  * slow path, so disagreement anywhere is a correctness bug, not a
  * tolerance issue. Pure-JVM test (no Spark session). */
class QuantSpec extends AnyFunSuite {

  private def ref(d: Double, scale: Int): Long =
    JBigDecimal.valueOf(d).setScale(scale, RoundingMode.HALF_UP)
      .movePointRight(scale).longValueExact()

  test("quantLong(scale 6) equals the BigDecimal reference on a dense sweep") {
    var i = -200000
    while (i <= 200000) {
      // magnitudes from 1e-7 to ~20, signs, ragged decimals
      val d = i * 1.0000137e-4
      assert(VectorOps.quantLong(d, 1e6, 6) === ref(d, 6), s"d=$d")
      i += 1
    }
  }

  test("quantLong agrees on manufactured near-.5-tie values") {
    // (2k+1)/2e6 are the exact decimal x.5 boundaries at scale 6; the
    // nearest doubles land just above/below and must round like the
    // reference either way
    var k = 0
    while (k < 50000) {
      val tie = (2 * k + 1) / 2e6
      for (d <- Seq(tie, Math.nextUp(tie), Math.nextDown(tie), -tie,
                    Math.nextUp(-tie), Math.nextDown(-tie))) {
        assert(VectorOps.quantLong(d, 1e6, 6) === ref(d, 6), s"d=$d")
      }
      k += 977 // prime stride across the range
    }
  }

  test("quantLong(scale 12) equals the reference for squared-distance terms") {
    var i = 0
    while (i <= 100000) {
      val d = (i - 50000) * 3.3e-4
      val t = d * d
      assert(VectorOps.quantLong(t, 1e12, 12) === ref(t, 12), s"t=$t")
      i += 1
    }
  }
}
