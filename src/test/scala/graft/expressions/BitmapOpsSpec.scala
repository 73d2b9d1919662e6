package graft.expressions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the bitmap kernel's pure arithmetic — the
  * JVM-side contracts the SQL faces (SketchSpec, the retention
  * oracle) build on: popcount/AND-popcount against java.util.BitSet
  * as an independent reference, and OR-merge set semantics. */
class BitmapOpsSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val domain = 200
  private val keysGen: Gen[List[Int]] =
    Gen.listOf(Gen.choose(0, domain - 1))

  private def pack(keys: Seq[Int]): Array[Byte] = {
    val b = new Array[Byte]((domain + 7) >>> 3)
    keys.foreach(k => b(k >>> 3) = (b(k >>> 3) | (1 << (k & 7))).toByte)
    b
  }

  test("card equals the distinct key count (BitSet reference)") {
    checkProp(forAll(keysGen) { keys =>
      BitmapOps.card(pack(keys)) == keys.distinct.size.toLong
    })
  }

  test("andCard equals the exact set intersection size") {
    checkProp(forAll(keysGen, keysGen) { (a, b) =>
      BitmapOps.andCard(pack(a), pack(b)) ==
        a.toSet.intersect(b.toSet).size.toLong
    })
  }

  test("OR-merge is the set union: card(a|b) = |A ∪ B|") {
    checkProp(forAll(keysGen, keysGen) { (a, b) =>
      val m = pack(a)
      val pb = pack(b)
      var i = 0
      while (i < m.length) { m(i) = (m(i) | pb(i)).toByte; i += 1 }
      BitmapOps.card(m) == a.toSet.union(b.toSet).size.toLong
    })
  }

  test("inclusion-exclusion holds exactly: |A|+|B| = |A∪B|+|A∩B|") {
    checkProp(forAll(keysGen, keysGen) { (a, b) =>
      val pa = pack(a)
      val pb = pack(b)
      val u = pa.clone()
      var i = 0
      while (i < u.length) { u(i) = (u(i) | pb(i)).toByte; i += 1 }
      BitmapOps.card(pa) + BitmapOps.card(pb) ==
        BitmapOps.card(u) + BitmapOps.andCard(pa, pb)
    })
  }

  test("andCard refuses mismatched domains") {
    val e = intercept[IllegalArgumentException] {
      BitmapOps.andCard(new Array[Byte](4), new Array[Byte](8))
    }
    assert(e.getMessage.contains("domain mismatch"))
  }
}
