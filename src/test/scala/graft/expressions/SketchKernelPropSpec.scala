package graft.expressions

import org.apache.datasketches.kll.{KllLongsSketch, KllSketch}
import org.apache.datasketches.theta.{SetOperation, UpdateSketch}
import org.apache.spark.util.sketch.CountMinSketch
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the library-level merge semantics the round-13
  * sketch aggregates (CmsMergeAgg, ThetaAgg, KllAgg/KllMergeAgg)
  * delegate to — random values under RANDOM partitionings, so the
  * "merge of partials == one pass" claims rest on more than the one
  * fixed split the SQL-level specs exercise. Pure JVM (no Spark
  * session): these are exactly the kernels the TypedImperativeAggregate
  * buffers call. */
class SketchKernelPropSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val valuesGen: Gen[List[Long]] =
    Gen.listOfN(300, Gen.choose(0L, 999L)).flatMap(l =>
      Gen.choose(1, 300).map(l.take))

  /** Split `vs` into 1..8 contiguous chunks at random cut points. */
  private val splitsGen: Gen[List[Int]] =
    Gen.listOfN(7, Gen.choose(0, 299)).map(_.sorted)

  private def chunks(vs: List[Long], cuts: List[Int]): List[List[Long]] = {
    val bounded = cuts.map(c => math.min(c, vs.length)).distinct.sorted
    val points = 0 :: bounded ::: List(vs.length)
    points.zip(points.tail).map { case (a, b) => vs.slice(a, b) }
      .filter(_.nonEmpty) match {
      case Nil => List(vs) // all-empty guard for vs == Nil
      case cs  => cs
    }
  }

  test("CMS: any split-merge is byte-identical to one pass and never undercounts") {
    checkProp(forAll(valuesGen, splitsGen) { (vs, cuts) =>
      def build(part: Seq[Long]): CountMinSketch = {
        val sk = CountMinSketch.create(0.01, 0.9, 7)
        part.foreach(sk.addLong)
        sk
      }
      val global = build(vs)
      val merged = chunks(vs, cuts).map(build)
        .reduce { (a, b) => a.mergeInPlace(b); a }
      val exact = vs.groupBy(identity).view.mapValues(_.size.toLong)
      java.util.Arrays.equals(merged.toByteArray, global.toByteArray) &&
        exact.forall { case (v, n) =>
          merged.estimateCount(java.lang.Long.valueOf(v)) >= n
        }
    })
  }

  test("theta: union of any partials is EXACT below the nominal entry count") {
    checkProp(forAll(valuesGen, splitsGen) { (vs, cuts) =>
      def build(part: Seq[Long]): UpdateSketch = {
        val sk = UpdateSketch.builder().setLogNominalEntries(12).build()
        part.foreach(sk.update)
        sk
      }
      val u = SetOperation.builder().setLogNominalEntries(12).buildUnion()
      chunks(vs, cuts).foreach(p => u.union(build(p).compact()))
      val nd = vs.distinct.size.toLong
      // < 4096 distinct keys -> the sketch never samples -> exact
      math.round(u.getResult.getEstimate) == nd && {
        // intersection with itself is the identity in exact mode
        val in = SetOperation.builder().buildIntersection()
        in.intersect(u.getResult); in.intersect(u.getResult)
        math.round(in.getResult.getEstimate) == nd
      }
    })
  }

  test("KLL: merged-sketch quantiles respect the normalized-rank bound under any split") {
    val eps = KllSketch.getNormalizedRankError(200, false)
    checkProp(forAll(valuesGen, splitsGen) { (vs, cuts) =>
      vs.isEmpty || {
        def build(part: Seq[Long]): KllLongsSketch = {
          val sk = KllLongsSketch.newHeapInstance(200)
          part.foreach(sk.update)
          sk
        }
        val merged = chunks(vs, cuts).map(build)
          .reduce { (a, b) => a.merge(b); a }
        val sorted = vs.sorted
        val n = sorted.length
        List(0.1, 0.5, 0.9).forall { r =>
          val q = merged.getQuantile(r,
            org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
          // the returned value OWNS a rank interval [count(<q), count(<=q)]/n
          // — duplicates widen it by their multiplicity, and the KLL
          // guarantee is that r sits within eps of that INTERVAL, not of
          // its upper end (the round-18 flake: 159 x2 in an 11-element
          // draw jumps the upper rank by 2/11, past any eps bound —
          // the sketch's answer was exact, the old property was not)
          val lo = sorted.count(_ < q).toDouble / n
          val hi = sorted.count(_ <= q).toDouble / n
          val d = if (r < lo) lo - r else if (r > hi) r - hi else 0.0
          // 2x the single-sketch bound: a merge stacks compaction levels
          d <= 2 * eps + 1.0 / n
        }
      }
    }, n = 40)
  }
}
