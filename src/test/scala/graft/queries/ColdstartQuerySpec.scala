package graft.queries

import graft.SparkSpec

/** Substitute correctness for q_bdf_coldstart (Oracle=NO — SQL cannot
  * express the Gibbs chain): determinism across runs, the exact cold
  * id x coord grid, and finite predictions. Cold-start QUALITY (side
  * info actually predicting unseen entities) is proven in GibbsSpec
  * on a fixture with real signal. */
class ColdstartQuerySpec extends SparkSpec {

  test("q_bdf_coldstart is deterministic and covers the cold grid exactly") {
    val dir = sf("sf0.01")
    val a = Bdf.qBdfColdstart(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = Bdf.qBdfColdstart(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq === b.toSeq, "cold-start prediction is not deterministic")
    assert(a.length === 20 * 16)
    assert(a.map(_._1).distinct.sorted === (80L until 100L).toArray,
      "cold ids are not exactly the held-out 80-99")
    assert(a.map(_._2).distinct.sorted === (0L until 16L).toArray)
    assert(a.forall(t => java.lang.Double.isFinite(t._3)),
      "non-finite cold-start prediction")
  }
}
