package graft.queries

import graft.SparkSpec

/** PageRank invariants the hash oracle can't state: the damping floor,
  * approximate mass conservation under floor division, and run-to-run
  * determinism. */
class GraphSpec extends SparkSpec {

  test("pagerank: damping floor, bounded mass loss, deterministic") {
    val rows = Graph.qGraphPagerank(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    // every node keeps at least the teleport mass (1-d) * 1e6
    rows.foreach { case (node, rank) =>
      assert(rank >= 150000L, s"node $node below damping floor: $rank")
    }
    // floor division only ever DROPS mass: total stays within
    // [0.9, 1.0] x n x 1e6 (each node loses < deg quanta per round)
    val n = rows.length.toLong
    val total = rows.map(_._2).sum
    assert(total <= n * 1000000L, s"mass created: $total > ${n * 1000000L}")
    assert(total >= (n * 1000000L * 9) / 10, s"mass lost > 10%: $total")
    val again = Graph.qGraphPagerank(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == again.toSeq, "pagerank not deterministic")
  }
}
