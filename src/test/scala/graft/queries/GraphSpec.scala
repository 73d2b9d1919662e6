package graft.queries

import graft.SparkSpec

/** PageRank invariants the hash oracle can't state: the damping floor,
  * approximate mass conservation under floor division, and run-to-run
  * determinism. */
class GraphSpec extends SparkSpec {

  test("triangles: degree-oriented count equals brute force, each once") {
    val got = Graph.qGraphTriangles(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force on the driver over the same delta graph
    val ids = graft.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val deltas = Seq(1, 2, 3, 5, 8)
    val edges = for {
      a <- ids.toSeq; d <- deltas if ids(a + d)
    } yield (a, a + d)
    val eset = edges.toSet
    val want = (for {
      (a, b) <- edges; d2 <- deltas
      if ids(b + d2) && eset((b, b + d2)) && eset((a, b + d2))
    } yield (b - a, d2.toLong))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == want,
      s"triangle shape counts differ:\n got $got\nwant $want")
    // sanity: the seven closing shapes of D={1,2,3,5,8} and nothing else
    assert(got.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L),
      (3L, 2L), (3L, 5L), (5L, 3L)))
  }

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
