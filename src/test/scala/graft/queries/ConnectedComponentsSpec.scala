package graft.queries

import graft.SparkSpec

/** The fixpoint CC engine must label every node with its component's
  * min id for ANY diameter (the fixed-round query face only reaches 4),
  * and must converge in O(log diameter) rounds — the 64-chain case
  * would need 63 hash-min rounds, beyond the maxRounds backstop, so it
  * passes only if pointer jumping actually halves label-tree depth. */
class ConnectedComponentsSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ConnectedComponents.labels(edges.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  /** Driver-side union-find ground truth. */
  private def truth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  test("a 64-node chain collapses to ONE component (log-round convergence)") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    val got = run(edges)
    assert(got.size === 64)
    assert(got.values.toSet === Set(0L), s"labels not all 0: ${got.values.toSet}")
  }

  test("disjoint components keep distinct min-id labels") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L))
    val got = run(edges)
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
                       20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("random graphs match driver-side union-find") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges) === truth(edges), s"trial $trial")
    }
  }
}
