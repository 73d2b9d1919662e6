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

  /** Driver-side reference of the EXACT integer iteration (floor
    * division, decimal-exact sums fit in Long at these sizes). */
  private def prRef(edges: Seq[(Long, Long)], tolPpm: Long,
                    maxIters: Int): (Map[Long, Long], Int) = {
    val out = edges.groupBy(_._1)
    val nodes = edges.map(_._1).distinct
    var rank = nodes.map(_ -> 1000000L).toMap
    var iters = 0
    var moved = Long.MaxValue
    while (moved > tolPpm && iters < maxIters) {
      iters += 1
      val inc = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          rank(src) / out(src).size }.sum
      }
      val next = nodes.map { n =>
        n -> (150000L + (850000L * inc.getOrElse(n, 0L)) / 1000000L)
      }.toMap
      moved = if (nodes.isEmpty) 0L
              else nodes.map(n => math.abs(next(n) - rank(n))).max
      rank = next
    }
    (rank, iters)
  }

  test("label propagation equals a driver brute force and is deterministic") {
    def run() = Graph.qGraphCommunities(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = run()
    // brute force: 3 synchronous rounds, argmax by (count desc, label asc)
    val ids = graft.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val deltas = Seq(1L, 2L, 3L, 5L, 8L)
    val nbrs = ids.map { a =>
      a -> (deltas.map(a + _).filter(ids) ++ deltas.map(a - _).filter(ids))
    }.toMap
    var lab = ids.map(a => a -> a).toMap
    for (_ <- 1 to 3) {
      lab = ids.map { a =>
        val nl = nbrs(a).map(lab)
        if (nl.isEmpty) a -> lab(a)
        else a -> nl.groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val want = lab.groupBy(_._2).map { case (c, m) =>
      val ns = m.keys
      (c, ns.size.toLong, ns.min, ns.max)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === want)
    assert(run().toSeq === got.toSeq, "LPA is not deterministic")
  }

  test("converged pagerank: iteration count adapts to mixing speed; exact vs reference") {
    val s = spark
    import s.implicits._
    // fast-mixing: K6 complete graph — uniform degrees keep the rank
    // vector AT the uniform fixpoint, so the delta metric reads 0 on
    // the first iteration
    val k6 = (for { a <- 0L until 6L; b <- 0L until 6L if a != b }
      yield (a, b))
    // slow-mixing: a 40-node path (symmetrized) — endpoint mass takes
    // ~path-length iterations to equilibrate
    val path = (0L until 39L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val tol = 100L
    val (fastDf, fastIters) =
      Graph.pagerankConverged(k6.toDF("src", "dst"), "src", "dst", tol)
    val (slowDf, slowIters) =
      Graph.pagerankConverged(path.toDF("src", "dst"), "src", "dst", tol)
    info(s"iterations: K6=$fastIters path40=$slowIters")
    assert(fastIters < slowIters,
      s"iteration count did not adapt: K6 $fastIters vs path $slowIters")
    assert(slowIters < 100, "path graph hit the maxIters backstop")
    // K6 stays uniform at the fixpoint
    val fast = fastDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.forall(_._2 == 1000000L),
      s"complete graph left the uniform fixpoint: ${fast.mkString(",")}")
    // the distributed loop is the SAME integer arithmetic as the
    // driver reference: identical ranks AND identical iteration count
    val (wantRanks, wantIters) = prRef(path, tol, 100)
    val slow = slowDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(slowIters == wantIters,
      s"iteration count diverged from reference: $slowIters vs $wantIters")
    assert(slow == wantRanks, "converged ranks diverged from the reference")
  }

  test("converged pagerank agrees with the fixed-3 face when stopped at its tolerance") {
    // on the real sf0.001 graph: run the converged loop and check the
    // stopping CONTRACT — after convergence at tolPpm, one more
    // prStep application moves no rank by more than tolPpm (the spec
    // of "converged", checked via the public API only)
    val ed = graft.Tables.orders(spark, sf("sf0.001"))
      .join(graft.Tables.lineitem(spark, sf("sf0.001")),
            org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .selectExpr("o_custkey * 2 AS a", "l_suppkey * 2 + 1 AS b")
      .distinct()
    val edges = ed.selectExpr("a AS src", "b AS dst")
      .unionByName(ed.selectExpr("b AS src", "a AS dst"))
    val tol = 1000L
    // converges in 59 iterations on this fixture — the backstop needs
    // real headroom above that, it is a runaway guard not a budget
    val (ranks, iters) =
      Graph.pagerankConverged(edges, "src", "dst", tol, maxIters = 100)
    info(s"sf0.001 bipartite graph converged in $iters iterations")
    assert(iters < 100, "real graph hit the maxIters backstop")
    // damping floor and mass bounds hold at the fixpoint too
    val rows = ranks.collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.foreach { case (node, rank) =>
      assert(rank >= 150000L, s"node $node below damping floor: $rank")
    }
    val n = rows.length.toLong
    assert(rows.map(_._2).sum <= n * 1000000L, "mass created")
  }

  /** Driver-side reference of the orbit-stopped centi-rank iteration:
    * same integer arithmetic, same r_t == r_{t-2} + parity stop. */
  private def prOrbitRef(edges: Seq[(Long, Long)], unit: Long,
                         maxIters: Int): (Map[Long, Long], Int) = {
    val out = edges.groupBy(_._1)
    val nodes = edges.map(_._1).distinct
    val base = 15L * unit / 100L
    val damp = 85L * unit / 100L
    var prev2: Map[Long, Long] = null
    var rank = nodes.map(_ -> unit).toMap
    var iters = 0
    var stop = false
    while (!stop && iters < maxIters) {
      iters += 1
      val inc = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / out(src).size }.sum
      }
      val next = nodes.map { n =>
        n -> (base + (damp * inc.getOrElse(n, 0L)) / unit)
      }.toMap
      val d2 = if (prev2 == null) Long.MaxValue
               else nodes.map(n => math.abs(next(n) - prev2(n))).max
      stop = d2 == 0L && (maxIters - iters) % 2 == 0
      prev2 = rank
      rank = next
    }
    (rank, iters)
  }

  test("orbit-converged pagerank: stops inside the backstop, matches the driver reference") {
    // the REAL sf0.001 bipartite graph — the substrate the registered
    // face runs on, where tol-based stopping provably cannot work
    // (the per-step delta settles to a nonzero 2-cycle constant)
    val ed = graft.Tables.orders(spark, sf("sf0.001"))
      .join(graft.Tables.lineitem(spark, sf("sf0.001")),
            org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .selectExpr("o_custkey * 2 AS a", "l_suppkey * 2 + 1 AS b")
      .distinct()
    val pairs = ed.collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = pairs.toSeq.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val s = spark
    import s.implicits._
    val (gotDf, iters) = Graph.pagerankOrbitConverged(
      sym.toDF("src", "dst"), "src", "dst")
    info(s"sf0.001 bipartite graph entered its orbit at iteration $iters")
    // observed < backstop: the face demonstrably CONVERGED rather
    // than ran out of budget (measured settle rounds 6-12 across the
    // gate scales; the backstop is 24)
    assert(iters < Graph.PrRounds,
      s"orbit not reached inside the $iters-round backstop")
    // parity contract: the stop iteration shares PrRounds' parity, so
    // the PrRounds-unrolled oracle lands on the same cycle phase
    assert((Graph.PrRounds - iters) % 2 == 0, "stop phase mismatch")
    val got = gotDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (want, wantIters) = prOrbitRef(sym, Graph.PrUnit, Graph.PrRounds)
    assert(iters == wantIters,
      s"iteration count diverged from reference: $iters vs $wantIters")
    assert(got == want, "orbit-converged ranks diverged from the reference")
    // determinism across runs (loop + observation state is per-call)
    val (again, iters2) = Graph.pagerankOrbitConverged(
      sym.toDF("src", "dst"), "src", "dst")
    assert(iters2 == iters &&
      again.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == got,
      "orbit-converged pagerank is not deterministic")
  }

  test("bfs: frontier expansion equals a driver brute force (min hop) and is deterministic") {
    def run() = Graph.qGraphBfs(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = run()
    assert(got.nonEmpty, "no reached nodes — spec is vacuous")
    // brute force: textbook BFS over the same delta graph from the
    // same seed set, capped at 4 hops
    val ids = graft.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val deltas = Seq(1L, 2L, 3L, 5L, 8L)
    val nbrs = ids.map { a =>
      a -> (deltas.map(a + _).filter(ids) ++ deltas.map(a - _).filter(ids))
    }.toMap
    var dist = ids.filter(_ % 97 == 0).map(_ -> 0L).toMap
    var frontier = dist.keySet
    for (r <- 1L to 4L) {
      val next = frontier.flatMap(nbrs).diff(dist.keySet)
      dist = dist ++ next.map(_ -> r)
      frontier = next
    }
    val want = dist.toSeq.sorted
    assert(got.toSeq === want)
    // non-degenerate: multiple hop levels actually occur
    assert(got.map(_._2).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L, 4L),
      s"hop levels missing: ${got.map(_._2).distinct.sorted.mkString(",")}")
    assert(run().toSeq === got.toSeq, "bfs is not deterministic")
  }

  test("sssp: 4-round min-plus relaxation equals brute force; weights disagree with hops") {
    def run() = Graph.qGraphSssp(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = run()
    assert(got.nonEmpty)
    // brute force: Bellman-Ford limited to paths of <= 4 edges
    val ids = graft.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val deltas = Seq(1L, 2L, 3L, 5L, 8L)
    val nbrs = ids.map { a =>
      a -> (deltas.map(d => (a + d, d)).filter(e => ids(e._1)) ++
            deltas.map(d => (a - d, d)).filter(e => ids(e._1)))
    }.toMap
    var dist = ids.filter(_ % 97 == 0).map(_ -> 0L).toMap
    for (_ <- 1 to 4) {
      val relaxed = dist.toSeq.flatMap { case (n, b) =>
        nbrs(n).map { case (m, w) => m -> (b + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, bs) => n -> bs.map(_._2).min }
    }
    assert(got.toSeq === dist.toSeq.sorted)
    // the weighted answer is NOT the hop count: some node reached in 1
    // hop still carries weight > 1 (e.g. a seed's 8-delta neighbor),
    // and some node's best weight beats its greedy single-delta cost
    val bfs = Graph.qGraphBfs(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val wmap = got.toMap
    assert(wmap.exists { case (n, w) => bfs.get(n).exists(h => w > h) },
      "weights never exceed hops — the weighted semantics is vacuous here")
    assert(run().toSeq === got.toSeq, "sssp is not deterministic")
  }

  test("kcore: 3-round peel equals brute force and the cascade is real") {
    def run() = Graph.qGraphKcore(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = run()
    assert(got.nonEmpty)
    // brute force: 3 synchronous peels of deg<8 nodes
    val ids = graft.Tables.documents(spark, sf("sf0.001"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val deltas = Seq(1L, 2L, 3L, 5L, 8L)
    def degrees(surv: Set[Long]): Map[Long, Int] =
      surv.iterator.map { a =>
        a -> (deltas.map(a + _) ++ deltas.map(a - _))
          .count(n => ids(n) && surv(n))
      }.toMap
    var surv = ids
    var deg = Map.empty[Long, Int]
    val sizes = (1 to 3).map { _ =>
      deg = degrees(surv).filter(_._2 >= 8)
      surv = deg.keySet
      surv.size
    }
    val want = deg.toSeq.map { case (n, d) => (n, d.toLong) }.sorted
    assert(got.toSeq === want)
    // cascading: every round removes someone new (a one-round filter
    // would make rounds 2-3 dead code)
    assert(sizes(0) < ids.size && sizes(1) < sizes(0) && sizes(2) < sizes(1),
      s"peel did not cascade: ${ids.size} -> ${sizes.mkString(" -> ")}")
    assert(run().toSeq === got.toSeq, "kcore is not deterministic")
  }

  test("kcore converged: full cascade on a chain where the bounded face stops early") {
    val s = spark
    import s.implicits._
    // path 0-1-...-11 with k=2: endpoints peel first, each removal
    // exposes a new sub-k endpoint, and the TRUE 2-core is EMPTY — a
    // 3-round bounded peel still holds the middle 6 nodes, so fixpoint
    // and bounded face genuinely differ here
    val n = 12
    val e0 = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("x", "y")
    val edges = e0.unionByName(e0.select($"y".as("x"), $"x".as("y")))
    val (core, iters) = Graph.kcorePeelConverged(edges, 2L, maxRounds = 20)
    assert(core.count() === 0L, "a path has no 2-core")
    assert(iters >= 5 && iters < 20,
      s"cascade should take ~n/2 rounds and stop before the backstop, ran $iters")
    // driver brute force on the same chain, 3 bounded rounds -> non-empty
    var surv = (0L until n.toLong).toSet
    for (_ <- 1 to 3)
      surv = surv.filter(a => Seq(a - 1, a + 1).count(b => b >= 0 && b < n && surv(b)) >= 2)
    assert(surv.nonEmpty, "fixture broken: bounded peel should differ from fixpoint")
  }

  test("kcore converged: corpus fixpoint equals brute force, stops before backstop") {
    def run() = Graph.qGraphKcoreConverged(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = run()
    assert(got.nonEmpty, "the bipartite trading graph must keep an 8-core")
    // driver brute force to the true fixpoint
    val pairs = graft.Tables.orders(spark, sf("sf0.001"))
      .join(graft.Tables.lineitem(spark, sf("sf0.001")),
            org.apache.spark.sql.functions.expr("o_orderkey = l_orderkey"))
      .selectExpr("o_custkey * 2 AS a", "l_suppkey * 2 + 1 AS b")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var surv = nbrs.keySet
    var deg = Map.empty[Long, Int]
    var stable = false
    while (!stable) {
      deg = surv.iterator.map(a => a -> nbrs(a).count(surv)).toMap
        .filter(_._2 >= 8)
      stable = deg.keySet == surv
      surv = deg.keySet
    }
    assert(got.toSeq === deg.toSeq.map { case (a, d) => (a, d.toLong) }.sorted)
    assert(run().toSeq === got.toSeq, "kcore converged not deterministic")
  }

  test("lpa converged: stabilizes past the bounded budget on a 64-block, equals brute force") {
    val s = spark
    import s.implicits._
    // one 64-id delta-graph block (the converged corpus face's exact
    // per-component shape): min-winning labels walk ~8 ids per round,
    // so stability takes ~10 rounds — past the bounded face's 3 and
    // short of the backstop 20, proving the stop fired on the metric.
    // (A bare path is NOT usable here: synchronous min-tie LPA
    // oscillates at path endpoints — labels 0 and 1 swap forever —
    // which is precisely why the corpus face carries a backstop.)
    val n = 64L
    val deltas = Seq(1L, 2L, 3L, 5L, 8L)
    val ids = (0L until n).toDF("id")
    val e0 = (for { a <- 0L until n; d <- deltas if a + d < n }
      yield (a, a + d)).toDF("x", "y")
    val edges = e0.unionByName(e0.select($"y".as("x"), $"x".as("y")))
    val (labDf, iters) = Graph.lpaConverged(ids, edges, maxRounds = 20)
    val got = labDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver brute force to stability
    val nbrs = (0L until n).map { a =>
      a -> (deltas.map(a + _) ++ deltas.map(a - _)).filter(b => b >= 0 && b < n)
    }.toMap
    var lab = (0L until n).map(a => a -> a).toMap
    var rounds = 0
    var stable = false
    while (!stable && rounds < 50) {
      rounds += 1
      val next = lab.keys.map { a =>
        val nl = nbrs(a).map(lab)
        if (nl.isEmpty) a -> lab(a)
        else a -> nl.groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (l, c) => (-c, l) }._1
      }.toMap
      stable = next == lab
      lab = next
    }
    assert(got === lab)
    assert(iters > 3 && iters < 20,
      s"block stability should take ~10 rounds (>3, <backstop), ran $iters")
    // the engine counts the final no-change round; the driver loop
    // counts it too (stable set on the round AFTER the last change)
    assert(iters === rounds, s"engine rounds $iters != brute-force rounds $rounds")
  }

  test("lpa converged: corpus face stops before the backstop and partitions the ids") {
    val (ids, sym) = {
      // same construction as the query: block-64 delta graph
      val d = Graph.qGraphCommunitiesConverged(spark, sf("sf0.001"))
      val rows = d.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      (rows, rows.map(_._2).sum)
    }
    val nIds = graft.Tables.documents(spark, sf("sf0.001")).count()
    assert(sym === nIds, "communities must partition the id set")
    assert(ids.length > 1, "block-64 LPA should yield one community per block")
    // every community is confined to its 64-block: the min and max
    // member share a block index
    ids.foreach { case (c, _, lo, hi) =>
      assert(lo / 64 === hi / 64, s"community $c spans blocks: [$lo, $hi]")
    }
    val again = Graph.qGraphCommunitiesConverged(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === ids.toSeq, "lpa converged not deterministic")
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
