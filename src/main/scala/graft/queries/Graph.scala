package graft.queries

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph ranking — the join+groupBy loop family next to the
  * fixpoint connected components (queries/ConnectedComponents): each
  * PageRank iteration is one equi-join of the edge list against the
  * current rank vector plus a partial-aggregated contribution sum —
  * exactly the shape that scales (edges shuffle by src, contributions
  * by dst; no adjacency matrix, no driver state). Ranks are kept in
  * integer MICRO-units with floor division so every engine reproduces
  * them bit-for-bit — a float PageRank could drift in the last ulp and
  * break the oracle hash. */
object Graph {

  /** 3 PageRank iterations (damping 0.85, integer ppm arithmetic) over
    * the bipartite customer↔supplier graph (distinct order lines;
    * edges in BOTH directions so the walk has no dangling nodes).
    * Node ids are disambiguated as 2*custkey / 2*suppkey+1. Each
    * iteration localCheckpoints the (node, rank) vector — same
    * lineage discipline as the CC loop. Divisions use SQL `div`
    * (exact int64 integer division, not the double-based idiv trick,
    * whose exactness ends at 2^53): the contribution sum accumulates
    * in DECIMAL(38,0) — the Spark-side twin of the oracle's HUGEINT —
    * so 850000 * inc stays exact far past the ~10^13 scale where a
    * BIGINT sum would wrap silently with ANSI off. */
  /** One PageRank iteration: contribution join + DECIMAL(38,0)
    * partial-agg sum + damped update — shared by the fixed-3 oracle
    * face and [[pagerankConverged]] so the two can never drift. */
  /** One PageRank step over a deg-ANNOTATED edge list (src, dst, deg)
    * — the shared arithmetic core. Callers that loop pre-join deg
    * ONCE into the checkpointed edges (the orbit face: one fewer
    * 1M-row join per iteration); the unrolled fixed-3 face joins
    * per step inside its single plan. */
  private def prStepPre(edgesDeg: DataFrame, nodes: DataFrame,
                        rank: DataFrame, unit: Long): DataFrame = {
    // damping 0.85 expressed in the rank unit: base = 0.15*unit,
    // damp = 0.85*unit (exact for every unit divisible by 100 — ppm
    // for the fixed-3 face, centi-rank for the orbit-converged one)
    val base = 15L * unit / 100L
    val damp = 85L * unit / 100L
    val contrib = edgesDeg
      .join(rank, col("src") === col("node"))
      .select(col("dst"), expr("rank_ppm div deg").as("c"))
      // accumulate in DECIMAL(38,0), matching the oracle's HUGEINT:
      // a BIGINT sum would WRAP to an arbitrary wrong value (ANSI
      // off) once 850000 * inc passes 2^63 (~10^13 contribution
      // scale); the decimal path stays exact to 38 digits — and at
      // the (practically unreachable) 38-digit limit a non-ANSI
      // overflow yields NULL rank_ppm rows, which diverge VISIBLY
      // from the oracle instead of wrapping to plausible garbage
      .groupBy("dst")
      .agg(sum(col("c").cast("decimal(38,0)")).as("inc"))
    nodes.join(contrib, col("node") === col("dst"), "left")
      .select(col("node"),
        expr(s"${base}L + (${damp}L * coalesce(inc, CAST(0 AS DECIMAL(38,0))))" +
          s" div ${unit}L").as("rank_ppm"))
  }

  private def prStep(edges: DataFrame, deg: DataFrame, nodes: DataFrame,
                     rank: DataFrame, unit: Long = 1000000L): DataFrame =
    prStepPre(edges.join(deg, "src"), nodes, rank, unit)

  /** Per-invocation counter folded into Observation names — the
    * metrics listener matches observations by NAME session-wide, so
    * concurrent runs must not share round names (same guard as
    * ConnectedComponents.labels). */
  private val invocations = new java.util.concurrent.atomic.AtomicLong(0L)

  /** PageRank iterated until NO node's rank moves by more than
    * `tolPpm` integer micro-units — the convergence-stopped face next
    * to the fixed-3-iteration oracle face ([[qGraphPagerank]]; both
    * share [[prStep]], so the converged variant is the same arithmetic
    * run longer). `edges0` is the DIRECTED contribution list (two
    * node-id columns; symmetrize before calling for an undirected
    * walk, as qGraphPagerank does).
    *
    * Termination discipline = ConnectedComponents.labels: the max
    * |rank delta| is an observed metric riding ON the per-iteration
    * localCheckpoint action (its accumulator is settled when the eager
    * checkpoint returns), so each iteration is exactly ONE Spark job —
    * no separate convergence-count pass. Integer ranks make the test
    * exact: no float epsilon, bit-stable across partitionings.
    * `maxIters` is a runaway backstop: damping contracts deltas by
    * ~0.85x per iteration, but FLOOR division can leave a terminal
    * ±1 ppm oscillation that a tolPpm=0 caller would otherwise spin
    * on. Returns (ranks ordered by node, iterations run).
    *
    * The per-iteration state goes through [[graft.Lineage.truncate]],
    * not bare localCheckpoint: the checkpoint's LogicalRDD inherits
    * the origin plan's statistics, which SQUARE every iteration and
    * overflow BigInteger around iteration 30 (see Lineage's scaladoc
    * for the measured failure) — a hazard only loops with large
    * iteration budgets hit, which is exactly this face. */
  def pagerankConverged(edges0: DataFrame, srcCol: String, dstCol: String,
                        tolPpm: Long = 0L,
                        maxIters: Int = 100): (DataFrame, Int) = {
    val inv = invocations.incrementAndGet()
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    var rank = nodes.withColumn("rank_ppm", lit(1000000L))
      .localCheckpoint(true)
    var iters = 0
    var moved = Long.MaxValue
    while (moved > tolPpm && iters < maxIters) {
      iters += 1
      val obs = Observation(s"pr_${inv}_iter_$iters")
      // Lineage.truncate runs the eager checkpoint (the ONE action this
      // iteration issues — the observation settles on it) and then
      // drops the checkpoint's inherited statistics
      val next = graft.Lineage.truncate(prStep(edges, deg, nodes, rank)
        .join(rank.select(col("node").as("pnode"), col("rank_ppm").as("prev")),
              col("node") === col("pnode"))
        .observe(obs, coalesce(max(abs(col("rank_ppm") - col("prev"))),
                               lit(0L)).as("max_delta"))
        .select(col("node"), col("rank_ppm")))
      moved = obs.get("max_delta").asInstanceOf[Long]
      rank = next
    }
    (rank.orderBy("node"), iters)
  }

  /** Rank unit and round backstop for [[qGraphPagerankConverged]] —
    * CONTRACT constants (the oracle unrolls exactly [[PrRounds]] CTE
    * rounds at unit [[PrUnit]]), not engine knobs. Centi-rank (start
    * 100, floor 15) rather than ppm because the orbit-settle round is
    * governed by log_{1/0.85}(initial delta): at ppm resolution the
    * bipartite graph needs 73-98 rounds to enter its exact 2-cycle
    * (measured at sf0.001/sf0.01/sf0.1), at centi resolution 6-12 —
    * the only knob that turns an O(100)-round loop into an O(10)-round
    * one without touching the damping semantics. PrRounds must stay
    * EVEN: the backstop case must land on the same cycle phase as the
    * oracle's unroll (see [[pagerankOrbitConverged]]). */
  private[queries] val PrUnit = 100L
  private[queries] val PrRounds = 24

  /** PageRank iterated until the rank vector enters its exact
    * period-2 orbit — r_t == r_{t-2} — or the `maxIters` backstop.
    *
    * Why orbit detection and not delta tolerance: on a BIPARTITE
    * graph the walk operator has eigenvalue -1, so the damped
    * iteration contracts onto a persistent 2-CYCLE, not a fixpoint —
    * the per-step delta settles to a nonzero constant (measured 123 /
    * 13 / 70 ppm at the three gate scales) and a tol=0 loop would
    * always run its full backstop. r_t == r_{t-2} is the true
    * stationary condition (period 1, the classic fixpoint, satisfies
    * it too) and it is EXACT — no float epsilon, bit-stable.
    *
    * Oracle contract (the kcore/LPA no-op trick, phase-aware): once
    * r_t == r_{t-2}, every later state alternates r_{t-2}, r_{t-1},
    * ... — so an oracle that unrolls exactly N rounds equals the
    * engine iff the engine stops on an iteration of N's PARITY. The
    * loop therefore only stops when the orbit is detected AND
    * (N - t) is even (detection persists, so at worst one extra
    * iteration aligns the phase); the backstop case runs exactly N
    * on both sides. Same one-action-per-round discipline as
    * [[pagerankConverged]]: the orbit metric rides the eager
    * checkpoint's Observation, lineage through Lineage.truncate.
    * Returns (ranks ordered by node, iterations run). */
  private[queries] def pagerankOrbitConverged(
      edges0: DataFrame, srcCol: String, dstCol: String,
      unit: Long = PrUnit, maxIters: Int = PrRounds): (DataFrame, Int) = {
    require(maxIters % 2 == 0, "maxIters must be even (cycle phase)")
    val inv = invocations.incrementAndGet()
    val edges = edges0
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // deg pre-joined ONCE into the checkpointed edge list, then
    // PARTITIONED AND SORTED BY THE JOIN KEY before the checkpoint:
    // localCheckpoint preserves outputPartitioning/outputOrdering, so
    // every iteration's sort-merge join against the rank vector reuses
    // the big side as-is — only the nodes-sized rank frame exchanges
    // and sorts per step, never the million-row edge list. This is the
    // partition-once-iterate-many design a cluster PageRank runs on;
    // without it each step re-exchanged and re-sorted the edges
    // (measured: the loop's dominant cost at sf0.1).
    val edgesDeg = edges.join(deg, "src")
      .repartition(col("src"))
      .sortWithinPartitions("src")
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    // NOT checkpointed: a literal projection of the already-
    // checkpointed nodes table — materializing it was one more eager
    // job of pure setup overhead (round-18); each consumer re-projects
    // the in-memory blocks instead
    var prev = nodes.withColumn("rank_ppm", lit(unit))
    var iters = 0
    var stop = false
    // TWO steps per Spark job: the orbit test compares r_t to r_{t-2},
    // which with stride 2 is exactly the previous job's result — so
    // each job runs steps t-1 and t unrolled in one plan, observes
    // max|r_t - r_{t-2}| on its eager checkpoint, and the loop pays
    // half the per-job overhead of a stride-1 loop. Stride 2 from the
    // uniform start also lands every check on an EVEN iteration, so a
    // stop always shares the (even) backstop's parity BY CONSTRUCTION
    // — and it stops at the same iteration a stride-1 parity-waiting
    // loop would: an orbit first seen at odd t implies r_{t+1} ==
    // r_{t-1} (one more application of the same map), so the first
    // EVEN detection is t+1 either way.
    while (!stop && iters < maxIters) {
      iters += 2
      val obs = Observation(s"pro_${inv}_iter_$iters")
      val stepped = prStepPre(edgesDeg, nodes,
        prStepPre(edgesDeg, nodes, prev, unit), unit)
      val next = graft.Lineage.truncate(
        stepped
          .join(prev.select(col("node").as("p2node"),
                            col("rank_ppm").as("p2")),
                col("node") === col("p2node"))
          .observe(obs, coalesce(max(abs(col("rank_ppm") - col("p2"))),
                                 lit(0L)).as("d2"))
          .select(col("node"), col("rank_ppm")))
      val d2 = obs.get("d2").asInstanceOf[Long]
      stop = d2 == 0L
      prev = next
    }
    (prev.orderBy("node"), iters)
  }

  /** PageRank run to its exact stationary orbit on the bipartite
    * customer↔supplier graph (same substrate as [[qGraphPagerank]] /
    * [[qGraphKcoreConverged]]) in centi-rank units — the converged
    * face next to the fixed-3-iteration one, completing the converged
    * family (CC, k-core, LPA all ship theirs). Output rank column is
    * `rank_cu` (centi-units) so the two faces' schemas can't be
    * confused. GraphSpec pins observed rounds strictly below the
    * [[PrRounds]] backstop at the gate scales. */
  def qGraphPagerankConverged(s: SparkSession, dir: String): DataFrame = {
    val ed = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ed.select(col("b").as("src"), col("a").as("dst")))
    pagerankOrbitConverged(edges, "src", "dst")._1
      .select(col("node"), col("rank_ppm").as("rank_cu"))
      .orderBy("node")
  }

  def qGraphPagerank(s: SparkSession, dir: String): DataFrame = {
    val ed = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir),
            col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
              (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    // the edge list feeds FIVE consumers (deg, nodes, 3 x contrib) —
    // materialize the orders x lineitem join + distinct ONCE
    // (localCheckpoint: ContextCleaner-reclaimed, same discipline as
    // Prefix.withPrefix)
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(ed.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    // 3 iterations unrolled into ONE plan: no per-iteration eager
    // localCheckpoint (each one is a full materialize-to-memory job —
    // pure overhead at depth 3; the converged face keeps them because
    // ITS lineage is unbounded). edges/deg/nodes stay checkpointed:
    // each feeds every unrolled step, so the single plan scans three
    // small in-memory RDDs instead of re-deriving the orders⨝lineitem
    // distinct three times.
    var rank = nodes.withColumn("rank_ppm", lit(1000000L))
    for (_ <- 1 to 3)
      rank = prStep(edges, deg, nodes, rank)
    rank.orderBy("node")
  }

  /** Triangle counting — the canonical whole-graph join benchmark —
    * with the DEGREE-ORIENTED (node-iterator++) plan that survives
    * skewed graphs: every undirected edge is oriented from its lower
    * (degree, id) endpoint to the higher, so each node's out-degree is
    * O(sqrt(m)) on ANY graph (a star's hub has out-degree 0) and the
    * wedge self-join is bounded by Σ out-deg² = O(m^1.5) instead of a
    * hub's quadratic blow-up; every triangle has exactly one node with
    * both out-edges, so each is counted once. The graph is the
    * deterministic delta graph on doc_ids (i → i+d, d ∈ {1,2,3,5,8},
    * membership-joined so it holds under any id domain), which closes
    * seven (d1, d2) triangle shapes; output = count per shape. All
    * joins key on node ids — id pairs on the wire, never payloads.
    * The ORACLE counts the same triangles id-oriented (a<b<c) —
    * orientation changes the join sizes, never the count, which is
    * exactly the property the cross-engine hash check proves. */
  /** The triangle graph's node source — the exact projection the
    * operator scans, exposed so PlanSpec can pin its column pruning
    * (the scan runs inside the eager checkpoint, invisible to the
    * final plan). */
  private[queries] def triangleIds(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id").as("id"))

  def qGraphTriangles(s: SparkSession, dir: String): DataFrame = {
    val ids = triangleIds(s, dir).localCheckpoint(true)
    val cand = ids.select(col("id").as("a"),
      explode(array(Seq(1, 2, 3, 5, 8).map(d => col("id") + d): _*)).as("b"))
    // a < b by construction; keep only edges whose far end exists
    val edges = cand.join(ids.select(col("id").as("b")), Seq("b"))
      .select(col("a"), col("b")).localCheckpoint(true)
    val deg = edges.select(col("a").as("n"))
      .unionByName(edges.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // oriented edge + the dst endpoint's (deg, id) for wedge ordering
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddst"))
      .localCheckpoint(true)
    val e1 = oriented.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
    val e2 = oriented.select(col("src"), col("dst").as("w"), col("ddst").as("dw"))
    val wedges = e1.join(e2, Seq("src"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val closed = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    closed
      .select(least(col("src"), col("v"), col("w")).as("lo"),
              greatest(col("src"), col("v"), col("w")).as("hi"),
              (col("src") + col("v") + col("w")).as("sm"))
      .select((col("sm") - col("lo") - col("hi") - col("lo")).as("d1"),
              (col("hi") - (col("sm") - col("lo") - col("hi"))).as("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("n"))
      .orderBy("d1", "d2")
  }

  /** Community detection by synchronous LABEL PROPAGATION (Raghavan
    * et al. 2007), 3 fixed iterations over the same deterministic
    * delta graph as [[qGraphTriangles]]: every node starts as its own
    * label; each round it adopts the most frequent label among its
    * NEIGHBORS, ties broken toward the smallest label — the (count
    * DESC, label ASC) total order both engines state, which is what
    * makes a fixed-iteration LPA hash-exact (classic LPA randomizes
    * tie-breaks; determinism here is a semantic choice, not a
    * shortcut). Per iteration: one edge-vs-label equi-join + two hash
    * aggs — the same one-shuffle-per-round discipline as the CC and
    * PageRank loops, per-round state through Lineage.truncate. The
    * argmax rides a single max(struct(cnt, -lab)) aggregate — no
    * per-node window sort. Output: per surviving label, community
    * size and node range. */
  def qGraphCommunities(s: SparkSession, dir: String): DataFrame = {
    val (ids, sym) = deltaGraph(s, dir)
    var lab = ids.select(col("id"), col("id").as("lab"))
    for (_ <- 1 to 3)
      lab = graft.Lineage.truncate(
        lpaRound(sym, lab).select(col("id"), col("lab")))
    lab.groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_members"),
           min(col("id")).as("min_node"), max(col("id")).as("max_node"))
      .orderBy("community")
  }

  /** One synchronous LPA round as a single BALLOT-STREAM aggregation —
    * no per-round left join (round-19): every node casts a count-0
    * SELF-ballot for its current label next to its neighbors'
    * count-≥1 ballots, and the same (count DESC, label ASC) argmax
    * picks the new label. Exactly the join+coalesce semantics:
    * neighbor ballots always carry cnt ≥ 1, so the self-ballot wins
    * ONLY when a node has no neighbor ballots — precisely the rows
    * the old left join's coalesce(newlab, lab) preserved, and it can
    * never tie a real ballot (0 ≠ ≥1). The count-0 ballot doubles as
    * the carrier of the node's PREVIOUS label (`max(when(cnt=0))` —
    * the unique cnt=0 row per node), so the converged face's
    * changed-count metric needs no join either. Round cost: one
    * equi-join against the (pre-partitioned) edge list + two hash
    * aggs — the old shape additionally exchanged and joined the full
    * label table a second time every round. Returns (id, lab0, lab). */
  private def lpaRound(sym: DataFrame, lab: DataFrame): DataFrame =
    sym.join(lab, col("y") === col("id"))
      .groupBy(col("x"), col("lab")).agg(count(lit(1)).as("cnt"))
      .unionByName(lab.select(col("id").as("x"), col("lab"), lit(0L).as("cnt")))
      .groupBy(col("x"))
      .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("m"),
           max(when(col("cnt") === 0, col("lab"))).as("lab0"))
      .select(col("x").as("id"), col("lab0"), (-col("m.nl")).as("lab"))

  /** The deterministic DELTA GRAPH on doc_ids shared by the
    * communities / BFS / SSSP / k-core loops: (checkpointed ids,
    * checkpointed SYMMETRIC edge list) for i ↔ i±d, d ∈ {1,2,3,5,8},
    * both endpoints membership-joined. SSSP derives its edge weight as
    * abs(x−y) — on this graph that IS the generating delta. (Triangles
    * keeps its own low→high oriented construction: orientation is the
    * point of that operator.) One definition site so the delta set
    * can never desynchronize across the loop family; the oracle twins
    * share [[deltaEdgesSql]] the same way. */
  private def deltaGraph(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ids = Tables.documents(s, dir).select(col("doc_id").as("id"))
      .localCheckpoint(true)
    val cand = ids.select(col("id").as("x"),
      explode(array(Seq(1, 2, 3, 5, 8).map(d => col("id") + d): _*)).as("y"))
    val e0 = cand.join(ids.select(col("id").as("y")), Seq("y"))
      .select(col("x"), col("y"))
    val edges = e0.unionByName(e0.select(col("y").as("x"), col("x").as("y")))
      .localCheckpoint(true)
    (ids, edges)
  }

  /** The oracle-side prologue of [[deltaGraph]]: ids + symmetric
    * edges as MATERIALIZED CTEs (10x rule). */
  private val deltaEdgesSql: String =
    """ids AS MATERIALIZED (SELECT doc_id AS id FROM documents),
      |cand AS (
      |  SELECT a.id AS x, a.id + d AS y
      |  FROM ids a, (VALUES (1), (2), (3), (5), (8)) AS dd(d)),
      |e0 AS MATERIALIZED (
      |  SELECT x, y FROM cand JOIN ids b ON b.id = cand.y),
      |edges AS MATERIALIZED (
      |  SELECT x, y FROM e0 UNION ALL SELECT y AS x, x AS y FROM e0)""".stripMargin

  /** Multi-source BFS hop distances — the FRONTIER-EXPANSION loop that
    * completes the iterative-graph family (CC = fixpoint labels,
    * PageRank = weighted walk, LPA = label argmax, BFS = reachability
    * with distance): seeds are every 97th doc_id (dist 0), and each of
    * 4 rounds expands the frontier one hop over the deterministic
    * delta graph (i ↔ i±d, d ∈ {1,2,3,5,8}), settling every
    * NEWLY-reached node at the round number — first visit IS the
    * minimum hop count, the invariant BFS gives for free and
    * GraphSpec re-proves against a driver brute force.
    *
    * Per round: one edge-vs-frontier equi-join + distinct + one
    * anti-join against the settled set — the visited-set discipline
    * that makes distributed BFS linear in REACHED EDGES instead of
    * enumerating paths (a path-exploding recursive join is the
    * classic 100 TB graph killer). State is (node, dist) for reached
    * nodes only; the frontier re-derives from the checkpointed
    * settled set, so each round is one shuffle and lineage stays
    * flat (Lineage.truncate, same as the CC/LPA loops). Unreached
    * nodes are absent from the output by definition — the hop budget
    * (4) bounds work on ANY graph, the property that makes this the
    * production shape for "within-k-hops" features. */
  def qGraphBfs(s: SparkSession, dir: String): DataFrame = {
    val (ids, edges) = deltaGraph(s, dir)
    var settled = ids.filter(col("id") % 97 === 0)
      .select(col("id").as("node"), lit(0L).as("dist"))
    for (r <- 1 to 4) {
      val frontier = settled.filter(col("dist") === (r - 1).toLong)
        .select(col("node"))
      val next = edges.join(frontier, col("x") === col("node"))
        .select(col("y").as("node")).distinct()
        .join(settled.select(col("node").as("sn")),
              col("node") === col("sn"), "left_anti")
        .select(col("node"), lit(r.toLong).as("dist"))
      settled = graft.Lineage.truncate(settled.unionByName(next))
    }
    settled.orderBy("node")
  }

  /** Bounded single-source-set SHORTEST PATHS (weighted) — the
    * MIN-PLUS RELAXATION loop next to [[qGraphBfs]]'s unweighted
    * frontier: edge weight = its delta d (so the cheapest route
    * between ids 0 and 8 is one 8-edge, but hop-minimal BFS and
    * weight-minimal SSSP genuinely disagree on intermediate ids —
    * GraphSpec proves the brute-force parity where they differ), 4
    * Bellman-Ford rounds from the same %97 seed set. Unlike BFS, a
    * settled node CAN improve in a later round (more hops, less
    * weight), so the loop is relax-and-min, not expand-and-freeze:
    * each round one edges⨝dist equi-join + one min() hash agg — the
    * min-plus semiring matrix-vector product, one shuffle per round,
    * state = (node, best) for reached nodes only, no path
    * enumeration. Bounded rounds (=max path EDGES considered) keep
    * the work budget fixed on any graph — the iterate-to-fixpoint
    * face would reuse the ConnectedComponents observation-metric
    * stopping discipline. */
  def qGraphSssp(s: SparkSession, dir: String): DataFrame = {
    val (ids, sym) = deltaGraph(s, dir)
    // on the delta graph the generating delta IS abs(x - y)
    val edges = sym.select(col("x"), col("y"), abs(col("x") - col("y")).as("w"))
    var dist = ids.filter(col("id") % 97 === 0)
      .select(col("id").as("node"), lit(0L).as("best"))
    for (_ <- 1 to 4) {
      val relaxed = edges.join(dist, col("x") === col("node"))
        .select(col("y").as("node"), (col("best") + col("w")).as("best"))
      dist = graft.Lineage.truncate(
        dist.unionByName(relaxed)
          .groupBy("node").agg(min(col("best")).as("best")))
    }
    dist.orderBy("node")
  }

  /** Bounded k-CORE PEELING (k=8, 3 rounds) — the node-REMOVAL loop
    * completing the iterative-graph set (frontier = BFS, relax = SSSP,
    * label = LPA/CC, walk = PageRank, peel = k-core): each round drops
    * every node whose degree IN THE SURVIVING SUBGRAPH is below k, so
    * removals cascade — a node that had degree 10 yesterday dies today
    * because its peeled neighbors no longer count (GraphSpec proves
    * the cascade is real on this graph and pins brute-force parity).
    * Output = round-3 survivors with the degree that justified their
    * survival.
    *
    * Per round: two semi-shaped equi-joins (edge endpoints against the
    * survivor set) + one count agg — ids only on the wire, one
    * survivor set per round through Lineage.truncate. Bounded rounds
    * fix the work budget; the fixpoint face would reuse the CC
    * observation-metric stopping discipline (peel until no node
    * drops). This is the standard graph-cleaning pass before dense
    * community analysis at scale. */
  def qGraphKcore(s: SparkSession, dir: String): DataFrame = {
    val (ids, edges) = deltaGraph(s, dir)
    var surv = ids.select(col("id").as("node"))
    var deg: DataFrame = null
    for (_ <- 1 to 3) {
      deg = graft.Lineage.truncate(
        edges
          .join(surv.select(col("node").as("x")), Seq("x"))
          .join(surv.select(col("node").as("y")), Seq("y"))
          .groupBy(col("x").as("node")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 8))
      surv = deg.select(col("node"))
    }
    deg.orderBy("node")
  }

  /** k-core peeled to FIXPOINT — "peel until stable", the converged
    * discipline next to [[qGraphKcore]]'s bounded 3 rounds (which
    * silently leaves sub-k nodes whenever a removal cascade runs longer
    * than the budget; GraphSpec exhibits a chain where bounded and
    * fixpoint genuinely differ and pins driver brute-force parity).
    * Peeling is MONOTONE (the survivor set only shrinks), so the
    * fixpoint exists, is unique (the classic k-core), and an equal
    * survivor COUNT across one round proves an equal SET — the observed
    * metric that stops the loop. Same one-action-per-round discipline
    * as [[pagerankConverged]] / ConnectedComponents.labels: the count
    * rides the eager checkpoint's Observation, lineage through
    * Lineage.truncate. `edges` must be the SYMMETRIC (x, y) list; the
    * node set is its distinct sources.
    *
    * Oracle trick shared with [[lpaConverged]]: a peel round AT the
    * fixpoint is a no-op, so an oracle that unrolls exactly `maxRounds`
    * CTE rounds equals the engine whether the engine stopped early
    * (remaining oracle rounds recompute the same set) or ran the full
    * backstop (both did maxRounds) — the early stop is purely an
    * optimization, never a semantic fork. GraphSpec pins the observed
    * round count strictly below the backstop at the gate scales, so
    * the face demonstrably CONVERGED rather than ran out of budget. */
  private[queries] def kcorePeelConverged(edges: DataFrame, k: Long,
                                          maxRounds: Int)
      : (DataFrame, Int) = {
    val inv = invocations.incrementAndGet()
    var surv = edges.select(col("x").as("node")).distinct()
    var deg: DataFrame = null
    var prev = -1L // unknown until the first round's count settles
    var iters = 0
    var stable = false
    while (!stable && iters < maxRounds) {
      iters += 1
      val obs = Observation(s"kcore_${inv}_round_$iters")
      deg = graft.Lineage.truncate(
        edges
          .join(surv.select(col("node").as("x")), Seq("x"))
          .join(surv.select(col("node").as("y")), Seq("y"))
          .groupBy(col("x").as("node")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k)
          .observe(obs, coalesce(count(lit(1)), lit(0L)).as("n_surv")))
      val n = obs.get("n_surv").asInstanceOf[Long]
      stable = n == prev
      prev = n
      surv = deg.select(col("node"))
    }
    (deg.orderBy("node"), iters)
  }

  /** The fixpoint 8-core of the bipartite customer↔supplier trading
    * graph (same construction as [[qGraphPagerank]]) — the substrate
    * whose heterogeneous real-data degrees give a NON-EMPTY core (the
    * delta graph's uniform 1-D structure erodes to nothing under any
    * k above its boundary degree, and its removal cascade runs O(N)
    * rounds — unbounded rounds at scale is exactly what a fixpoint
    * face must not cost; on this graph the peel stabilizes in 2-3
    * observed rounds at every gate scale, against the backstop 8). */
  def qGraphKcoreConverged(s: SparkSession, dir: String): DataFrame = {
    val ed = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val edges = ed.select(col("a").as("x"), col("b").as("y"))
      .unionByName(ed.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint(true)
    kcorePeelConverged(edges, 8L, KcoreRounds)._1
  }

  /** Label propagation iterated until NO label changes (or the
    * `maxRounds` backstop) — "propagate until stable" next to
    * [[qGraphCommunities]]' bounded 3 rounds. Synchronous LPA with the
    * deterministic (count DESC, label ASC) tie-break is NOT guaranteed
    * to reach a fixpoint (two-cycles exist on bipartite-ish graphs),
    * which is exactly why the stopping metric carries a backstop and
    * why the no-op-after-stability oracle trick still gives an exact
    * contract: stopped early ⇒ the oracle's remaining unrolled rounds
    * recompute identical labels; never stable ⇒ both sides run the
    * full `maxRounds`. The changed-label count is observed on the same
    * eager checkpoint that truncates the round's lineage — one Spark
    * job per round. Returns (labels ordered by id, rounds run). */
  private[queries] def lpaConverged(ids: DataFrame, sym: DataFrame,
                                    maxRounds: Int = LpaRounds)
      : (DataFrame, Int) = {
    val inv = invocations.incrementAndGet()
    var lab = ids.select(col("id"), col("id").as("lab"))
    var iters = 0
    var changed = Long.MaxValue
    while (changed > 0L && iters < maxRounds) {
      iters += 1
      val obs = Observation(s"lpa_${inv}_round_$iters")
      // ballot-stream round ([[lpaRound]]): the count-0 self-ballot
      // carries each node's previous label, so the changed-count
      // metric rides the same aggregation — no per-round label join
      val next = graft.Lineage.truncate(
        lpaRound(sym, lab)
          .observe(obs, coalesce(sum(when(col("lab") =!= col("lab0"), 1L)
                                       .otherwise(0L)), lit(0L)).as("n_changed"))
          .select(col("id"), col("lab")))
      changed = obs.get("n_changed").asInstanceOf[Long]
      lab = next
    }
    (lab, iters)
  }

  /** LPA run to stability on the BLOCK-64 delta graph: the plain delta
    * graph is one giant component whose min-winning labels walk at most
    * 8 ids per round, so "propagate until stable" would cost O(N/8)
    * rounds — linear rounds at scale is the failure mode, not a
    * tuning issue. Restricting edges to same-(id div 64) blocks bounds
    * every component's diameter by the block, so convergence is ~10
    * rounds NO MATTER the corpus size (measured 10 at 500 and at 5000
    * ids) — the bounded-component blocking a 100 TB "cluster within
    * cohort" pass uses for exactly this reason. Output = one community
    * row per surviving label, same shape as [[qGraphCommunities]]. */
  def qGraphCommunitiesConverged(s: SparkSession, dir: String): DataFrame = {
    val (ids, sym) = deltaGraph(s, dir)
    val blocked = sym.filter(expr("x div 64 = y div 64")).localCheckpoint(true)
    lpaConverged(ids, blocked)._1
      .groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_members"),
           min(col("id")).as("min_node"), max(col("id")).as("max_node"))
      .orderBy("community")
  }

  /** Backstop budgets — also the oracle unroll depths, so they are the
    * CONTRACT's round bounds, not just engine knobs. Sized from the
    * observed convergence on the synthetic corpus (the bipartite peel
    * stabilizes in 2-3 rounds, block-64 LPA in 10, at every gate
    * scale; GraphSpec pins observed < backstop) with headroom. */
  private[queries] val KcoreRounds = 8
  private[queries] val LpaRounds = 12

  /** Per-customer neighbor-list cap for [[qGraphLinkPredict]] — the
    * candidate-pair stage is quadratic in a customer's degree, so a
    * hub customer must be bounded BEFORE the self-join (the same
    * day-one cap discipline as the banded LSH/phash joins). The cap
    * is deterministic (keep the 64 LOWEST suppkeys) and part of the
    * CONTRACT: the oracle applies the identical rule, so capped runs
    * stay hash-exact. maxdeg at the gate scales is 102 (sf0.1), so
    * the cap genuinely fires there. */
  private[queries] val LinkDegCap = 64

  /** Link prediction by RESOURCE-ALLOCATION index (Zhou-Lü-Zhang
    * 2009, the exact-arithmetic member of the common-neighbors family
    * that Adamic-Adar approximates with floats): for supplier pairs
    * (s1 < s2), score = Σ over shared customers c of 1/deg(c) — a
    * shared low-degree customer is strong evidence, a shared hub is
    * weak. Weights are integer ppm (1000000 div deg, exact in both
    * engines); top-20 pairs by (score DESC, s1, s2).
    *
    * Plan shape: ONE row_number window caps each customer's neighbor
    * list at [[LinkDegCap]] (bounded state per key, the skew guard);
    * the pair stage is an equi-join ON THE CUSTOMER ID of two
    * projections of the capped list — candidate generation is
    * Σ min(deg,cap)² per customer, never |V|². The groupBy(s1, s2)
    * partial-aggregates map-side (pair space is supplier², tiny next
    * to the candidate stream), and the final top-20 is a
    * TakeOrderedAndProject — only 20 survivors reach the driver. At
    * 100 TB this is the standard co-occurrence recommender shape:
    * cap, join-on-entity, combine, bounded top-k. */
  def qGraphLinkPredict(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct()
    // the capped list feeds FOUR consumers once the pair self-join
    // duplicates its subtree (side a, side b, and a deg branch inside
    // each): without the checkpoint the orders⨝lineitem distinct +
    // TopKPerKey pipeline ran 4x — 4 lineitem scans, 8 exchanges
    // (round-18 plan audit; ~6 s → ~1 s at sf0.1). The materialized
    // state is bounded: ≤ LinkDegCap rows per customer, ids only.
    val capped = e
      .withColumn("rn", row_number().over(
        Window.partitionBy("c").orderBy("sp")))
      .filter(col("rn") <= LinkDegCap)
      .select("c", "sp")
      .localCheckpoint(true)
    val deg = capped.groupBy(col("c").as("dc")).agg(count(lit(1)).as("d"))
    val w = capped.join(deg, col("c") === col("dc"))
      .select(col("c"), col("sp"), expr("1000000L div d").as("w"))
    val a = w.select(col("c"), col("sp").as("s1"), col("w"))
    val b = w.select(col("c").as("c2"), col("sp").as("s2"))
    a.join(b, col("c") === col("c2") && col("s1") < col("s2"))
      .groupBy("s1", "s2")
      .agg(sum(col("w")).as("score_ppm"), count(lit(1)).as("n_common"))
      .orderBy(col("score_ppm").desc, col("s1").asc, col("s2").asc)
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_link_predict" -> (qGraphLinkPredict _),
    "q_graph_kcore_converged" -> (qGraphKcoreConverged _),
    "q_graph_communities_converged" -> (qGraphCommunitiesConverged _),
    "q_graph_kcore" -> (qGraphKcore _),
    "q_graph_sssp" -> (qGraphSssp _),
    "q_graph_bfs" -> (qGraphBfs _),
    "q_graph_communities" -> (qGraphCommunities _),
    "q_graph_pagerank" -> (qGraphPagerank _),
    "q_graph_pagerank_converged" -> (qGraphPagerankConverged _),
    "q_graph_triangles" -> (qGraphTriangles _),
  )

  /** N unrolled LPA rounds: nl{t} = neighbor-label counts, pick{t} =
    * (count DESC, label ASC) argmax per node, l{t} = adopted labels
    * (nodes with no neighbors keep theirs). MATERIALIZED on every
    * multiply-referenced CTE (the 10x scale-safety rule). Shared by
    * the bounded face (n=3) and the converged face (n=LpaRounds —
    * exact because post-stability rounds are no-ops; see
    * [[lpaConverged]]). */
  private def communitiesSqlN(n: Int, edgeCte: String = "edges",
                              extraCtes: String = ""): String = {
    val rounds = (1 to n).map { t =>
      s"""nl$t AS (
         |  SELECT e.x AS id, l.lab, COUNT(*) AS cnt
         |  FROM $edgeCte e JOIN l${t - 1} l ON l.id = e.y
         |  GROUP BY e.x, l.lab),
         |pick$t AS (
         |  SELECT id, lab FROM (
         |    SELECT id, lab,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, lab ASC) AS rn
         |    FROM nl$t) WHERE rn = 1),
         |l$t AS MATERIALIZED (
         |  SELECT p.id, COALESCE(k.lab, p.lab) AS lab
         |  FROM l${t - 1} p LEFT JOIN pick$t k ON k.id = p.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $deltaEdgesSql,$extraCtes
       |l0 AS MATERIALIZED (SELECT id, id AS lab FROM ids),
       |$rounds
       |SELECT lab AS community, COUNT(*) AS n_members,
       |  MIN(id) AS min_node, MAX(id) AS max_node
       |FROM l$n GROUP BY lab ORDER BY community""".stripMargin
  }
  private lazy val communitiesSql: String = communitiesSqlN(3)

  /** [[qGraphCommunitiesConverged]]'s oracle: LpaRounds unrolled LPA
    * rounds over the block-64 edge subset — exact vs the engine's
    * early-stopped loop because post-stability rounds are no-ops (and
    * the backstop case runs the same count on both sides). */
  private lazy val communitiesConvergedSql: String =
    communitiesSqlN(LpaRounds, edgeCte = "bedges", extraCtes =
      """
        |bedges AS MATERIALIZED (
        |  SELECT x, y FROM edges WHERE x // 64 = y // 64),""".stripMargin)

  /** [[qGraphKcoreConverged]]'s oracle: KcoreRounds unrolled peel
    * rounds over the bipartite customer↔supplier graph (k=8). */
  private lazy val kcoreConvergedSql: String = {
    val rounds = (1 to KcoreRounds).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT e.x AS node, COUNT(*) AS deg
         |  FROM edges e
         |  JOIN s${k - 1} a ON a.node = e.x
         |  JOIN s${k - 1} b ON b.node = e.y
         |  GROUP BY e.x),
         |s$k AS MATERIALIZED (SELECT node FROM d$k WHERE deg >= 8)""".stripMargin
    }.mkString(",\n")
    s"""WITH ed AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT a AS x, b AS y FROM ed
       |  UNION ALL SELECT b AS x, a AS y FROM ed),
       |s0 AS MATERIALIZED (SELECT DISTINCT x AS node FROM edges),
       |$rounds
       |SELECT node, deg FROM d$KcoreRounds WHERE deg >= 8
       |ORDER BY node""".stripMargin
  }

  /** 4 unrolled BFS rounds: f{k} = nodes one hop from the (k-1)
    * frontier not yet settled, s{k} = accumulated (node, dist).
    * MATERIALIZED on every multiply-referenced CTE (10x rule). */
  private lazy val bfsSql: String = {
    val rounds = (1 to 4).map { k =>
      s"""f$k AS MATERIALIZED (
         |  SELECT DISTINCT e.y AS node
         |  FROM edges e JOIN s${k - 1} s ON s.node = e.x
         |  WHERE s.dist = ${k - 1}
         |    AND e.y NOT IN (SELECT node FROM s${k - 1})),
         |s$k AS MATERIALIZED (
         |  SELECT node, dist FROM s${k - 1}
         |  UNION ALL
         |  SELECT node, CAST($k AS BIGINT) AS dist FROM f$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH $deltaEdgesSql,
       |s0 AS MATERIALIZED (
       |  SELECT id AS node, CAST(0 AS BIGINT) AS dist FROM ids
       |  WHERE id % 97 = 0),
       |$rounds
       |SELECT node, dist FROM s4 ORDER BY node""".stripMargin
  }

  /** 4 unrolled Bellman-Ford rounds: d{k} = min over (keep prior
    * best, any 1-edge relaxation of round k-1). MATERIALIZED on every
    * multiply-referenced CTE (10x rule). */
  private lazy val ssspSql: String = {
    val rounds = (1 to 4).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT node, MIN(best) AS best FROM (
         |    SELECT node, best FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.y AS node, d.best + ABS(e.x - e.y) AS best
         |    FROM edges e JOIN d${k - 1} d ON d.node = e.x)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $deltaEdgesSql,
       |d0 AS MATERIALIZED (
       |  SELECT id AS node, CAST(0 AS BIGINT) AS best FROM ids
       |  WHERE id % 97 = 0),
       |$rounds
       |SELECT node, best FROM d4 ORDER BY node""".stripMargin
  }

  /** N unrolled peel rounds: d{k} = surviving-subgraph degrees,
    * s{k} = nodes with deg >= 8. MATERIALIZED per the 10x rule.
    * Shared by the bounded face (n=3) and the converged face
    * (n=KcoreRounds — exact because peel rounds at the fixpoint are
    * no-ops; see [[kcoreConvergedRun]]). */
  private def kcoreSqlN(n: Int): String = {
    val rounds = (1 to n).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT e.x AS node, COUNT(*) AS deg
         |  FROM edges e
         |  JOIN s${k - 1} a ON a.node = e.x
         |  JOIN s${k - 1} b ON b.node = e.y
         |  GROUP BY e.x),
         |s$k AS MATERIALIZED (SELECT node FROM d$k WHERE deg >= 8)""".stripMargin
    }.mkString(",\n")
    s"""WITH $deltaEdgesSql,
       |s0 AS MATERIALIZED (SELECT id AS node FROM ids),
       |$rounds
       |SELECT node, deg FROM d$n WHERE deg >= 8 ORDER BY node""".stripMargin
  }
  private lazy val kcoreSql: String = kcoreSqlN(3)

  /** [[qGraphPagerankConverged]]'s oracle: exactly [[PrRounds]]
    * unrolled damped-walk rounds at unit [[PrUnit]] over the bipartite
    * graph — exact vs the engine's orbit-stopped loop because the
    * engine only stops on an iteration of PrRounds' parity once the
    * state is in its period-2 orbit (post-orbit rounds alternate the
    * same two states), and the backstop case runs PrRounds on both
    * sides. MATERIALIZED per the 10x rule — and because a 24-deep
    * inlined round expression would otherwise explode the plan. */
  private lazy val pagerankConvergedSql: String = {
    val base = 15L * PrUnit / 100L
    val damp = 85L * PrUnit / 100L
    def iter(n: Int): String =
      s"""c$n AS MATERIALIZED (
         |  SELECT e.dst AS node, SUM(r${n - 1}.rank_ppm // d.deg) AS inc
         |  FROM edges e
         |  JOIN r${n - 1} ON r${n - 1}.node = e.src
         |  JOIN deg d ON d.node = e.src
         |  GROUP BY e.dst),
         |r$n AS MATERIALIZED (
         |  SELECT nodes.node,
         |    $base + ($damp * COALESCE(c$n.inc, 0)) // $PrUnit AS rank_ppm
         |  FROM nodes LEFT JOIN c$n ON nodes.node = c$n.node)""".stripMargin
    val rounds = (1 to PrRounds).map(iter).mkString(",\n")
    s"""WITH ed AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM ed
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM ed),
       |deg AS MATERIALIZED (
       |  SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |r0 AS MATERIALIZED (SELECT node, $PrUnit AS rank_ppm FROM nodes),
       |$rounds
       |SELECT node, CAST(rank_ppm AS BIGINT) AS rank_cu
       |FROM r$PrRounds ORDER BY node""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_graph_pagerank_converged" -> pagerankConvergedSql,
    "q_graph_link_predict" ->
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |capped AS (
         |  SELECT c, sp FROM (
         |    SELECT c, sp,
         |      ROW_NUMBER() OVER (PARTITION BY c ORDER BY sp) AS rn
         |    FROM e) WHERE rn <= $LinkDegCap),
         |deg AS (SELECT c, COUNT(*) AS d FROM capped GROUP BY c),
         |w AS (
         |  SELECT capped.c, sp, 1000000 // d AS w
         |  FROM capped JOIN deg ON capped.c = deg.c)
         |SELECT a.sp AS s1, b.sp AS s2,
         |  CAST(SUM(a.w) AS BIGINT) AS score_ppm,
         |  CAST(COUNT(*) AS BIGINT) AS n_common
         |FROM w a JOIN w b ON a.c = b.c AND a.sp < b.sp
         |GROUP BY a.sp, b.sp
         |ORDER BY score_ppm DESC, s1 ASC, s2 ASC LIMIT 20""".stripMargin,
    "q_graph_kcore_converged" -> kcoreConvergedSql,
    "q_graph_communities_converged" -> communitiesConvergedSql,
    "q_graph_kcore" -> kcoreSql,
    "q_graph_sssp" -> ssspSql,
    "q_graph_bfs" -> bfsSql,
    "q_graph_communities" -> communitiesSql,
    "q_graph_pagerank" -> {
      def iter(prev: String, n: Int): String =
        s"""c$n AS (
           |  SELECT e.dst AS node, SUM($prev.rank_ppm // d.deg) AS inc
           |  FROM edges e
           |  JOIN $prev ON $prev.node = e.src
           |  JOIN deg d ON d.node = e.src
           |  GROUP BY e.dst),
           |r$n AS (
           |  SELECT nodes.node,
           |    150000 + (850000 * COALESCE(c$n.inc, 0)) // 1000000 AS rank_ppm
           |  FROM nodes LEFT JOIN c$n ON nodes.node = c$n.node)""".stripMargin
      s"""WITH ed AS (
         |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |edges AS (
         |  SELECT a AS src, b AS dst FROM ed
         |  UNION ALL
         |  SELECT b AS src, a AS dst FROM ed),
         |deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |r0 AS (SELECT node, 1000000 AS rank_ppm FROM nodes),
         |${iter("r0", 1)},
         |${iter("r1", 2)},
         |${iter("r2", 3)}
         |SELECT node, CAST(rank_ppm AS BIGINT) AS rank_ppm
         |FROM r3 ORDER BY node""".stripMargin
    },
    "q_graph_triangles" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents),
        |e AS (
        |  SELECT a.id AS a, a.id + dd.d AS b
        |  FROM ids a JOIN (VALUES (1), (2), (3), (5), (8)) AS dd(d) ON TRUE
        |  JOIN ids x ON x.id = a.id + dd.d),
        |-- id-oriented triple join (a<b<c): same count as the engine's
        |-- degree-oriented plan - orientation changes join sizes, not
        |-- the triangles
        |t AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1
        |  JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT CAST(y - x AS BIGINT) AS d1, CAST(z - y AS BIGINT) AS d2,
        |  COUNT(*) AS n
        |FROM t GROUP BY 1, 2 ORDER BY d1, d2""".stripMargin,
  )
}
