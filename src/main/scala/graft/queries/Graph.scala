package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    var rank = nodes.withColumn("rank_ppm", lit(1000000L))
      .localCheckpoint(true)
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(rank, col("src") === col("node"))
        .join(deg, "src")
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
      rank = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          expr("150000L + (850000L * coalesce(inc, CAST(0 AS DECIMAL(38,0))))" +
            " div 1000000L").as("rank_ppm"))
        .localCheckpoint(true)
    }
    rank.orderBy("node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> (qGraphPagerank _),
  )

  val oracle: Map[String, String] = Map(
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
  )
}
