package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.Det._
import graft.sql.{DetSql => D}

/** Join operators (SURVEY.md §2.B "Joins").
  * Reference analog: the prediction/evaluation path joins test cells
  * with per-entity latent factors (test ⨝ U ⨝ V, BPMF §4), and the
  * Gibbs sweep gathers "cells of entity i" — a co-partitioned join of
  * COO data with factor tables. Small dimension sides (region/nation,
  * hyperparameter tables) are broadcast; big-big joins shuffle on the
  * equi key and AQE picks the physical strategy. */
object Joins {

  def qJoinInner(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("c_mktsegment")
  }

  /** Explicit broadcast hint — at 100 TB the 5-row region dim must
    * never shuffle the probe side. */
  def qJoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select("n_nationkey", "n_name", "r_name")
      .orderBy("n_nationkey")
  }

  /** TPC-H Q5 shape: revenue per nation through a 5-table join chain. */
  def qJoinMultiway(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    val discPrice = (dec(col("l_extendedprice")) *
      (dec(lit(1)) - dec(col("l_discount")))).cast(DecT)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(discPrice).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  def qJoinLeft(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
           count(col("o_orderkey")).as("n_matched"),
           sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_no_order"))
      .orderBy("c_mktsegment")
  }

  /** RIGHT outer join — the mirror API surface of [[qJoinLeft]] with
    * the preserved side swapped (orders keep their row even without a
    * matching BUILDING-segment customer). Spark plans it as the same
    * hash join with the build side flipped. */
  def qJoinRight(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "right")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
           count(col("c_custkey")).as("n_matched"),
           sum(when(col("c_custkey").isNull, 1).otherwise(0)).as("n_unmatched"))
      .orderBy("o_orderpriority")
  }

  def qJoinFull(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey").as("ck")).distinct()
    val o = Tables.orders(s, dir).select(col("o_custkey").as("ok")).distinct()
    c.join(o, c("ck") === o("ok"), "full")
      .select(coalesce(col("ck"), col("ok")).as("custkey"),
              col("ck").isNotNull.cast("int").as("has_cust"),
              col("ok").isNotNull.cast("int").as("has_order"))
      .orderBy("custkey")
  }

  def qJoinSemi(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  def qJoinAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  def qJoinCross(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")

  /** Equi key + theta residual: intra-order lineitem pairs. */
  def qJoinThetaRange(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val a = l.select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln1"),
                     col("l_quantity").as("q1"))
    val b = l.select(col("l_orderkey").as("ok2"), col("l_linenumber").as("ln2"),
                     col("l_quantity").as("q2"))
    a.join(b, a("ok") === b("ok2") && a("ln1") < b("ln2"))
      .groupBy("ok")
      .agg(count(lit(1)).as("n_pairs"),
           sum(dec(col("q1")) + dec(col("q2"))).cast("double").as("sum_q"))
      .orderBy("ok")
  }

  /** As-of join: for each purchase, the most recent strictly-earlier
    * view by the same user. Spark lacks a built-in as-of join; a RANGE
    * frame ending at -1 over epoch-micros gives exactly "strictly
    * earlier", distributed per user partition (no driver loop). */
  def qJoinAsof(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tsu"))
    val w = Window.partitionBy("user_id").orderBy("tsu")
      .rangeBetween(Window.unboundedPreceding, -1)
    e.withColumn("prior_view_tsu",
        max(when(col("event_type") === "view", col("tsu"))).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "tsu", "prior_view_tsu")
      .orderBy("event_id")
  }

  /** As-of join, direction = NEAREST (the pandas merge_asof
    * 'nearest' face; [[qJoinAsof]] is direction='backward'): each
    * purchase matches the closest view of the same user in EITHER
    * time direction — min |Δt|, ties to the earlier side. One
    * partitioned pass with two range-frame windows (strictly-prior
    * max + strictly-next min of view timestamps), then pure integer
    * comparison — no self-join, no explode; per-user partitions scale
    * like every window in the suite. Same-microsecond views are
    * excluded on both sides (frames end at ±1), identically in the
    * oracle. */
  def qJoinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tsu"))
    val wp = Window.partitionBy("user_id").orderBy("tsu")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy("user_id").orderBy("tsu")
      .rangeBetween(1, Window.unboundedFollowing)
    val viewTs = when(col("event_type") === "view", col("tsu"))
    e.withColumn("prior_v", max(viewTs).over(wp))
      .withColumn("next_v", min(viewTs).over(wn))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tsu"),
        when(col("prior_v").isNull, col("next_v"))
          .when(col("next_v").isNull, col("prior_v"))
          .when(col("tsu") - col("prior_v") <= col("next_v") - col("tsu"),
            col("prior_v"))
          .otherwise(col("next_v")).as("near_view_tsu"))
      .withColumn("d_abs", abs(col("tsu") - col("near_view_tsu")))
      .orderBy("event_id")
  }

  /** TPC-H Q5 — the canonical 6-table join-ordering benchmark, run
    * verbatim on the star schema: revenue per nation for ASIA-region
    * customers served by LOCAL suppliers (c_nationkey = s_nationkey)
    * over one order year. What the optimizer must get right, and
    * PlanSpec pins: the four dimension sides (supplier, customer,
    * nation, region) BROADCAST (at 100 TB only lineitem⨝orders may
    * shuffle), the o_orderdate predicate pushes into the orders scan,
    * and every scan prunes to its join/aggregate columns. Revenue is
    * the exact-decimal discipline (dsum) so the 5-row answer is
    * hash-comparable. */
  def qJoinTpchQ5(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(s, dir)
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
              col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)
              .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, dir)
              .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey") &&
              col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum((dec(col("l_extendedprice")) *
               (dec(lit(1)) - dec(col("l_discount")))).cast(DecT)), 2)
             .cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** TPC-H Q3 (shipping priority) — the second canonical optimizer
    * stressor next to [[qJoinTpchQ5]]: top-10 not-yet-shipped orders of
    * one market segment by revenue. The plan families it pins that Q5
    * does not: BOTH date predicates push into DIFFERENT fact scans
    * (o_orderdate < cutoff into orders, l_shipdate > cutoff into
    * lineitem — at 100 TB each prunes its own scan's row groups), the
    * segment-filtered customer side broadcasts, and the final top-10
    * over a large grouped aggregate must plan as
    * TakeOrderedAndProject (per-partition top-k, 10 rows to the
    * driver), never a global sort — PlanSpec pins all three. Revenue
    * is the exact-decimal discipline, cents-rounded export; the
    * orderkey tiebreak makes the top-10 total-ordered. The cutoff sits
    * mid-corpus (the fixture's order dates span 1995-2001) so both
    * predicates are genuinely selective. */
  def qJoinTpchQ3(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
              col("o_orderpriority"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum((dec(col("l_extendedprice")) *
               (dec(lit(1)) - dec(col("l_discount")))).cast(DecT)), 2)
             .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
              unix_timestamp(col("o_orderdate")).as("o_date_s"),
              col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_date_s").asc,
               col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q18 (large-volume customers) — the third optimizer pin: who
    * placed the orders whose total quantity exceeds 300 units. The
    * plan family it stresses is the SEMI-JOIN-ON-AGGREGATE shape (the
    * HAVING subquery): lineitem partial-aggregates per order map-side
    * FIRST, the >300 filter collapses that to a tiny heavy-order set
    * (selectivity ~0.3% of orders at every fixture scale — the filter
    * does the work, so the subsequent joins run on the survivors, not
    * the corpus), and the result re-joins orders and customer. AQE
    * picks broadcast for the filtered agg at fixture scale; at 100 TB
    * the heavy set still grows only linearly-with-corpus at 0.3%
    * density, so the join stays shuffle-on-orderkey with a tiny side.
    * Final top-100 is TakeOrderedAndProject (PlanSpec). Quantity sums
    * exact-decimal end-to-end; the >300 test compares decimals, never
    * doubles. */
  def qJoinTpchQ18(s: SparkSession, dir: String): DataFrame = {
    val heavy = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(dsumDec(col("l_quantity")).as("qdec"))
      .filter(col("qdec") > lit(300).cast(DecT))
      .select(col("l_orderkey"),
              round(col("qdec"), 2).cast("double").as("sum_qty"))
    Tables.orders(s, dir)
      .join(heavy, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
            col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
              unix_timestamp(col("o_orderdate")).as("o_date_s"),
              col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q10 (returned-item reporting) — the fourth optimizer pin:
    * top-20 customers by revenue lost to returned items in one
    * quarter. The plan family beyond Q3/Q5/Q18: TWO selective
    * predicates on DIFFERENT fact scans (the o_orderdate quarter into
    * orders, the l_returnflag = 'R' equality into lineitem — each
    * prunes its own row groups at 100 TB), a WIDE grouping key
    * (custkey + three carried attributes), the nation dim broadcast,
    * and the top-20 over ~customer-cardinality groups as
    * TakeOrderedAndProject — all PlanSpec-pinned. Exact-decimal
    * revenue, custkey tiebreak. */
  def qJoinTpchQ10(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir)
              .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
                      col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)
              .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
               col("n_name"))
      .agg(round(sum((dec(col("l_extendedprice")) *
               (dec(lit(1)) - dec(col("l_discount")))).cast(DecT)), 2)
             .cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q21 (suppliers who kept orders waiting) — the fifth
    * optimizer pin, and the one plan family Q3/Q5/Q10/Q18 don't touch:
    * DEPENDENT SEMI- AND ANTI-JOINS over a MULTI-REFERENCE fact. A
    * finished-order lineitem is "late" when it shipped > 365 days
    * after the order date (the fixture has no commit/receipt dates;
    * the 365-day lag marks ~37% of finished-order lines, so both
    * branches stay selective). The answer: per supplier of one
    * nation, how many of its late lines sit in multi-supplier orders
    * where it was the ONLY late supplier — EXISTS(other supplier on
    * the order) AND NOT EXISTS(other LATE supplier on the order).
    *
    * Plan shape pinned by PlanSpec: the `lo` (lineitem⨝F-orders +
    * late flag) stream is referenced three times (probe l1, semi l2,
    * anti l3); the semi and anti plan as equi-joins ON l_orderkey
    * with the suppkey inequality as a RESIDUAL condition — never a
    * cartesian/nested-loop (the non-equi part must not become the
    * join key); supplier and nation broadcast. At 100 TB: the nation
    * filter shrinks l1 to ~1/25 of late lines BEFORE the semi/anti
    * shuffles, all three references shuffle on the same l_orderkey
    * key (one exchange family, AQE-reusable), and the non-equi
    * residual evaluates per co-partitioned group — the all-pairs
    * work is bounded by lines-per-order (≤13 in the fixture, ~7 in
    * TPC-H), never corpus². Count is row-level (one per qualifying
    * late line), matching the textbook EXISTS semantics. */
  def qJoinTpchQ21(s: SparkSession, dir: String): DataFrame = {
    val lo = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(Tables.orders(s, dir)
              .filter(col("o_orderstatus") === "F")
              .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
              (col("l_shipdate") >
                col("o_orderdate") + expr("INTERVAL 365 DAYS")).as("late"))
    // l1 narrows to the probed nation's suppliers FIRST — the semi and
    // anti joins then run on the survivors, not the corpus
    val l1 = lo.filter(col("late"))
      .join(broadcast(Tables.supplier(s, dir)
              .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
              .filter(col("n_name") === "NATION_18")
              .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
    val l2 = lo.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val l3 = lo.filter(col("late"))
      .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    l1
      .join(l2, col("l_orderkey") === col("ok2") &&
                  col("l_suppkey") =!= col("sk2"), "left_semi")
      .join(l3, col("l_orderkey") === col("ok3") &&
                  col("l_suppkey") =!= col("sk3"), "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(100)
  }

  /** TPC-H Q17 (small-quantity-order revenue) — the sixth optimizer
    * pin: the CORRELATED SCALAR-AGG SUBQUERY family (revenue from
    * lines whose quantity is below 20% of that part's average). The
    * Spark side is written as the DECORRELATED plan the optimizer
    * must reach — per-part sum/count aggregated ONCE (partial map-side,
    * PlanSpec-pinned) and equi-joined back, never a per-row re-scan of
    * lineitem — because the exactness discipline forbids the division
    * the correlated form implies: `qty < 0.2·avg` is evaluated as the
    * cross-multiplied `5·qty·cnt < sum` in exact DECIMAL (integer
    * quantities, so the boundary is exact in both engines; a
    * double `sum/cnt` could flip a tie ulp). The ORACLE stays the
    * textbook correlated subquery (cross-multiplied inside), so the
    * equivalence of the two formulations is what the hash check
    * proves. Grouped by brand (25 groups) for a multi-row answer.
    * At 100 TB: the per-part agg shuffles (partkey, partial) pairs
    * only; the agg side is parts-cardinality (≪ lineitem) and AQE
    * picks broadcast when it fits; part is broadcast by hint. */
  def qJoinTpchQ17(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val pavg = li.groupBy(col("l_partkey"))
      .agg(dsumDec(col("l_quantity")).as("sq"), count(lit(1)).as("cq"))
      .select(col("l_partkey").as("pk"), col("sq"), col("cq"))
    li.join(pavg, col("l_partkey") === col("pk"))
      .filter(dec(col("l_quantity")) * lit(5) * col("cq") < col("sq"))
      .join(broadcast(Tables.part(s, dir)
              .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q20 (excess-stock suppliers) — the eighth optimizer pin:
    * the NESTED SEMI-JOIN CHAIN family (IN inside IN with a
    * correlated scalar agg at the bottom). Adapted to the fixture
    * (no partsupp): a supplier qualifies if it ships some PROMO part
    * for which MORE than half of that (part, supplier)'s total
    * shipped quantity went out in 1996 — the availqty-vs-half-demand
    * comparison re-expressed over the derived per-pair aggregate. The
    * ORACLE is the textbook nesting: region suppliers IN (pairs whose
    * 1996 sum beats the CORRELATED all-time sum, pk IN promo parts).
    * The Spark side is the decorrelated plan: ONE lineitem pass
    * computes BOTH sums per (part, supplier) (conditional sum — the
    * correlated subquery and its outer aggregate fold into one
    * grouped pass), the promo filter broadcasts into it, and the
    * supplier chain resolves as a left-semi on the distinct
    * qualifying suppkeys — never a per-pair re-scan. Quantities are
    * integral; both sums run in exact DECIMAL so the 2x boundary can
    * never flip on a ulp. */
  def qJoinTpchQ20(s: SparkSession, dir: String): DataFrame = {
    val perPS = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
              col("l_shipdate"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsumDec(col("l_quantity")).as("total_q"),
           dsumDec(when(expr("year(l_shipdate) = 1996"), col("l_quantity"))
                     .otherwise(lit(0))).as("q96"))
    val promo = Tables.part(s, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val qualifying = perPS
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .filter(col("q96") * 2 > col("total_q"))
      .select(col("l_suppkey")).distinct()
    // the qualifying key set is bounded by supplier CARDINALITY
    // (distinct suppkeys), which is SF-PROPORTIONAL — not a fixed dim
    // like nation/region: ~10k keys per SF unit, so the broadcast is
    // ~80 KB at SF 1 and still only ~80 MB of longs at SF 1000; past
    // that a size-gated hint or the runtime Bloom filter is the right
    // tool (round-18 advice item). It sits behind a grouped aggregate
    // whose size the planner cannot estimate, so the semi join planned
    // as SortMergeJoin (exchange + sort on BOTH sides). The explicit
    // broadcast is the textbook Q20 plan: semi join as a broadcast
    // hash probe, zero supplier-side shuffle (guide §3.1 — round-18;
    // SMJ LeftSemi → BroadcastHashJoin LeftSemi).
    Tables.supplier(s, dir)
      .join(broadcast(qualifying), col("s_suppkey") === col("l_suppkey"),
            "left_semi")
      .join(broadcast(Tables.nation(s, dir)
              .join(broadcast(Tables.region(s, dir)
                      .filter(col("r_name") === "EUROPE")
                      .select(col("r_regionkey"))),
                    col("n_regionkey") === col("r_regionkey"))
              .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q22 (global-sales-opportunity) — the ninth optimizer pin:
    * the ANTI-JOIN + SCALAR-AVG-OVER-A-SUBSTRING-KEY family. The
    * fixture customer has no phone, so the country code is the tens
    * digit of the zero-padded key inside c_name (a real substring
    * computation on both engines). A customer counts when (a) its
    * code is in the 7-code set, (b) its balance beats the positive-
    * balance average within that set — evaluated CROSS-MULTIPLIED in
    * exact DECIMAL (bal·cnt > sum) because a float average could
    * flip a boundary ulp; the (sum, cnt) pair rides a broadcast
    * 1-row aggregate, the sanctioned scalar-subquery shape — and
    * (c) it has NO order since 2000 (the dormant-customer anti-join;
    * the fixture's every customer has SOME order, so the textbook
    * no-orders-at-all form would be vacuously empty). Output is the
    * per-code count + exact balance sum. At 100 TB: customer scans
    * twice (stats + main — both dim-sized), orders scans once with
    * the year predicate pushed, the anti join is an equi hash join,
    * and the final group-by has 7 groups. */
  def qJoinTpchQ22(s: SparkSession, dir: String): DataFrame = {
    val codes = Seq("1", "2", "3", "4", "5", "6", "7")
    val code = expr("substring(c_name, length(c_name) - 1, 1)")
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), code.as("cntrycode"), col("c_acctbal"))
      .filter(col("cntrycode").isin(codes: _*))
    val stats = cust.filter(col("c_acctbal") > 0)
      .agg(dsumDec(col("c_acctbal")).as("sbal"), count(lit(1)).as("cbal"))
    val recent = Tables.orders(s, dir)
      .filter(expr("year(o_orderdate) >= 2000"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(stats))
      .filter(dec(col("c_acctbal")) * col("cbal") > col("sbal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("cntrycode")
  }

  /** TPC-H Q13 (customer order-count distribution) — the eleventh
    * optimizer pin: the DOUBLE-AGGREGATION family (GROUP BY over the
    * result of a GROUP BY) on a null-preserving outer join: per
    * customer, count the non-excluded orders THROUGH a left join
    * whose filter lives in the JOIN CONDITION (an o-side filter in
    * WHERE would silently turn the outer join inner and drop the
    * zero-order customers — the classic Q13 trap, which is exactly
    * what the count(o_orderkey)-counts-matches semantics and the
    * oracle both encode); then the distribution of those counts.
    * Plan shape: orders filter pushes to its scan, the join shuffles
    * on custkey (both sides customer-cardinality after the first
    * agg), the SECOND aggregate re-shuffles only (c_count) pairs —
    * customer-cardinality rows into a ~tens-of-groups key space with
    * map-side partials. (custdist DESC, c_count DESC) is a total
    * order, so the output is hash-stable without a limit. */
  def qJoinTpchQ13(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q19 (discounted revenue over disjunctive predicates) — the
    * tenth optimizer pin: the DISJUNCTION-OF-CONJUNCTIVE-RANGES
    * family. The query is written the textbook way — ONE three-branch
    * OR mixing part columns (brand, size) and lineitem columns
    * (quantity) applied AFTER the join — and what the pin tests is
    * that the optimizer DERIVES the single-side implications and
    * pushes them into both scans (Spark's
    * PushExtraPredicateThroughJoin / extractPredicatesWithinOutputSet):
    * the quantity-range OR reaches the lineitem scan and the
    * brand/size OR reaches the part scan, so at 100 TB the fact scan
    * skips row groups on the quantity ranges instead of reading
    * everything into the join. Revenue per brand in the exact-decimal
    * discipline (DECIMAL product, cents-rounded export). */
  def qJoinTpchQ19(s: SparkSession, dir: String): DataFrame = {
    val disjunction =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
         col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 25) &&
         col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 35) &&
         col("l_quantity").between(20, 30))
    val discPrice = (dec(col("l_extendedprice")) *
      (dec(lit(1)) - dec(col("l_discount")))).cast(DecT)
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"))
      .join(broadcast(Tables.part(s, dir)
              .select(col("p_partkey"), col("p_brand"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
      .filter(disjunction)
      .groupBy(col("p_brand"))
      .agg(round(sum(discPrice), 2).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** TPC-H Q2 (region-minimum-cost supplier) — the seventh optimizer
    * pin: the CORRELATED MIN SUBQUERY OVER A MULTI-DIM JOIN family
    * (for each qualifying part, the supplier(s) in one region whose
    * offer matches the region's minimum cost for that part). The
    * fixture has no partsupp table, so the supply-offer relation is
    * derived — min(l_extendedprice) per (part, supplier) — which
    * keeps the decorrelation shape intact while adding a second
    * level: the correlated subquery ranges over an AGGREGATE, not a
    * base table. The Spark side is the decorrelated plan the
    * optimizer must reach: ONE lineitem pass builds the offer
    * aggregate; the supplier→nation→region dim chain broadcasts into
    * it; the per-part region minimum is a second aggregate over the
    * (already offer-sized) result joined back on (partkey, cost) —
    * never a per-part re-scan of lineitem. The regional offer set
    * feeds two consumers (the min and the equality join), so it is
    * materialized once (localCheckpoint; persist on a cluster). The
    * ORACLE stays the textbook correlated form — `cost = (SELECT
    * MIN ...)` re-correlated per part — so the hash check proves the
    * two formulations equivalent. Cost equality is EXACT: min picks a
    * stored double, both engines compare identical bit patterns — no
    * derived arithmetic crosses the comparison. Deterministic output:
    * (p_partkey, s_name) is unique per row (one offer per pair), so
    * ORDER BY it makes the LIMIT 100 hash-stable. */
  def qJoinTpchQ2(s: SparkSession, dir: String): DataFrame = {
    val rsup = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
              .join(broadcast(Tables.region(s, dir)
                      .filter(col("r_name") === "EUROPE")
                      .select(col("r_regionkey"))),
                    col("n_regionkey") === col("r_regionkey"))
              .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val pf = Tables.part(s, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") >= 25)
      .select(col("p_partkey"), col("p_name"))
    // ONE fact pass: the per-(part, supplier) offer aggregate —
    // partial map-side on (partkey, suppkey), offers-cardinality
    // (≪ lineitem) on the wire
    val offers = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice")).as("cost"))
    // part + region filters applied BEFORE the min: correlation is
    // per-part and the region restriction is part of the subquery, so
    // pre-filtering drops whole part groups without changing any
    // surviving part's minimum
    val regional = offers
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(rsup), col("l_suppkey") === col("s_suppkey"))
      .localCheckpoint(true)
    val minCost = regional.groupBy(col("p_partkey").as("mpk"))
      .agg(min(col("cost")).as("min_cost"))
    regional
      .join(minCost, col("p_partkey") === col("mpk") &&
                       col("cost") === col("min_cost"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
              col("s_acctbal"), col("cost"))
      .orderBy(col("p_partkey"), col("s_name"))
      .limit(100)
  }

  /** TPC-H Q7 (volume shipping) — the MULTI-FACT NATION-PAIR family
    * (round-17 verdict item 4): revenue shipped between two specific
    * nations over two years, by (supplier nation, customer nation,
    * ship year). The optimizer problem is that the nation predicate
    * reaches the fact through TWO DIFFERENT dimension paths (supplier
    * side and customer-via-orders side), and the naive plan joins
    * 25×25 nation pairs before filtering. The right 100 TB plan —
    * what this spelling forces and PlanSpec pins — reduces EACH dim
    * chain to the two selected nations FIRST (nation→supplier and
    * nation→customer both collapse to ~2/25 of their members),
    * broadcasts both reduced dims, prunes the fact scan with the
    * pushed l_shipdate range, and only then shuffles the one
    * unavoidable big-big join (pre-reduced lineitem ⨝ pre-reduced
    * orders). The asymmetric pair condition (supp ≠ cust over a
    * 2-nation domain = exactly the (A,B)/(B,A) combinations) applies
    * at the broadcast joins, never as a post-join 625-pair filter. */
  def qJoinTpchQ7(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val nat = Tables.nation(s, dir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.supplier(s, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cus = Tables.customer(s, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
              expr("CAST(year(l_shipdate) AS BIGINT)").as("l_year"),
              col("l_extendedprice"), col("l_discount"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(round(sum((dec(col("l_extendedprice")) *
               (dec(lit(1)) - dec(col("l_discount")))).cast(DecT)), 2)
             .cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q14 (promotion effect) — the SINGLE-SCAN
    * CONDITIONAL-AGGREGATE-RATIO family (round-17 verdict item 4):
    * what share of one year's revenue came from PROMO parts, by ship
    * month. The optimizer trap is computing numerator and denominator
    * as two scans (or a self-join); the right plan — pinned in
    * PlanSpec — is ONE pass over the date-pruned fact with the part
    * dim broadcast and BOTH sums as conditional aggregates of the
    * same scan. The ratio itself is exported as exact integer BASIS
    * POINTS via sub-cent (1e-4) integer units — the disc price has
    * exactly 4 decimal places (2dp price × 2dp discount), so
    * `pr × 10000` is integral and its BIGINT cast exact in both
    * engines; the division is decimal/HUGEINT floor division, never a
    * float (a rounded float ratio could diverge in the last ulp). */
  def qJoinTpchQ14(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(expr("CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)")
                .as("ship_ym"),
              col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val p = Tables.part(s, dir)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    val pr = (dec(col("l_extendedprice")) *
              (dec(lit(1)) - dec(col("l_discount")))).cast(DecT)
    val prE4 = (pr * lit(10000)).cast("long")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("ship_ym"))
      .agg(round(sum(when(col("is_promo"), pr)
                       .otherwise(dec(lit(0)).cast(DecT))), 2)
             .cast("double").as("promo_revenue"),
           round(sum(pr), 2).cast("double").as("total_revenue"),
           sum(when(col("is_promo"), prE4).otherwise(lit(0L))).as("pe4"),
           sum(prE4).as("te4"))
      .select(col("ship_ym"), col("promo_revenue"), col("total_revenue"),
              // DECIMAL(38,0) intermediates: pe4*10000 would overflow
              // BIGINT around the 100x clone's monthly sums
              expr("CAST(CAST(pe4 AS DECIMAL(38,0)) * 10000 div te4 AS BIGINT)")
                .as("promo_bp"))
      .orderBy("ship_ym")
  }

  /** TPC-H Q4 (order priority checking) — the EXISTS-ON-A-DATE-WINDOW
    * family: orders placed in one quarter that had at least one LATE
    * line, counted per priority. The fixture carries no commit/receipt
    * dates, so lateness is the same shipdate-vs-orderdate surrogate
    * [[qJoinTpchQ21]] uses (l_shipdate > o_orderdate + 60 days). The
    * plan family: EXISTS compiles to a LEFT SEMI join whose condition
    * mixes the equi key with a NON-EQUI residual comparing columns of
    * BOTH sides — the optimizer must keep the equi part as the hash
    * key and evaluate the date comparison as a join residual (a
    * nested-loop here would be quadratic); the quarter window pushes
    * into the orders scan. Semi means each order counts ONCE no
    * matter how many late lines. */
  def qJoinTpchQ4(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q8 (national market share) — the CASE-OVER-MULTI-FACT-JOIN
    * RATIO family: of the revenue ASIA-region customers spent on
    * ECONOMY parts in 1996-97, what share came from NATION_5's
    * suppliers, per order year. The plan problem is a 6-table star
    * where the ratio's numerator is a CASE over a DIMENSION attribute
    * (supplier nation) of the same join — one pass, conditional
    * aggregate, never two plans or a self-join. Dim chains reduce
    * before broadcasting (part→type filter, customer→ASIA via
    * nation+region); the one shuffle is lineitem ⨝ orders, both sides
    * pre-reduced by their broadcast dims. Share exported as exact
    * integer basis points via the same sub-cent units as
    * [[qJoinTpchQ14]]. */
  def qJoinTpchQ8(s: SparkSession, dir: String): DataFrame = {
    val asiaCust = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)
              .join(broadcast(Tables.region(s, dir)
                      .filter(col("r_name") === "ASIA")
                      .select(col("r_regionkey"))),
                    col("n_regionkey") === col("r_regionkey"))
              .select(col("n_nationkey"))),
            col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
              .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    val pf = Tables.part(s, dir)
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
              expr("CAST(year(o_orderdate) AS BIGINT)").as("o_year"))
      .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
    val pr = (dec(col("l_extendedprice")) *
              (dec(lit(1)) - dec(col("l_discount")))).cast(DecT)
    val prE4 = (pr * lit(10000)).cast("long")
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
              col("l_extendedprice"), col("l_discount"))
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_year"))
      .agg(round(sum(when(col("supp_nation") === "NATION_5", pr)
                       .otherwise(dec(lit(0)).cast(DecT))), 2)
             .cast("double").as("nation_revenue"),
           round(sum(pr), 2).cast("double").as("total_revenue"),
           sum(when(col("supp_nation") === "NATION_5", prE4)
                 .otherwise(lit(0L))).as("ne4"),
           sum(prE4).as("te4"))
      .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
              expr("CAST(CAST(ne4 AS DECIMAL(38,0)) * 10000 div te4 AS BIGINT)")
                .as("mkt_share_bp"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 (product-type profit) — the EXPRESSION-AGGREGATE STAR
    * family: per (supplier nation, order year), the profit on parts
    * whose name matches a pattern, where profit mixes FACT columns
    * with a DIMENSION column in one expression
    * (disc price − retailprice·quantity; the fixture has no partsupp,
    * so p_retailprice stands in for ps_supplycost — same expression
    * shape, same join graph minus one table). Plan: the pattern
    * filter reduces part BEFORE its broadcast (a LIKE never reaches
    * the fact scan, but it guts the build side), supplier/nation
    * broadcast, and the one shuffle is lineitem ⨝ orders — the
    * year column is the only thing orders contributes. All decimal
    * arithmetic exact (2dp × integral quantity). */
  def qJoinTpchQ9(s: SparkSession, dir: String): DataFrame = {
    val pf = Tables.part(s, dir)
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val supN = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
              .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"),
              expr("CAST(year(o_orderdate) AS BIGINT)").as("o_year"))
    val profit = ((dec(col("l_extendedprice")) *
                   (dec(lit(1)) - dec(col("l_discount")))).cast(DecT) -
                  (dec(col("p_retailprice")) * dec(col("l_quantity")))
                    .cast(DecT)).cast(DecT)
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
              col("l_extendedprice"), col("l_discount"), col("l_quantity"))
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(round(sum(profit), 2).cast("double").as("sum_profit"),
           count(lit(1)).as("n_lines"))
      .orderBy(col("n_name").asc, col("o_year").desc)
  }

  /** TPC-H Q12 (shipping priority classes) — the
    * UNION-OF-RANGES/CASE-AGGREGATE family: late lines shipped in one
    * year, split per line status (the fixture's shipmode surrogate)
    * into high-priority (URGENT/HIGH) vs other order counts. The plan
    * family: the CASE over the JOINED side's attribute aggregates in
    * the same pass as the join (never two scans), the ship-year range
    * pushes into the lineitem scan, and the late condition is a
    * cross-table residual on the equi join — same discipline as
    * [[qJoinTpchQ4]] but with the counts split by CASE instead of
    * gated by EXISTS. */
  def qJoinTpchQ12(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_shipdate"), col("l_linestatus"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(col("o_orderpriority") === "1-URGENT" ||
                    col("o_orderpriority") === "2-HIGH", 1L)
                 .otherwise(0L)).as("high_line_count"),
           sum(when(col("o_orderpriority") =!= "1-URGENT" &&
                    col("o_orderpriority") =!= "2-HIGH", 1L)
                 .otherwise(0L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q15 (top supplier) — the VIEW + SCALAR-AGGREGATE-SUBQUERY
    * family: revenue per supplier over one quarter (the revenue
    * "view"), then the supplier(s) achieving the GLOBAL MAX of that
    * view. The plan family: the view materializes once and feeds both
    * the scalar max and the final equality (Spark reuses the
    * aggregate subtree; the max side is a 1-row broadcast, so the
    * "subquery" costs one extra reduction, never a re-scan of the
    * fact), supplier broadcast-joins the one surviving row. The
    * equality compares EXACT DECIMALS (cents-rounding only at export)
    * — a double max-equality could mismatch its own source. Ties all
    * survive, ordered by suppkey (the TPC-H rule). */
  def qJoinTpchQ15(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum((dec(col("l_extendedprice")) *
                (dec(lit(1)) - dec(col("l_discount")))).cast(DecT))
             .as("rev_dec"))
      // the view feeds TWO consumers (the scalar max and the final
      // equality) — materialize it once so the fact is scanned once,
      // same discipline as Q2's `regional`
      .localCheckpoint(true)
    val top = rev.agg(max(col("rev_dec")).as("max_rev"))
    rev.join(broadcast(top), col("rev_dec") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, dir)
              .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
              round(col("rev_dec"), 2).cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16 (parts/supplier relationship) — the NOT-IN +
    * COUNT-DISTINCT family: how many distinct suppliers can deliver
    * each surviving (brand, type, size) combination, excluding one
    * brand, one type, a size whitelist, and a supplier DENYLIST via
    * NOT IN (suppliers in deficit — the fixture's complaints
    * surrogate, s_acctbal < 0). The part↔supplier relation is
    * lineitem's distinct (partkey, suppkey) pairs (no partsupp in the
    * fixture — same relation, observed rather than cataloged). Plan
    * family: NOT IN compiles to a LEFT ANTI join (broadcast — the
    * denylist is tiny), part filters reduce the broadcast build side,
    * and the count-distinct aggregates partially map-side after the
    * pair dedup. */
  def qJoinTpchQ16(s: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 5, 9, 13, 17, 21, 25, 29)
    val pf = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "PROMO" &&
              col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val deny = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(deny), col("l_suppkey") === col("s_suppkey"),
            "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
               col("p_type").asc, col("p_size").asc)
  }

  /** As-of join, direction = FORWARD (completing the pandas merge_asof
    * direction family: [[qJoinAsof]] backward, [[qJoinAsofNearest]]
    * nearest, this one forward): each purchase matches the same
    * user's EARLIEST strictly-later view — "did the buyer come back
    * to look again". Same one-pass window shape as the backward face
    * with the frame mirrored (min over (1, +inf)); per-user
    * partitions, epoch integers on the wire. */
  def qJoinAsofForward(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tsu"))
    val w = Window.partitionBy("user_id").orderBy("tsu")
      .rangeBetween(1, Window.unboundedFollowing)
    e.withColumn("next_view_tsu",
        min(when(col("event_type") === "view", col("tsu"))).over(w))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "tsu", "next_view_tsu")
      .orderBy("event_id")
  }

  /** As-of join with TOLERANCE (the pandas merge_asof `tolerance`
    * knob; [[qJoinAsof]] without it): each purchase matches the same
    * user's latest strictly-prior view ONLY if it is at most 10
    * minutes old — a stale match is reported as null (`matched` = 0),
    * which is what attribution windows demand. Same single
    * window-partitioned pass as the plain backward face (no
    * self-join, no explode — the tolerance is ONE integer comparison
    * on the window result), so the scale story is unchanged:
    * per-user partitions, id/epoch integers on the wire. */
  def qJoinAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val tolUs = 600000000L // 10 minutes
    val e = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tsu"))
    val w = Window.partitionBy("user_id").orderBy("tsu")
      .rangeBetween(Window.unboundedPreceding, -1)
    e.withColumn("prior_v",
        max(when(col("event_type") === "view", col("tsu"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tsu"),
        when(col("tsu") - col("prior_v") <= tolUs, col("prior_v"))
          .as("view_tsu_in_tol"),
        expr(s"CAST(tsu - prior_v <= ${tolUs}L AS INT)").as("matched"))
      .na.fill(0, Seq("matched"))
      .orderBy("event_id")
  }

  /** Interval/range join: follower events within 5 minutes, same user. */
  def qJoinInterval(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), unix_micros(col("ts")).as("tsu"))
    val a = e.select(col("event_id").as("aid"), col("user_id").as("auser"),
                     col("tsu").as("atsu"))
    val b = e.select(col("event_id").as("bid"), col("user_id").as("buser"),
                     col("tsu").as("btsu"))
    a.join(b, col("auser") === col("buser") && col("btsu") > col("atsu") &&
              col("btsu") <= col("atsu") + lit(300000000L))
      .groupBy(col("aid"))
      .agg(count(lit(1)).as("n_follow"), min(col("bid")).as("first_follow_id"))
      .orderBy("aid")
  }

  /** PURE range join — NO equi key anywhere: for each purchase, count
    * ALL events (any user) in the strictly-preceding 60 seconds. The
    * naive plan is a cartesian nested loop (N² at 100 TB); the scale
    * plan is the standard bucketed range join: hash every event to its
    * 60 s time bucket, probe each purchase against buckets {B, B-1}
    * (any event within 60 s lives in one of the two), equi-join on the
    * bucket, residual-filter the exact interval. Each event lands in
    * exactly one bucket, so probes never double-count. */
  def qJoinRangeBucketed(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val evb = e.select(unix_micros(col("ts")).as("vts"),
                       expr("unix_micros(ts) DIV 60000000").as("b"))
    val pb = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), unix_micros(col("ts")).as("pts"))
      .select(col("pid"), col("pts"),
              explode(array(expr("pts DIV 60000000"),
                            expr("pts DIV 60000000 - 1"))).as("b"))
    pb.join(evb, "b")
      .filter(col("vts") < col("pts") &&
              col("vts") >= col("pts") - lit(60000000L))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n_near"), max(col("vts")).as("last_near_tsu"))
      .orderBy("pid")
  }

  /** Skew-mitigated equi-join through [[graft.sql.Salt.saltedJoin]]:
    * lineitem's join key is salted over 8 buckets and the part side is
    * replicated once per bucket, so a hot part key spreads across 8
    * reducers instead of stalling one. Semantics identical to the plain
    * join (the oracle IS the plain join); SaltSpec holds the
    * equivalence, this row keeps the salting surface oracle-exercised. */
  def qJoinSkewSalted(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))
    graft.sql.Salt.saltedJoin(l, p, col("l_partkey"), col("p_partkey"), 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
           sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy("p_brand")
  }

  /** One bucketed-table write per (dir, table) per JVM: check-then-
    * write races between suites sharing the session are serialized. */
  private val bucketLock = new Object

  /** Register `df` as a catalog table bucketed into `buckets` by `key`
    * (sorted within buckets), writing it once per corpus directory.
    * `repartition(buckets, key)` first: Spark's bucket id and hash
    * partitioning share the same Murmur3 pmod, so each write task
    * holds exactly one bucket and every bucket lands in ONE file —
    * the layout bucketed-scan needs to also use the sort order.
    * The data lives under java.io.tmpdir (external table path); a
    * fresh session re-registers over the same path, mode=overwrite
    * keeps it consistent with the source. */
  private def bucketTable(s: SparkSession, dir: String, name: String,
                          df: DataFrame, key: String,
                          buckets: Int): String = bucketLock.synchronized {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val tbl = s"graft_${name}_$tag"
    if (!s.catalog.tableExists(tbl)) {
      df.repartition(buckets, col(key))
        .write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .option("path",
          s"${sys.props("java.io.tmpdir")}/graft_buckets/$tag/$name")
        .saveAsTable(tbl)
    }
    tbl
  }

  /** The bare co-located join over the bucketed tables — the plan
    * BucketJoinSpec pins: both sides pre-bucketed into 8 buckets on
    * the join key, so the sort-merge join reads bucket i of orders
    * against bucket i of customer with ZERO Exchange (and zero Sort:
    * one sorted file per bucket) on either side. The `merge` hint
    * keeps the physical strategy the one a 100 TB fact⨝fact join
    * gets — at fixture scale Spark would otherwise broadcast the
    * small side and the co-location would go unexercised. */
  private[queries] def bucketedOrdersCustomer(s: SparkSession,
                                              dir: String): DataFrame = {
    val ot = bucketTable(s, dir, "orders",
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey", 8)
    val ct = bucketTable(s, dir, "customer",
      Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
      "c_custkey", 8)
    s.table(ot).hint("merge")
      .join(s.table(ct), col("o_custkey") === col("c_custkey"))
  }

  /** Co-located BUCKETED join — the canonical 100 TB shuffle
    * elimination: both fact tables are written `bucketBy(8, join
    * key)` ONCE (the expensive shuffle is paid at layout time), and
    * every subsequent join on that key is exchange-free — bucket i
    * joins bucket i, no network. The only shuffle left in this plan
    * is the 5-row segment rollup AFTER the join. Values are identical
    * to the plain join (bucketing is layout, not semantics), which is
    * exactly what the oracle checks. */
  def qJoinBucketColocated(s: SparkSession, dir: String): DataFrame =
    bucketedOrdersCustomer(s, dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           dsum(col("o_totalprice")).as("sum_price"),
           max(col("o_totalprice")).as("max_price"))
      .orderBy("c_mktsegment")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_bucket_colocated" -> (qJoinBucketColocated _),
    "q_join_skew_salted" -> (qJoinSkewSalted _),
    "q_join_range_bucketed" -> (qJoinRangeBucketed _),
    "q_join_inner" -> (qJoinInner _),
    "q_join_broadcast" -> (qJoinBroadcast _),
    "q_join_multiway" -> (qJoinMultiway _),
    "q_join_left" -> (qJoinLeft _),
    "q_join_right" -> (qJoinRight _),
    "q_join_full" -> (qJoinFull _),
    "q_join_semi" -> (qJoinSemi _),
    "q_join_anti" -> (qJoinAnti _),
    "q_join_cross" -> (qJoinCross _),
    "q_join_theta_range" -> (qJoinThetaRange _),
    "q_join_asof" -> (qJoinAsof _),
    "q_join_asof_nearest" -> (qJoinAsofNearest _),
    "q_join_asof_tolerance" -> (qJoinAsofTolerance _),
    "q_join_asof_forward" -> (qJoinAsofForward _),
    "q_join_tpch_q5" -> (qJoinTpchQ5 _),
    "q_join_tpch_q3" -> (qJoinTpchQ3 _),
    "q_join_tpch_q10" -> (qJoinTpchQ10 _),
    "q_join_tpch_q18" -> (qJoinTpchQ18 _),
    "q_join_tpch_q21" -> (qJoinTpchQ21 _),
    "q_join_tpch_q17" -> (qJoinTpchQ17 _),
    "q_join_tpch_q2" -> (qJoinTpchQ2 _),
    "q_join_tpch_q20" -> (qJoinTpchQ20 _),
    "q_join_tpch_q22" -> (qJoinTpchQ22 _),
    "q_join_tpch_q19" -> (qJoinTpchQ19 _),
    "q_join_tpch_q7" -> (qJoinTpchQ7 _),
    "q_join_tpch_q14" -> (qJoinTpchQ14 _),
    "q_join_tpch_q4" -> (qJoinTpchQ4 _),
    "q_join_tpch_q8" -> (qJoinTpchQ8 _),
    "q_join_tpch_q9" -> (qJoinTpchQ9 _),
    "q_join_tpch_q12" -> (qJoinTpchQ12 _),
    "q_join_tpch_q15" -> (qJoinTpchQ15 _),
    "q_join_tpch_q16" -> (qJoinTpchQ16 _),
    "q_join_tpch_q13" -> (qJoinTpchQ13 _),
    "q_join_interval" -> (qJoinInterval _),
  )

  private val discPriceSql =
    s"CAST(${D.dec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")}) AS DECIMAL(18,6))"

  val oracle: Map[String, String] = Map(
    "q_join_bucket_colocated" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |  ${D.dsum("o_totalprice")} AS sum_price,
         |  MAX(o_totalprice) AS max_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_skew_salted" ->
      s"""SELECT p_brand, COUNT(*) AS n_items,
         |  ${D.dsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_inner" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n, ${D.dsum("o_totalprice")} AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "q_join_multiway" ->
      s"""SELECT n_name, CAST(SUM($discPriceSql) AS DOUBLE) AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_mktsegment, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_matched,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_order
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_right" ->
      """SELECT o_orderpriority, COUNT(*) AS n_rows, COUNT(c_custkey) AS n_matched,
        |  CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |FROM (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
        |RIGHT JOIN orders ON c_custkey = o_custkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_join_full" ->
      """SELECT COALESCE(ck, ok) AS custkey,
        |  CAST(ck IS NOT NULL AS INTEGER) AS has_cust,
        |  CAST(ok IS NOT NULL AS INTEGER) AS has_order
        |FROM (SELECT DISTINCT c_custkey AS ck FROM customer) c
        |FULL OUTER JOIN (SELECT DISTINCT o_custkey AS ok FROM orders) o
        |  ON c.ck = o.ok
        |ORDER BY custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_theta_range" ->
      s"""SELECT a.l_orderkey AS ok, COUNT(*) AS n_pairs,
         |  CAST(SUM(CAST(a.l_quantity AS DECIMAL(18,6)) + CAST(b.l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_q
         |FROM lineitem a JOIN lineitem b
         |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
         |GROUP BY a.l_orderkey ORDER BY ok""".stripMargin,
    "q_join_asof" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS tsu,
        |  (SELECT MAX(epoch_us(v.ts)) FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND epoch_us(v.ts) < epoch_us(p.ts)) AS prior_view_tsu
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "q_join_tpch_q5" -> {
      val discPrice =
        s"CAST(${D.dec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")}) AS DECIMAL(18,6))"
      s"""SELECT n_name,
         |  CAST(ROUND(SUM($discPrice), 2) AS DOUBLE) AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |              AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name ASC""".stripMargin
    },
    "q_join_tpch_q3" -> {
      val discPrice =
        s"CAST(${D.dec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")}) AS DECIMAL(18,6))"
      s"""SELECT l_orderkey,
         |  CAST(ROUND(SUM($discPrice), 2) AS DOUBLE) AS revenue,
         |  CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS o_date_s,
         |  o_orderpriority
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate  > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_date_s ASC, l_orderkey ASC
         |LIMIT 10""".stripMargin
    },
    "q_join_tpch_q10" -> {
      val discPrice =
        s"CAST(${D.dec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")}) AS DECIMAL(18,6))"
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST(ROUND(SUM($discPrice), 2) AS DOUBLE) AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate <  TIMESTAMP '1997-04-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey ASC
         |LIMIT 20""".stripMargin
    },
    "q_join_tpch_q18" ->
      s"""WITH heavy AS (
         |  SELECT l_orderkey, ${D.dsumDec("l_quantity")} AS qdec
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${D.dsumDec("l_quantity")} > CAST(300 AS DECIMAL(18,6)))
         |SELECT c_name, c_custkey, o_orderkey,
         |  CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS o_date_s,
         |  o_totalprice,
         |  CAST(ROUND(qdec, 2) AS DOUBLE) AS sum_qty
         |FROM heavy
         |JOIN orders   ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey ASC
         |LIMIT 100""".stripMargin,
    "q_join_tpch_q21" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |         (l_shipdate > o_orderdate + INTERVAL 365 DAY) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM lo l1
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_18' AND l1.late
        |  AND EXISTS (SELECT 1 FROM lo l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |              WHERE l3.l_orderkey = l1.l_orderkey
        |                AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 100""".stripMargin,
    "q_join_tpch_q17" ->
      s"""SELECT p_brand,
         |  CAST(COUNT(*) AS BIGINT) AS n_small,
         |  ${D.dsum("l1.l_extendedprice")} AS revenue
         |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
         |WHERE ${D.dec("l1.l_quantity")} * 5 * (
         |    SELECT COUNT(*) FROM lineitem l2
         |    WHERE l2.l_partkey = l1.l_partkey) < (
         |    SELECT SUM(${D.dec("l2.l_quantity")}) FROM lineitem l2
         |    WHERE l2.l_partkey = l1.l_partkey)
         |GROUP BY p_brand
         |ORDER BY p_brand""".stripMargin,
    "q_join_tpch_q13" ->
      """WITH co AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_join_tpch_q19" ->
      s"""SELECT p_brand,
         |  CAST(ROUND(SUM($discPriceSql), 2) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35
         |       AND l_quantity BETWEEN 20 AND 30)
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_join_tpch_q7" -> {
      val discPrice =
        s"CAST(${D.dec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")}) AS DECIMAL(18,6))"
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(ROUND(SUM($discPrice), 2) AS DOUBLE) AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
         |    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
         |  AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate <  TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
    },
    "q_join_tpch_q14" ->
      s"""WITH f AS (
         |  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
         |      AS ship_ym,
         |    (p_type = 'PROMO') AS is_promo,
         |    CAST(${D.dec("l_extendedprice")} *
         |         (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")})
         |         AS DECIMAL(18,6)) AS pr
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate <  TIMESTAMP '1997-01-01')
         |SELECT ship_ym,
         |  CAST(ROUND(SUM(CASE WHEN is_promo THEN pr
         |                      ELSE CAST(0 AS DECIMAL(18,6)) END), 2)
         |    AS DOUBLE) AS promo_revenue,
         |  CAST(ROUND(SUM(pr), 2) AS DOUBLE) AS total_revenue,
         |  CAST(CAST(SUM(CASE WHEN is_promo
         |                     THEN CAST(pr * 10000 AS BIGINT)
         |                     ELSE 0 END) AS HUGEINT) * 10000
         |       // SUM(CAST(pr * 10000 AS BIGINT)) AS BIGINT) AS promo_bp
         |FROM f GROUP BY 1 ORDER BY ship_ym""".stripMargin,
    "q_join_tpch_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    "q_join_tpch_q8" ->
      s"""WITH f AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    (sn.n_name = 'NATION_5') AS is_nat,
         |    CAST(${D.dec("l_extendedprice")} *
         |         (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")})
         |         AS DECIMAL(18,6)) AS pr
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation sn ON s_nationkey = sn.n_nationkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation cn ON c_nationkey = cn.n_nationkey
         |  JOIN region ON cn.n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate <  TIMESTAMP '1998-01-01')
         |SELECT o_year,
         |  CAST(ROUND(SUM(CASE WHEN is_nat THEN pr
         |                      ELSE CAST(0 AS DECIMAL(18,6)) END), 2)
         |    AS DOUBLE) AS nation_revenue,
         |  CAST(ROUND(SUM(pr), 2) AS DOUBLE) AS total_revenue,
         |  CAST(CAST(SUM(CASE WHEN is_nat
         |                     THEN CAST(pr * 10000 AS BIGINT)
         |                     ELSE 0 END) AS HUGEINT) * 10000
         |       // SUM(CAST(pr * 10000 AS BIGINT)) AS BIGINT) AS mkt_share_bp
         |FROM f GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q_join_tpch_q9" ->
      s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(ROUND(SUM(CAST(
         |    CAST(${D.dec("l_extendedprice")} *
         |      (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")})
         |      AS DECIMAL(18,6)) -
         |    CAST(${D.dec("p_retailprice")} * ${D.dec("l_quantity")}
         |      AS DECIMAL(18,6))
         |    AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2 ORDER BY n_name ASC, o_year DESC""".stripMargin,
    "q_join_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY l_linestatus""".stripMargin,
    "q_join_tpch_q15" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    SUM(CAST(${D.dec("l_extendedprice")} *
         |      (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")})
         |      AS DECIMAL(18,6))) AS rev_dec
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate <  TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name,
         |  CAST(ROUND(rev_dec, 2) AS DOUBLE) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q_join_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // textbook nesting: IN (pairs beating the CORRELATED all-time
    // sum, pk IN promo) — the engine folds both sums into one pass
    "q_join_tpch_q20" ->
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND s_suppkey IN (
        |    SELECT o.sk FROM (
        |      SELECT l_partkey AS pk, l_suppkey AS sk,
        |        SUM(CASE WHEN year(l_shipdate) = 1996
        |            THEN CAST(l_quantity AS DECIMAL(18,6)) ELSE 0 END) AS q96
        |      FROM lineitem GROUP BY 1, 2) o
        |    WHERE o.pk IN (SELECT p_partkey FROM part
        |                   WHERE p_type = 'PROMO')
        |      AND o.q96 * 2 > (
        |        SELECT SUM(CAST(l.l_quantity AS DECIMAL(18,6)))
        |        FROM lineitem l
        |        WHERE l.l_partkey = o.pk AND l.l_suppkey = o.sk))
        |ORDER BY s_suppkey""".stripMargin,
    // textbook scalar-avg (cross-multiplied in exact decimal) +
    // NOT EXISTS on the recent-orders anti condition
    "q_join_tpch_q22" ->
      s"""WITH c AS (
         |  SELECT c_custkey,
         |    SUBSTRING(c_name, LENGTH(c_name) - 1, 1) AS cntrycode,
         |    c_acctbal
         |  FROM customer
         |  WHERE SUBSTRING(c_name, LENGTH(c_name) - 1, 1)
         |    IN ('1', '2', '3', '4', '5', '6', '7'))
         |SELECT cntrycode, COUNT(*) AS numcust,
         |  ${D.dsum("c_acctbal")} AS totacctbal
         |FROM c
         |WHERE ${D.dec("c_acctbal")} * (
         |    SELECT COUNT(*) FROM c c2 WHERE c2.c_acctbal > 0) > (
         |    SELECT SUM(${D.dec("c2.c_acctbal")}) FROM c c2
         |    WHERE c2.c_acctbal > 0)
         |  AND NOT EXISTS (
         |    SELECT 1 FROM orders o
         |    WHERE o.o_custkey = c.c_custkey
         |      AND year(o.o_orderdate) >= 2000)
         |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
    "q_join_tpch_q2" ->
      """WITH offer AS MATERIALIZED (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    MIN(l_extendedprice) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |rsup AS MATERIALIZED (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT p_partkey, p_name, s_name, n_name, s_acctbal, cost
        |FROM part
        |JOIN offer o ON p_partkey = o.pk
        |JOIN rsup s ON s.s_suppkey = o.sk
        |WHERE p_type = 'STANDARD' AND p_size >= 25
        |  AND o.cost = (
        |    SELECT MIN(o2.cost)
        |    FROM offer o2 JOIN rsup s2 ON s2.s_suppkey = o2.sk
        |    WHERE o2.pk = p_partkey)
        |ORDER BY p_partkey, s_name
        |LIMIT 100""".stripMargin,
    "q_join_asof_forward" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS tsu,
        |  (SELECT MIN(epoch_us(v.ts)) FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND epoch_us(v.ts) > epoch_us(p.ts)) AS next_view_tsu
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    "q_join_asof_tolerance" ->
      """WITH m AS (
        |  SELECT p.event_id, p.user_id, epoch_us(p.ts) AS tsu,
        |    (SELECT MAX(epoch_us(v.ts)) FROM events v
        |     WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |       AND epoch_us(v.ts) < epoch_us(p.ts)) AS prior_v
        |  FROM events p WHERE p.event_type = 'purchase')
        |SELECT event_id, user_id, tsu,
        |  CASE WHEN tsu - prior_v <= 600000000 THEN prior_v END
        |    AS view_tsu_in_tol,
        |  CAST(COALESCE(tsu - prior_v <= 600000000, FALSE) AS INT)
        |    AS matched
        |FROM m ORDER BY event_id""".stripMargin,
    "q_join_asof_nearest" ->
      """WITH pv AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tsu,
        |    MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prior_v,
        |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |            RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS next_v
        |  FROM events)
        |SELECT event_id, user_id, tsu,
        |  CASE WHEN prior_v IS NULL THEN next_v
        |       WHEN next_v IS NULL THEN prior_v
        |       WHEN tsu - prior_v <= next_v - tsu THEN prior_v
        |       ELSE next_v END AS near_view_tsu,
        |  ABS(tsu - CASE WHEN prior_v IS NULL THEN next_v
        |       WHEN next_v IS NULL THEN prior_v
        |       WHEN tsu - prior_v <= next_v - tsu THEN prior_v
        |       ELSE next_v END) AS d_abs
        |FROM pv WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "q_join_interval" ->
      """SELECT a.event_id AS aid, COUNT(*) AS n_follow,
        |  MIN(b.event_id) AS first_follow_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND epoch_us(b.ts) > epoch_us(a.ts)
        | AND epoch_us(b.ts) <= epoch_us(a.ts) + 300000000
        |GROUP BY a.event_id ORDER BY aid""".stripMargin,
    "q_join_range_bucketed" ->
      """SELECT p.event_id AS pid, COUNT(*) AS n_near,
        |  MAX(epoch_us(v.ts)) AS last_near_tsu
        |FROM events p JOIN events v
        |  ON p.event_type = 'purchase'
        | AND epoch_us(v.ts) < epoch_us(p.ts)
        | AND epoch_us(v.ts) >= epoch_us(p.ts) - 60000000
        |GROUP BY p.event_id ORDER BY pid""".stripMargin,
  )
}
