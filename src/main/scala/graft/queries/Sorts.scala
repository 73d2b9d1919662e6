package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.Det.lcgBucket
import graft.sql.{DetSql => D}

/** Sort / limit / top-k operators (SURVEY.md §2.B "Sorts").
  * Reference analog: ranking predictions (top-k recommendation read-out
  * from the posterior mean). Spark plans a global orderBy+limit as
  * TakeOrderedAndProject (per-partition heap + driver merge — no full
  * sort / no single-node shuffle at 100 TB). */
object Sorts {

  def qSortLimitTopk(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
               col("l_linenumber").asc)
      .limit(100)

  def qSortMulti(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy(col("o_orderpriority").asc, col("o_totalprice").desc,
               col("o_orderkey").asc)
      .limit(500)

  /** Deep pagination WITHOUT a global sort: the rows at global ranks
    * [4001, 4020] of `ORDER BY l_extendedprice, l_orderkey,
    * l_linenumber` — the page-N read every result-browsing API needs,
    * where `orderBy.limit.offset` degenerates into sorting (and
    * shipping) everything before the page. Plan: per-distinct-price
    * counts + bucketed prefix sums ([[Prefix.withPrefix]]) locate the
    * few price values whose rank interval intersects the page; ONLY
    * their rows (count ~ page size + duplicates) are windowed for
    * in-value tiebreak ranks. At 100 TB: two narrow aggregate passes +
    * one filtered scan, no global shuffle sort, page depth irrelevant. */
  def qSortPaginate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val (lo, hi) = (4001L, 4020L)
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice").as("v"))
    // Same selection machinery as q_sort_percentile_exact: bucket RAW
    // rows on equi-depth value boundaries (l_extendedprice is
    // near-unique, so a per-distinct-value grouping would be an
    // O(N)-group agg — the round-5 formulation paid exactly that),
    // count per bucket (256 groups, map-side combine), locate the
    // page's bucket(s) ON THE DRIVER (the ≤256-row count table is the
    // depthBoundaries bounded-collect contract; round-18 — the old
    // DataFrame prefix table cost a triangular-join stage per serve),
    // and window ONLY their ~N/256 rows for the in-bucket tiebreak.
    // Buckets are a function of v alone, so equal values never
    // straddle a boundary and bucket-prefix + in-bucket row_number is
    // the same total order as the oracle's global ROW_NUMBER. Page
    // depth still never costs a shuffle sort.
    val (bucketed, prefAll) = Prefix.bucketCountsPrefixDriver(l, col("v"), 256)
    val pref = prefAll
      .filter { case (_, bn, nb) => nb < hi && nb + bn >= lo }
      .toDF("pb", "bn", "n_before")
    val w = Window.partitionBy("_pb")
      .orderBy("v", "l_orderkey", "l_linenumber")
    bucketed.join(broadcast(pref), col("_pb") === col("pb"))
      .withColumn("rank", col("n_before") + row_number().over(w))
      .filter(col("rank").between(lo, hi))
      .select(col("rank"), col("l_orderkey"), col("l_linenumber"), col("v"))
      .orderBy("rank")
  }

  /** Exact order statistics (selection, not sorting): the floor/ceil
    * rank values for five quantiles of l_extendedprice, found WITHOUT a
    * global sort — per-distinct-value counts + bucketed prefix sums
    * (queries/Prefix) turn "the value at 0-indexed rank r" into a range
    * probe `n_before <= r < n_before + n` against a 5-row broadcast.
    * Emitting the two bracketing order statistics (rather than an
    * interpolated quantile) keeps the output engine-exact by
    * construction — interpolation formulas differ in rounding across
    * engines, selected values cannot. At 100 TB: two narrow passes and
    * one tiny broadcast join vs a full shuffle sort. */
  def qSortPercentileExact(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val buckets = 256
    val l = Tables.lineitem(s, dir).select(col("l_extendedprice").as("v"))
    // selection, not prefix-sum: bucket RAW rows (no per-distinct-value
    // grouping — l_extendedprice is near-unique, a 600k-group hash agg
    // would dominate), count per bucket (256 groups, map-side combine),
    // locate each target rank's bucket + local offset ON THE DRIVER
    // (the ≤256-row count table is the depthBoundaries bounded-collect
    // contract — round-18: the old DataFrame pref/tot pair each
    // re-aggregated lineitem, 4 scans for a query whose algorithmic
    // floor is 3 passes: sketch, counts, hit buckets), then sort ONLY
    // the hit buckets (~N/256 rows each). Equi-depth boundaries
    // (Prefix.depthBoundaries) keep every hit bucket near N/256 rows
    // even on heavy-tailed price domains. Exact long arithmetic
    // driver-side == the old exchange-side longs, so the selected
    // values are unchanged.
    val (bucketed, pref) =
      Prefix.bucketCountsPrefixDriver(l, col("v"), buckets)
    val nt = pref.map(_._2).sum
    // nt == 0 (empty input): no rank exists — degrade to an empty
    // result like the old DataFrame-join formulation did, instead of
    // throwing at construction time (round-18 advice item); the
    // declared corpus is never empty, so bench/oracle rows are
    // unaffected
    val located = (if (nt == 0L) Nil
                   else Seq(0.25, 0.5, 0.75, 0.9, 0.99)).flatMap { pct =>
      val rkLo = math.floor((nt - 1) * pct).toLong
      val rkHi = math.ceil((nt - 1) * pct).toLong
      Seq(("lo", rkLo), ("hi", rkHi)).map { case (which, rk) =>
        val (pb, _, nb) = pref
          .find { case (_, bn, nb) => nb <= rk && rk < nb + bn }
          .getOrElse(throw new IllegalStateException(
            s"rank $rk outside the bucket prefix table"))
        (pct, rkLo, rkHi, which, pb, rk - nb)
      }
    }.toDF("pct", "rk_lo", "rk_hi", "which", "pb", "off")
    val w = Window.partitionBy("pct", "which").orderBy("v")
    val picked = bucketed.join(broadcast(located), col("_pb") === col("pb"))
      .withColumn("rnk", row_number().over(w) - 1)
      .filter(col("rnk") === col("off"))
    picked.groupBy("pct", "rk_lo", "rk_hi")
      .agg(max(when(col("which") === "lo", col("v"))).as("v_lo"),
           max(when(col("which") === "hi", col("v"))).as("v_hi"))
      .select(col("pct"), col("rk_lo"), col("v_lo"), col("rk_hi"), col("v_hi"))
      .orderBy("pct")
  }

  /** Deterministic stratified sampling — the training-data op "keep a
    * reproducible ~20% of every stratum": membership is a pure integer
    * LCG of the row's natural key (never engine `rand()`/`hash()`, which
    * differ across engines and runs), so the sample is stable across
    * engines, partitionings, and retries. Emits per-stratum totals,
    * kept counts/fraction and the kept decimal mass so the oracle can
    * verify the exact membership, not just the rate. At 100 TB this is
    * a narrow filter fused into the scan. */
  def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    import graft.sql.Det.dec
    val key = col("l_orderkey") * 8 + col("l_linenumber")
    val kept = (lcgBucket(key, 10) < 2).cast("int")
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), kept.as("kept"),
              dec(col("l_quantity")).as("q"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_total"),
           sum(col("kept")).as("n_kept"),
           (sum(col("kept")).cast("double") / count(lit(1))).as("kept_frac"),
           sum(when(col("kept") === 1, col("q"))).cast("double")
             .as("kept_sum_qty"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sort_limit_topk" -> (qSortLimitTopk _),
    "q_sort_paginate" -> (qSortPaginate _),
    "q_sort_multi" -> (qSortMulti _),
    "q_sort_percentile_exact" -> (qSortPercentileExact _),
    "q_sample_stratified" -> (qSampleStratified _),
  )

  val oracle: Map[String, String] = Map(
    "q_sort_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,
    "q_sort_paginate" ->
      """WITH r AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice AS v,
        |    ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber) AS rank
        |  FROM lineitem)
        |SELECT CAST(rank AS BIGINT) AS rank, l_orderkey, l_linenumber, v
        |FROM r WHERE rank BETWEEN 4001 AND 4020 ORDER BY rank""".stripMargin,
    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
        |LIMIT 500""".stripMargin,
    // ROW_NUMBER tie order is arbitrary but the VALUE at any rank inside
    // a tie block is unique, so the selected values are deterministic
    "q_sort_percentile_exact" ->
      """WITH r AS (
        |  SELECT l_extendedprice AS v,
        |    ROW_NUMBER() OVER (ORDER BY l_extendedprice) - 1 AS rk
        |  FROM lineitem),
        |tot AS (SELECT COUNT(*) AS nt FROM lineitem),
        |q AS (
        |  SELECT CAST(pct AS DOUBLE) AS pct,
        |    CAST(FLOOR((nt - 1) * CAST(pct AS DOUBLE)) AS BIGINT) AS rk_lo,
        |    CAST(CEIL((nt - 1) * CAST(pct AS DOUBLE)) AS BIGINT) AS rk_hi
        |  FROM (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) v(pct), tot)
        |SELECT q.pct, q.rk_lo, lo.v AS v_lo, q.rk_hi, hi.v AS v_hi
        |FROM q JOIN r lo ON lo.rk = q.rk_lo JOIN r hi ON hi.rk = q.rk_hi
        |ORDER BY pct""".stripMargin,
    "q_sample_stratified" -> {
      val kept = s"CASE WHEN ${D.lcgBucket("l_orderkey * 8 + l_linenumber", 10)} < 2 THEN 1 ELSE 0 END"
      s"""SELECT l_returnflag, COUNT(*) AS n_total,
         |  CAST(SUM($kept) AS BIGINT) AS n_kept,
         |  CAST(SUM($kept) AS DOUBLE) / COUNT(*) AS kept_frac,
         |  CAST(SUM(CASE WHEN $kept = 1 THEN ${D.dec("l_quantity")} END) AS DOUBLE) AS kept_sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },
  )
}
