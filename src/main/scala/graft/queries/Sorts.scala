package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

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
    import s.implicits._
    val l = Tables.lineitem(s, dir).select(col("l_extendedprice").as("v"))
    val perValue = l.groupBy("v").agg(count(lit(1)).as("n"))
    val pre = Prefix.withPrefix(perValue, "v", Seq("n"))
    val tot = perValue.agg(sum(col("n")).as("nt"))
    val quants = Seq(0.25, 0.5, 0.75, 0.9, 0.99).toDF("pct")
      .crossJoin(broadcast(tot))
      .select(col("pct"),
        floor((col("nt") - 1) * col("pct")).cast("long").as("rk_lo"),
        ceil((col("nt") - 1) * col("pct")).cast("long").as("rk_hi"))
    val lo = pre.join(broadcast(quants),
        col("n_before") <= col("rk_lo") &&
          col("rk_lo") < col("n_before") + col("n"))
      .select(col("pct"), col("rk_lo"), col("v").as("v_lo"), col("rk_hi"))
    pre.join(broadcast(lo),
        col("n_before") <= col("rk_hi") &&
          col("rk_hi") < col("n_before") + col("n"))
      .select(col("pct"), col("rk_lo"), col("v_lo"), col("rk_hi"),
              col("v").as("v_hi"))
      .orderBy("pct")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sort_limit_topk" -> (qSortLimitTopk _),
    "q_sort_multi" -> (qSortMulti _),
    "q_sort_percentile_exact" -> (qSortPercentileExact _),
  )

  val oracle: Map[String, String] = Map(
    "q_sort_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,
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
  )
}
