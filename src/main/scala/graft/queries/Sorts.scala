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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sort_limit_topk" -> (qSortLimitTopk _),
    "q_sort_multi" -> (qSortMulti _),
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
  )
}
