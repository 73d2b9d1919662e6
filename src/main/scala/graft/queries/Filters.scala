package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.Det._
import graft.sql.{DetSql => D}

/** Filter / projection-expression operators (SURVEY.md §2.B
  * "Projection / filter / predicates"). Reference analog: selecting
  * observed cells of a relation by predicate (e.g. binarization
  * thresholds / class_cut) before factorization. */
object Filters {

  def qFilterPredicates(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .filter((col("o_orderstatus") === "O" ||
               col("o_orderpriority").isin("1-URGENT", "2-HIGH")) &&
              col("o_totalprice").between(1000.0, 200000.0) &&
              !col("c_name").like("%00042%"))
      .select("o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice")
      .orderBy("o_orderkey")
  }

  def qProjExpressions(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.select(
      col("l_orderkey"), col("l_linenumber"),
      (dec(col("l_extendedprice")) * (dec(lit(1)) - dec(col("l_discount"))))
        .cast("double").as("disc_price"),
      when(col("l_quantity") >= 30, "bulk").otherwise("small").as("qty_class"),
      // (l_orderkey, l_linenumber) is non-unique in the generated
      // lineitem: the sort covers every output column so ties are
      // full-row duplicates (round-8 10x sweep fix, see Scans)
    ).orderBy("l_orderkey", "l_linenumber", "disc_price", "qty_class")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_filter_predicates" -> (qFilterPredicates _),
    "q_proj_expressions" -> (qProjExpressions _),
  )

  val oracle: Map[String, String] = Map(
    "q_filter_predicates" ->
      """SELECT o_orderkey, o_custkey, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE (o_orderstatus = 'O' OR o_orderpriority IN ('1-URGENT','2-HIGH'))
        |  AND o_totalprice BETWEEN 1000.0 AND 200000.0
        |  AND NOT c_name LIKE '%00042%'
        |ORDER BY o_orderkey""".stripMargin,
    "q_proj_expressions" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(${D.dec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")}) AS DOUBLE) AS disc_price,
         |  CASE WHEN l_quantity >= 30 THEN 'bulk' ELSE 'small' END AS qty_class
         |FROM lineitem
         |ORDER BY l_orderkey, l_linenumber, disc_price, qty_class""".stripMargin,
  )
}
