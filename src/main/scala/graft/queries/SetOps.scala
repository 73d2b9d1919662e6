package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.Det._
import graft.sql.{DetSql => D}

/** Set operators (SURVEY.md §2.B "Set operations").
  * Reference analog: multi-relation coupling (Macau §2.3) — entity id
  * domains shared across relations are combined by union; held-out
  * test-cell bookkeeping uses intersection/difference of cell sets. */
object SetOps {

  def qUnionAll(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(
      lit("cust").as("src"), col("c_custkey").as("id"), col("c_acctbal").as("bal"))
    val p = Tables.supplier(s, dir).select(
      lit("supp").as("src"), col("s_suppkey").as("id"), col("s_acctbal").as("bal"))
    c.unionByName(p)
      .groupBy("src")
      .agg(count(lit(1)).as("n"), dsum(col("bal")).as("sum_bal"))
      .orderBy("src")
  }

  def qUnionDistinct(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
    val p = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
    c.union(p).distinct().orderBy("nationkey")
  }

  def qIntersect(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
      .intersect(Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey")))
      .orderBy("custkey")

  def qExcept(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(col("p_partkey").as("partkey"))
      .except(Tables.lineitem(s, dir).select(col("l_partkey").as("partkey")))
      .orderBy("partkey")

  /** Multiset difference (EXCEPT ALL): every lineitem part reference
    * minus ONE copy per catalogued part — i.e. each partkey survives
    * (uses - 1) times. Folded to (partkey, n_left) so the output is
    * compact and deterministically ordered. Spark plans exceptAll as a
    * counted hash join, not a sort. */
  def qExceptAll(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(col("l_partkey").as("partkey"))
      .exceptAll(Tables.part(s, dir).select(col("p_partkey").as("partkey")))
      .groupBy("partkey").agg(count(lit(1)).as("n_left"))
      .orderBy("partkey")

  /** Multiset intersection (INTERSECT ALL): per partkey, min(multiplicity
    * in returned lineitems, multiplicity in appealed ones) copies. */
  def qIntersectAll(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.filter(col("l_returnflag") === "R").select(col("l_partkey").as("partkey"))
      .intersectAll(l.filter(col("l_returnflag") === "A")
        .select(col("l_partkey").as("partkey")))
      .groupBy("partkey").agg(count(lit(1)).as("n_both"))
      .orderBy("partkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_except_all" -> (qExceptAll _),
    "q_intersect_all" -> (qIntersectAll _),
    "q_union_all" -> (qUnionAll _),
    "q_union_distinct" -> (qUnionDistinct _),
    "q_intersect" -> (qIntersect _),
    "q_except" -> (qExcept _),
  )

  val oracle: Map[String, String] = Map(
    "q_except_all" ->
      """SELECT partkey, COUNT(*) AS n_left FROM (
        |  SELECT l_partkey AS partkey FROM lineitem
        |  EXCEPT ALL
        |  SELECT p_partkey AS partkey FROM part)
        |GROUP BY partkey ORDER BY partkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT partkey, COUNT(*) AS n_both FROM (
        |  SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
        |  INTERSECT ALL
        |  SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A')
        |GROUP BY partkey ORDER BY partkey""".stripMargin,
    "q_union_all" ->
      s"""SELECT src, COUNT(*) AS n, ${D.dsum("bal")} AS sum_bal
         |FROM (SELECT 'cust' AS src, c_custkey AS id, c_acctbal AS bal FROM customer
         |      UNION ALL
         |      SELECT 'supp' AS src, s_suppkey AS id, s_acctbal AS bal FROM supplier)
         |GROUP BY src ORDER BY src""".stripMargin,
    "q_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_intersect" ->
      """SELECT o_custkey AS custkey FROM orders
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin,
    "q_except" ->
      """SELECT p_partkey AS partkey FROM part
        |EXCEPT
        |SELECT l_partkey AS partkey FROM lineitem
        |ORDER BY partkey""".stripMargin,
  )
}
