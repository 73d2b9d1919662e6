package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.{DetSql => D}

/** Scan / projection / pushdown operators (SURVEY.md §2.B "Scans").
  * Reference analog: COO triplet ingest (RelationData construction) —
  * reading (i, j, value) columns off sparse relation storage. Here the
  * parquet scan must show column pruning (ReadSchema) and predicate
  * pushdown (PushedFilters) in the physical plan. */
object Scans {

  // ORDER BY totality: (l_orderkey, l_linenumber) is NOT unique in the
  // generated lineitem (~24% duplicate pairs), so the presentation sort
  // must cover EVERY output column — remaining ties are then full-row
  // duplicates, which hash identically in any order. The round-8 10x
  // sweep caught the underspecified version: DuckDB's external sort
  // reorders ties once it spills, while small in-memory runs of both
  // engines happened to preserve file order.

  def qScanProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")

  def qScanFilterPrune(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-07-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"),
              unix_timestamp(col("l_shipdate")).as("ship_epoch"),
              col("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber", "ship_epoch", "l_extendedprice")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_project" -> (qScanProject _),
    "q_scan_filter_prune" -> (qScanFilterPrune _),
  )

  val oracle: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q_scan_filter_prune" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${D.epochS("l_shipdate")} AS ship_epoch, l_extendedprice
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate <  TIMESTAMP '1997-07-01'
         |ORDER BY l_orderkey, l_linenumber, ship_epoch, l_extendedprice""".stripMargin,
  )
}
