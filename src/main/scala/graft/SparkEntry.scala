package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator declared in SURVEY.md §2 is an entry in [[queries]];
  * the SQL-expressible ones have a DuckDB twin in [[oracleSql]]. */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.qAggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.queries ++ Filters.queries ++ Aggs.queries ++ Sorts.queries ++
      SetOps.queries ++ Joins.queries ++ Windows.queries ++
      Scalars.queries ++ Bdf.queries ++ Llm.queries ++ Pipeline.queries ++
      Curate.queries ++ Layout.queries ++ Graph.queries ++ Ivf.queries ++
      Bpe.queries ++ StreamingQ.queries ++ Semantic.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  val oracleSql: Map[String, String] =
    Scans.oracle ++ Filters.oracle ++ Aggs.oracle ++ Sorts.oracle ++
      SetOps.oracle ++ Joins.oracle ++ Windows.oracle ++
      Scalars.oracle ++ Bdf.oracle ++ Llm.oracle ++ Pipeline.oracle ++
      Curate.oracle ++ Layout.oracle ++ Graph.oracle ++ Ivf.oracle ++
      Bpe.oracle ++ StreamingQ.oracle ++ Semantic.oracle
}
