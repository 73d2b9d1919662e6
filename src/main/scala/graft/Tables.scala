package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata (TESTDATA.md).
  * Every query fn re-reads from `dir` — no caching, so each
  * `SparkEntry.queries` entry is self-contained (SURVEY.md §7.4.6). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
    * to TimestampType (PARQUET_TYPE_ILLEGAL). Sessions set
    * spark.sql.legacy.parquet.nanosAsLong=true (see Verify/Bench/specs),
    * so ts arrives as LongType nanoseconds; normalize to a microsecond
    * TimestampType column (`ts DIV 1000` = floor, identical to DuckDB's
    * ns->us truncation for these post-1970 timestamps). */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
