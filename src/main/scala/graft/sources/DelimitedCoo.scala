package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Delimited-text (CSV/TSV) COO source/sink — the reference's other
  * sparse ingest surface: plain (row, col, value) triplet files
  * (SURVEY.md §2.A A2; the matrix-market header-ful cousin is
  * [[MatrixMarket]]). Built directly on Spark's splittable csv
  * source, so a 100 TB triplet dump parallelizes by file split and
  * both schema and malformed-row policy are explicit — never inferred
  * (schema inference scans the data once and can flip types between
  * runs; FAILFAST surfaces corrupt rows instead of silently nulling). */
object DelimitedCoo {

  val schema: StructType = StructType(Seq(
    StructField("row", LongType, nullable = false),
    StructField("col", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  def read(spark: SparkSession, path: String, delimiter: String = ",",
           header: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("delimiter", delimiter)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  /** Distributed write (one part file per partition — never a driver
    * collect). */
  def write(df: DataFrame, path: String, delimiter: String = ",",
            header: Boolean = false): Unit =
    df.select(col("row").cast("long"), col("col").cast("long"),
              col("v").cast("double"))
      .write.mode(SaveMode.Overwrite)
      .option("delimiter", delimiter)
      .option("header", header.toString)
      .csv(path)
}
