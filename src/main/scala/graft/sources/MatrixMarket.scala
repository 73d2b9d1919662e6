package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MatrixMarket coordinate-format source/sink — the reference's sparse
  * ingest surface (its RelationData constructors accept matrix-market
  * and raw COO files; SURVEY.md §2.A A2). Output ids are 0-based Longs,
  * matching the engine's Entity domains; values Double.
  *
  * Reading distributes: the body parses per-partition (textFile), only
  * the single header line is resolved on the driver. A 100 TB .mtx
  * would be splittable text — this reader never collects data rows. */
object MatrixMarket {

  val schema: StructType = StructType(Seq(
    StructField("row", LongType, nullable = false),
    StructField("col", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  final case class Header(rows: Long, cols: Long, nnz: Long)

  /** Parse the header (dims + nnz) without scanning the body. */
  def readHeader(spark: SparkSession, path: String): Header = {
    val first = spark.sparkContext.textFile(path)
      .filter(l => !l.startsWith("%") && l.trim.nonEmpty)
      .first()
    val Array(r, c, n) = first.trim.split("\\s+").map(_.toLong)
    Header(r, c, n)
  }

  /** Read a coordinate-format file into a COO DataFrame (row, col, v),
    * 0-based ids. Pattern-matrix files (no value column) read as 1.0. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // zipWithIndex pins the header = the first non-comment line even
    // when a data line is textually identical to it
    val indexed = spark.sparkContext.textFile(path)
      .zipWithIndex()
      .filter { case (l, _) => !l.startsWith("%") && l.trim.nonEmpty }
    val headerIdx = indexed.map(_._2).min()
    val rows = indexed
      .filter { case (_, i) => i != headerIdx }
      .map { case (l, _) =>
        val t = l.trim.split("\\s+")
        (t(0).toLong - 1, t(1).toLong - 1,
          if (t.length > 2) t(2).toDouble else 1.0)
      }
    spark.createDataFrame(rows).toDF("row", "col", "v")
  }

  /** Write a COO DataFrame as a matrix-market coordinate file directory
    * (header part + body parts; `cat header part-*` reassembles a
    * standards-compliant file — a single file would bottleneck on one
    * writer at scale). */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df.agg(max("row"), max("col"), count(lit(1))).head()
    val header = Seq(
      "%%MatrixMarket matrix coordinate real general",
      s"${stats.getLong(0) + 1} ${stats.getLong(1) + 1} ${stats.getLong(2)}")
    header.toDF("value").coalesce(1)
      .write.mode(SaveMode.Overwrite).text(s"$path/header")
    df.select(concat_ws(" ", col("row") + 1, col("col") + 1, col("v")))
      .write.mode(SaveMode.Overwrite).text(s"$path/body")
  }
}
