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

  /** The `%%MatrixMarket` banner's (field, symmetry) pair, validated.
    * `nnz` in a symmetric file counts STORED entries (one triangle);
    * the readers mirror i != j entries so the returned COO always
    * describes the full matrix, like Julia's MatrixMarket.jl does for
    * the reference's ingest. Unsupported forms (complex, hermitian,
    * skew-symmetric, dense `array` format) are rejected LOUDLY at
    * parse time — never read with values silently dropped. */
  final case class Banner(field: String, symmetry: String) {
    def mirror: Boolean = symmetry == "symmetric"
    def pattern: Boolean = field == "pattern"
  }
  val DefaultBanner: Banner = Banner("real", "general")

  /** Parse + validate a `%%MatrixMarket ...` banner line (keywords are
    * case-insensitive per the MM spec). Throws on every form this
    * engine cannot represent faithfully. */
  def parseBanner(line: String): Banner = {
    val t = line.trim.toLowerCase.split("\\s+")
    require(t.length >= 5 && t(0) == "%%matrixmarket" && t(1) == "matrix",
      s"matrixmarket: malformed banner '$line'")
    if (t(2) != "coordinate")
      throw new IllegalArgumentException(
        s"matrixmarket: only coordinate format is supported, got '${t(2)}' in '$line'")
    t(3) match {
      case "real" | "integer" | "pattern" => ()
      case other => throw new IllegalArgumentException(
        s"matrixmarket: unsupported field '$other' in '$line' " +
          "(complex matrices cannot be read as (row, col, v) doubles)")
    }
    t(4) match {
      case "general" | "symmetric" => ()
      case other => throw new IllegalArgumentException(
        s"matrixmarket: unsupported symmetry '$other' in '$line' " +
          "(hermitian/skew-symmetric would need sign/conjugate mirroring)")
    }
    Banner(t(3), t(4))
  }

  /** Banner from a file's first line: a `%%MatrixMarket` line parses
    * (and validates — throws on complex/hermitian/...); anything else
    * (bare COO shards, plain `%` comments) is real-general. */
  def bannerOf(firstLine: Option[String]): Banner = firstLine match {
    case Some(l) if l.startsWith("%%MatrixMarket") || l.startsWith("%%matrixmarket") =>
      parseBanner(l)
    case _ => DefaultBanner
  }

  /** Parse the header (dims + nnz) without scanning the body; the
    * banner is validated too (a complex/hermitian file fails here, not
    * downstream). `nnz` is the STORED entry count — for a symmetric
    * file the mirrored COO from [[read]] has up to 2*nnz rows. */
  def readHeader(spark: SparkSession, path: String): Header = {
    val raw = spark.sparkContext.textFile(path)
    bannerOf(raw.take(1).headOption) // validate; dims meaning is unchanged
    val first = raw
      .filter(l => !l.startsWith("%") && l.trim.nonEmpty)
      .first()
    val Array(r, c, n) = first.trim.split("\\s+").map(_.toLong)
    Header(r, c, n)
  }

  /** Read a coordinate-format file into a COO DataFrame (row, col, v),
    * 0-based ids. Pattern-matrix entries read as 1.0; `symmetric`
    * banners mirror every off-diagonal entry (the stored triangle is
    * only half the matrix); complex/hermitian/skew-symmetric reject
    * loudly via [[parseBanner]]. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.sparkContext.textFile(path)
    // banner = the file's literal first line (bounded driver-side job
    // on the first partition only); comments after it don't matter
    val banner = bannerOf(raw.take(1).headOption)
    // zipWithIndex pins the header = the first non-comment line even
    // when a data line is textually identical to it
    val indexed = raw
      .zipWithIndex()
      .filter { case (l, _) => !l.startsWith("%") && l.trim.nonEmpty }
    val headerIdx = indexed.map(_._2).min()
    val rows = indexed
      .filter { case (_, i) => i != headerIdx }
      .map { case (l, _) =>
        val t = l.trim.split("\\s+")
        (t(0).toLong - 1, t(1).toLong - 1,
          if (!banner.pattern && t.length > 2) t(2).toDouble else 1.0)
      }
    val full =
      if (banner.mirror)
        rows.flatMap { case (r, c, v) =>
          if (r == c) Iterator.single((r, c, v))
          else Iterator((r, c, v), (c, r, v))
        }
      else rows
    spark.createDataFrame(full).toDF("row", "col", "v")
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
