package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton) data layout — the file-layout half of 100 TB data
  * skipping. Sorting output files by the bit-interleave of two
  * (normalized) columns makes every file's min/max footer range narrow
  * in BOTH dimensions, so a predicate on EITHER column prunes row
  * groups at scan time — a 1-D sort only ever prunes its own leading
  * column. Everything here is exact integer arithmetic (bit spreads)
  * on normalized 16-bit ranks, so the contract query has a bit-exact
  * DuckDB oracle; LayoutSpec proves the skipping effect on real
  * parquet footers (fewer overlapping files for a box query than a
  * linearly-sorted layout). */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (the classic mask ladder — O(1), codegen-friendly,
    * pure built-ins per the tier-(a) preference). */
  private def spread16(c: Column): Column = {
    val c0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val c1 = c0.bitwiseOR(shiftleft(c0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c2 = c1.bitwiseOR(shiftleft(c1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c3 = c2.bitwiseOR(shiftleft(c2, 2)).bitwiseAND(lit(0x33333333L))
    c3.bitwiseOR(shiftleft(c3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values: x on even bits, y on
    * odd bits. */
  def z2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write `df` z-ordered on (c1, c2): both columns min/max-normalized
    * to 16-bit ranks (without normalization the wider-domain column
    * monopolizes the high interleave bits and the layout degenerates
    * to a 1-D sort), range-partitioned into `numFiles` files and
    * sorted by the Morton code within each. The normalization min/max
    * is one cheap agg pass; at 100 TB the same two-pass shape holds
    * (or the stats come free from catalog/footers). */
  def zorderWrite(df: DataFrame, c1: String, c2: String,
                  path: String, numFiles: Int): Unit = {
    val mm = df.agg(min(col(c1)).as("n1"), max(col(c1)).as("x1"),
                    min(col(c2)).as("n2"), max(col(c2)).as("x2"))
    val z = df.crossJoin(broadcast(mm))
      .withColumn("_zx", norm16(col(c1), col("n1"), col("x1")))
      .withColumn("_zy", norm16(col(c2), col("n2"), col("x2")))
      .withColumn("_z", z2(col("_zx"), col("_zy")))
      .drop("n1", "x1", "n2", "x2", "_zx", "_zy")
    z.repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Exact integer min/max normalization to [0, 65535] (floor
    * division via Prefix.idiv — identical in any engine, no floats). */
  private def norm16(c: Column, lo: Column, hi: Column): Column =
    Prefix.idiv((c.cast("long") - lo) * lit(65535L),
                greatest(hi - lo, lit(1L)))

  /** Contract query: Morton-bucket layout statistics over lineitem's
    * (l_partkey, l_suppkey) — per top-6-bit z bucket, the row count
    * and the min/max of BOTH key columns. The narrow per-bucket ranges
    * in both dimensions ARE the data-skipping property (each bucket =
    * one file's footer stats under zorderWrite). Plan: one tiny min/max
    * agg broadcast to a narrow map, then a 64-group hash agg — scan
    * shuffles nothing but 64 aggregate rows at any scale. */
  def qLayoutZorder(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
    val mm = li.agg(min(col("l_partkey")).as("n1"), max(col("l_partkey")).as("x1"),
                    min(col("l_suppkey")).as("n2"), max(col("l_suppkey")).as("x2"))
    li.crossJoin(broadcast(mm))
      .select(col("l_partkey"), col("l_suppkey"),
              z2(norm16(col("l_partkey"), col("n1"), col("x1")),
                 norm16(col("l_suppkey"), col("n2"), col("x2"))).as("z"))
      .groupBy(shiftright(col("z"), 26).as("z_bucket"))
      .agg(count(lit(1)).as("n"), min(col("z")).as("z_min"),
           max(col("z")).as("z_max"),
           min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
           min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
      .orderBy("z_bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_layout_zorder" -> (qLayoutZorder _),
  )

  /** The oracle spells out the same mask ladder with DuckDB's bitwise
    * operators — bit-for-bit identical integer arithmetic. */
  val oracle: Map[String, String] = Map(
    "q_layout_zorder" ->
      s"""WITH mm AS (
         |  SELECT MIN(l_partkey) AS n1, MAX(l_partkey) AS x1,
         |         MIN(l_suppkey) AS n2, MAX(l_suppkey) AS x2
         |  FROM lineitem),
         |nrm AS (
         |  SELECT l_partkey, l_suppkey,
         |    ((l_partkey - n1) * 65535) // GREATEST(x1 - n1, 1) AS xv,
         |    ((l_suppkey - n2) * 65535) // GREATEST(x2 - n2, 1) AS yv
         |  FROM lineitem, mm),
         |s1 AS (
         |  SELECT l_partkey, l_suppkey,
         |    ((xv | (xv << 8)) & 16711935) AS xa,
         |    ((yv | (yv << 8)) & 16711935) AS ya
         |  FROM nrm),
         |s2 AS (
         |  SELECT l_partkey, l_suppkey,
         |    ((xa | (xa << 4)) & 252645135) AS xb,
         |    ((ya | (ya << 4)) & 252645135) AS yb
         |  FROM s1),
         |s3 AS (
         |  SELECT l_partkey, l_suppkey,
         |    ((xb | (xb << 2)) & 858993459) AS xc,
         |    ((yb | (yb << 2)) & 858993459) AS yc
         |  FROM s2),
         |s4 AS (
         |  SELECT l_partkey, l_suppkey,
         |    ((xc | (xc << 1)) & 1431655765) AS xd,
         |    ((yc | (yc << 1)) & 1431655765) AS yd
         |  FROM s3),
         |z AS (
         |  SELECT l_partkey, l_suppkey, (xd | (yd << 1)) AS z FROM s4)
         |SELECT z >> 26 AS z_bucket, COUNT(*) AS n,
         |  MIN(z) AS z_min, MAX(z) AS z_max,
         |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
         |  MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
         |FROM z GROUP BY 1 ORDER BY z_bucket""".stripMargin,
  )
}
