package graft.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism kit (SURVEY.md §7.4).
  *
  * The driver hash-compares our parquet output against a DuckDB oracle, so
  * every aggregated measure must be bit-identical regardless of shuffle /
  * accumulation order in either engine. Rules:
  *
  *  - All double measures in the testdata carry <= 2 decimal digits
  *    (verified via DuckDB on sf0.01), so `CAST(x AS DECIMAL(18,6))` is
  *    exact in both engines and decimal sums are order-independent.
  *  - Final exported numeric columns are DOUBLE (one correctly-rounded
  *    IEEE conversion from the exact decimal — identical bits in both
  *    engines) or BIGINT; never raw DECIMAL (precision/scale metadata
  *    differs across engines) and never raw TIMESTAMP (parquet ns vs us).
  *  - avg is computed as exact-decimal-sum -> double, divided by count —
  *    never the engine's native avg (incremental double accumulation is
  *    order-dependent).
  *
  * Scala-side helpers here mirror SQL fragments in [[graft.sql.DetSql]]
  * 1:1 so Spark queries and DuckDB oracle strings stay in lockstep.
  */
object Det {
  val DecT = "decimal(18,6)"

  /** Exact cast of a (<=2dp-valued) double measure. */
  def dec(c: Column): Column = c.cast(DecT)

  /** Decimal quantization of a FLOAT column (embeddings). Widen to
    * double FIRST: Spark's float->decimal goes through the float's
    * 7-digit shortest string, which manufactures exact .5 ties at digit
    * 7 that DuckDB (rounding the true binary value) resolves
    * differently. float->double->decimal makes both engines round the
    * same real number, where exact ties are impossible (a dyadic value
    * cannot equal m/(2*10^6)). */
  def decf(c: Column): Column = c.cast("double").cast(DecT)

  /** Order-independent exact sum, exported as double — with the exact
    * decimal ROUNDED TO CENTS first. A scale-6 sum's double conversion
    * is exact in both engines only while |sum|*1e6 < 2^53 (|sum| <
    * ~9e9): past that, Spark's single-rounding BigDecimal conversion
    * and DuckDB's int128->double-then-divide double-rounding can
    * differ in the last ulp (observed in the round-8 10x sweep: a
    * 2.79e10 sum_charge). ROUND(dec, 2) is LOSSLESS for every <=2dp
    * source measure (the testdata rule above), is an exact decimal op
    * with identical tie rules (HALF_UP == away-from-zero) in both
    * engines, and widens the exact-conversion window to |sum| < ~9e13
    * — three orders beyond the 10x-sf0.1 corpus sums. */
  def dsum(c: Column): Column = round(sum(dec(c)), 2).cast("double")

  /** Exact decimal sum kept as decimal for further exact arithmetic. */
  def dsumDec(c: Column): Column = sum(dec(c))

  /** Deterministic average: exact decimal sum (cents-rounded — see
    * [[dsum]]) -> double, / count. */
  def davg(c: Column): Column = round(sum(dec(c)), 2).cast("double") / count(c)

  /** Epoch seconds as BIGINT — sidesteps the parquet timestamp[ns]
    * (DuckDB) vs timestamp[us] (Spark) precision trap for outputs. */
  def epochS(c: Column): Column = unix_timestamp(c)

  /** Deterministic pseudo-random bucket in [0, mod) from an integer key:
    * Knuth multiplicative hash — pure integer arithmetic, identical in
    * any engine (NOT engine `hash()`, which differs across engines).
    * Mirrors the reference's random train/test cell assignment
    * (assignToTest!) with a reproducible split. */
  def lcgBucket(key: Column, mod: Int): Column =
    ((key * lit(2654435761L)) % lit(4294967296L)) % lit(mod.toLong)
}

/** SQL-string twins of [[Det]] for DuckDB oracle queries. */
object DetSql {
  def dec(c: String): String = s"CAST($c AS DECIMAL(18,6))"
  def decf(c: String): String = s"CAST(CAST($c AS DOUBLE) AS DECIMAL(18,6))"
  def dsum(c: String): String = s"CAST(ROUND(SUM(${dec(c)}), 2) AS DOUBLE)"
  def dsumDec(c: String): String = s"SUM(${dec(c)})"
  def davg(c: String): String =
    s"CAST(ROUND(SUM(${dec(c)}), 2) AS DOUBLE) / COUNT($c)"
  def epochS(c: String): String = s"CAST(FLOOR(EPOCH($c)) AS BIGINT)"
  def lcgBucket(key: String, mod: Int): String =
    s"((($key) * 2654435761) % 4294967296) % $mod"
}
