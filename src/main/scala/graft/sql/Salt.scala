package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (SURVEY.md §4 / the 100 TB checklist). AQE's
  * skew-join handling covers sort-merge joins; these cover the two
  * shapes AQE does not: a single hot GROUP BY key overwhelming one
  * reducer, and a broadcast-infeasible join against a skewed key where
  * the small side can be replicated.
  *
  * Salting is plan surgery, not semantics: every helper here is
  * equivalence-tested against its unsalted form. */
object Salt {

  /** Salt in [0, buckets) derived from an expression. For AGGREGATION
    * the source must be stable per row (partials from retried tasks must
    * agree); for the salted JOIN any per-row spread works — every bucket
    * carries a replica of the small side, so a retried row joining under
    * a different salt produces the identical output row. */
  def saltCol(source: Column, buckets: Int): Column =
    pmod(hash(source), lit(buckets))

  /** Two-phase aggregation for skewed group keys: pre-aggregate on
    * (key, salt) — spreading a hot key over `buckets` reducers — then
    * combine the partials. `partials` and `combine` describe the same
    * aggregates at the two levels (e.g. count -> sum of counts). */
  def saltedAgg(df: DataFrame, key: Column, salt: Column, buckets: Int,
                partials: Seq[Column], combine: Seq[Column]): DataFrame =
    df.groupBy(key.as("__key"), saltCol(salt, buckets).as("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("__key"))
      .agg(combine.head, combine.tail: _*)
      .withColumnRenamed("__key", "key")

  /** Skewed equi-join: salt the big (skewed) side's key, replicate the
    * small side once per bucket, join on (key, salt). Rows of a hot key
    * then land on `buckets` different reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: Column,
                 smallKey: Column, buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", saltCol(monotonically_increasing_id(), buckets))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
      bigKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
