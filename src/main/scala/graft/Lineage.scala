package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for ITERATIVE loop state.
  *
  * `Dataset.localCheckpoint(eager = true)` truncates the logical plan
  * to a single LogicalRDD node — but that node INHERITS the origin
  * plan's cost statistics. A fixpoint loop whose step joins the state
  * with (a derivative of) itself therefore roughly SQUARES the
  * inherited `sizeInBytes` every iteration: the stats of a join are
  * the product of its children's. Measured on this build (Spark
  * 4.1.2): by iteration 12 the stats BigInt has ~4,000 digits, by
  * iteration ~50 planning spends ~20 s per iteration multiplying
  * million-digit BigIntegers, and around iteration 55 planning dies
  * with `ArithmeticException: BigInteger would overflow supported
  * range`. Any convergence loop with a run-length backstop above ~30
  * is exposed — the fixed-3/4-round oracle faces never were (2^4
  * growth is invisible).
  *
  * [[truncate]] materializes eagerly (so an attached Observation's
  * metrics are settled when it returns, preserving the one-action-
  * per-round discipline) and then REBUILDS the Dataset from the
  * checkpointed RDD. The rebuilt LogicalRDD carries no origin stats,
  * so per-iteration planning cost is flat forever. The cost is one
  * extra narrow row-conversion map over the loop-state table per
  * downstream use — linear in the STATE (node/rank pairs), never the
  * corpus, and dwarfed by the loop's own shuffles. Joins against the
  * result won't auto-broadcast (its default size estimate is
  * conservative) — correct for loop state, which grows with the data.
  */
object Lineage {
  def truncate(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
