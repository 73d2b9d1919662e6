package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Every registered operator runs on sf0.001 and returns a sane result
  * (the DuckDB hash gate at sf0.01 is the driver's; this is the fast
  * in-repo sweep). Queries expected non-empty at sf0.001 are asserted
  * rows > 0; the rest only need to execute. */
class QuerySmokeSpec extends SparkSpec {

  private val mayBeEmpty = Set(
    "q_join_anti",           // every customer may have orders
    "q_except",              // every part may be referenced
    "q_dedup_exact",         // duplicates may not exist at sf0.001
    "q_dedup_minhash_lsh",   // near-dup pairs above threshold
    "q_dedup_near_minhash",
    "q_dedup_embed_cosine")  // random embeddings may have no cos>=0.3 pair

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf("sf0.001"))
      val n = df.count()
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  /** Registry-size tripwire (round 11): the driver's correctness gate
    * skips queries that throw at DataFrame-construction time, so a
    * shrinking CORRECTNESS_r*.json can pass unnoticed (rounds 9-10 lost
    * 13 event-time queries this way). Pinning the count turns any
    * accidental registration loss into a named red test. Bump the
    * constant when ADDING queries. */
  test("registry size is pinned (silent gate-shrink tripwire)") {
    val pin = 255
    assert(SparkEntry.queries.size == pin,
      s"expected $pin registered queries, got ${SparkEntry.queries.size} — " +
        "if you added queries, bump this pin; if not, something unregistered")
  }
}
