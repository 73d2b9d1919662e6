package graft.expressions

import graft.{SparkSpec, Tables}
import graft.queries.Aggs
import org.apache.spark.sql.functions._

/** The two properties q_agg_heavy_hitters' exactness rests on:
  * (1) the Misra-Gries survivors are a SUPERSET of every key with
  * frequency > n/(k+1) under ANY partitioning (the merge offset must
  * preserve the deficit bound), and (2) the two-pass query output is
  * the exact heavy-hitter set, invariant to partitioning, matching a
  * brute-force groupBy. Adversarial shapes: a key sitting just above
  * the survival bound diluted by a sea of distinct keys (max counter
  * churn), and an all-distinct stream (every counter evicted
  * constantly; output must be empty, not noise). */
class MisraGriesSpec extends SparkSpec {

  private def candidates(df: org.apache.spark.sql.DataFrame,
                         k: Int): Set[Long] = {
    MisraGries.register(spark)
    df.agg(expr(s"graft_misra_gries(key, $k)").as("cand"))
      .head().getSeq[Long](0).toSet
  }

  test("survivors cover every key above n/(k+1) under adversarial partitioning") {
    import spark.implicits._
    // 60 copies of key 0, 40 of key 1, 900 distinct fillers: n=1000.
    // With k=24, n/(k+1)=40 — key 0 (60 > 40) MUST survive; key 1
    // (40, not > 40) has no guarantee and may legitimately drop.
    val data = Seq.fill(60)(0L) ++ Seq.fill(40)(1L) ++
      (100L until 1000L)
    for (parts <- Seq(1, 3, 7)) {
      // sort-by-key puts the heavy keys' copies first (front-loaded
      // counters must survive 900 later evictions); reverse puts them
      // last (counters must establish against a saturated table)
      for (stream <- Seq(data.sorted, data.sorted.reverse)) {
        val df = spark.sparkContext.parallelize(stream, parts).toDF("key")
        val c = candidates(df, 24)
        assert(c.contains(0L),
          s"parts=$parts: key 0 (freq 60 > n/(k+1)=40) evicted — bound broken")
        assert(c.size <= 24, s"parts=$parts: ${c.size} survivors exceed k")
      }
    }
  }

  test("all-distinct stream yields no false heavy hitters end to end") {
    import spark.implicits._
    val df = (0L until 5000L).toDF("key").repartition(8)
    val c = candidates(df, 16)
    assert(c.size <= 16)
    // second pass: no key's true count (1) can pass count*125 > n
    val n = 5000L
    val hh = df.filter(col("key").isInCollection(c))
      .groupBy("key").count().filter(col("count") * 125L > lit(n))
    assert(hh.count() === 0L)
  }

  test("q_agg_heavy_hitters equals brute-force groupBy and is partitioning-invariant") {
    val dir = sf("sf0.01")
    val got = Aggs.qAggHeavyHitters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val ev = Tables.events(spark, dir)
    val n = ev.count()
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") * 125L > lit(n))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === exact)
    assert(got.nonEmpty, "fixture should contain at least one heavy hitter")
    // the sketch pass sees a different partitioning; output must not move
    MisraGries.register(spark)
    val repart = ev.select("user_id").repartition(13)
    val p1 = repart.agg(expr("graft_misra_gries(user_id, 192)").as("c"),
      count(lit(1)).as("n")).head()
    val hh2 = repart.filter(col("user_id").isInCollection(p1.getSeq[Long](0)))
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") * 125L > lit(p1.getLong(1)))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hh2 === exact)
  }
}
