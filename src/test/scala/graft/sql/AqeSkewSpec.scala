package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE runtime re-planning on skew (SURVEY §2.C scale techniques): a
  * sort-merge join whose build side piles onto one hot key must be
  * split by OptimizeSkewedJoin at runtime ("skew=true" in the final
  * plan) — the built-in alternative to manual salting (graft.sql.Salt)
  * when the skew is only discovered at execution time. Thresholds are
  * lowered for the test's data volume and restored afterwards. */
class AqeSkewSpec extends SparkSpec {

  test("AQE OptimizeSkewedJoin splits the hot-key partition at runtime") {
    val s = spark
    import s.implicits._
    val conf = s.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.shuffle.partitions").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.shuffle.partitions", "8")

      // 200k rows on ONE key + a light tail; dim side is uniform
      val fact = s.range(200000).select(lit(0L).as("k"), col("id").as("pay"))
        .unionAll(s.range(1000).select((col("id") % 100 + 1).as("k"), col("id").as("pay")))
      val dim = s.range(101).select(col("id").as("k"), (col("id") * 7).as("w"))
      // no keyed aggregation downstream: a groupBy(k) would REQUIRE the
      // join's hash partitioning and AQE then refuses to split the skew
      // (it would force an extra shuffle)
      val joined = fact.join(dim, "k")
        .select((col("pay") + col("w")).as("x")).filter(col("x") < 0)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }
}
