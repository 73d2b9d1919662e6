package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins (SURVEY.md §4 / the 100 TB checklist):
  * pre-bucketing both sides of a recurring big-big join on the join key
  * removes the per-query shuffle entirely — the scan is already hash
  * partitioned. This spec proves the plan shape: same results as the
  * plain join, SortMergeJoin present, and NO shuffle exchange. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Tables.lineitem(s, sf("sf0.001"))
        .select("l_orderkey", "l_quantity")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      Tables.orders(s, sf("sf0.001"))
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("ord_bucketed")

      val joined = s.table("li_bucketed")
        .join(s.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()

      val plain = Tables.lineitem(s, sf("sf0.001"))
        .join(Tables.orders(s, sf("sf0.001")),
              col("l_orderkey") === col("o_orderkey")).count()
      assert(n === plain, "bucketed join changed results")

      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
