package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The co-located bucketed join must actually be co-located: both
  * scans bucketed, ZERO shuffle exchanges anywhere in the join plan
  * (the whole point of paying the bucketBy shuffle at layout time),
  * and values identical to the plain join (bucketing is layout, not
  * semantics). */
class BucketJoinSpec extends SparkSpec {

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allNodes(s.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  test("bucketed join: zero exchanges, bucketed scans, values equal the plain join") {
    val dir = sf("sf0.01")
    val df = Joins.bucketedOrdersCustomer(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"))
    val got = df.collect().map(_.toString).sorted

    val nodes = allNodes(df.queryExecution.executedPlan)
    val exchanges = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"co-located bucketed join planned ${exchanges.size} shuffle " +
        "exchange(s) - the bucketing is not being used")
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 2, s"expected 2 table scans, got ${scans.size}")
    scans.foreach(f => assert(f.bucketedScan,
      s"scan of ${f.metadata.get("Location")} is not a bucketed scan"))

    // layout never changes semantics: same rows as the plain join
    val plain = graft.Tables.orders(spark, dir)
      .join(graft.Tables.customer(spark, dir),
            col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment"))
      .collect().map(_.toString).sorted
    assert(got === plain, "bucketed join rows diverge from the plain join")
  }

  test("one file per bucket: the layout the sorted bucketed scan needs") {
    val dir = sf("sf0.01")
    Joins.bucketedOrdersCustomer(spark, dir).collect() // ensure written
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    for (name <- Seq("orders", "customer")) {
      val d = new java.io.File(
        s"${sys.props("java.io.tmpdir")}/graft_buckets/$tag/$name")
      val parts = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("part-"))
      assert(parts.length == 8,
        s"$name: expected 8 bucket files (one per bucket), " +
          s"got ${parts.length}")
    }
  }
}
