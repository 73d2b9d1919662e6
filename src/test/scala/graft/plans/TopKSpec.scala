package graft.plans

import graft.SparkSpec
import graft.queries.Windows
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The tier-(c) custom operator: rewrite + strategy + bounded-heap
  * exec must be plan-visible AND value-identical to the window
  * formulation it replaces. */
class TopKSpec extends SparkSpec {

  test("q_win_topk_key plans as TopKPerKey with no Window operator") {
    val df = Windows.qWinTopkKey(spark, sf("sf0.001"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"custom operator not planned:\n$p")
    assert(!p.contains("Window"), s"WindowExec survived the rewrite:\n$p")
  }

  test("q_mix_domain_cap plans as TopKPerKey and caps the hub hosts") {
    val df = graft.queries.Curate.qMixDomainCap(spark, sf("sf0.001"))
    val rows = df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"custom operator not planned:\n$p")
    assert(!p.contains("Window"), s"WindowExec survived the rewrite:\n$p")
    // the cap holds per host, and the hub hosts genuinely exercised it
    val perHost = rows.groupBy(_.getString(0))
    assert(perHost.values.forall(_.length <= 8), "a host kept > 8 docs")
    val hubs = rows.filter(_.getString(0).startsWith("hub-"))
    assert(hubs.nonEmpty, "no hub hosts in the fixture")
    assert(hubs.forall(_.getLong(4) > 8),
      "hub hosts not over-cap — the skew fixture lost its point")
  }

  test("TopKPerKey equals the rank() window formulation row-for-row") {
    TopKPerKey.register(spark)
    val o = graft.Tables.orders(spark, sf("sf0.001"))
    // rank() over a UNIQUE ordering == row_number; the rewrite rule
    // only matches RowNumber, so this side keeps the WindowExec plan
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = o
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
              rank().over(w).as("rn"))
      .filter(col("rn") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val got = o
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
              row_number().over(w).as("rn"))
      .filter(col("rn") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("TopKPerKey is correct for string ordering keys (buffer-backed values)") {
    TopKPerKey.register(spark)
    import org.apache.spark.sql.functions.{concat, lit, lpad}
    // many rows per task so the reused-UnsafeRow hazard would corrupt
    // stored UTF8String keys if they were not copied
    val df = spark.range(0, 5000)
      .select((col("id") % 7).as("k"),
              concat(lit("name_"), lpad(col("id").cast("string"), 6, "0")).as("name"))
    val w = Window.partitionBy("k").orderBy(col("name").desc)
    val got = df.select(col("k"), col("name"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val expected = df.select(col("k"), col("name"), rank().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === expected)
    assert(got.size === 21) // 7 keys x top-3, unique names
  }

  test("guard: oversized k and empty partition specs fall back to WindowExec") {
    TopKPerKey.register(spark)
    val o = graft.Tables.orders(spark, sf("sf0.001"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    spark.conf.set("spark.graft.topk.maxK", "1")
    try {
      val big = o.select(col("o_custkey"), row_number().over(w).as("rn"))
        .filter(col("rn") <= 2)
      big.collect()
      val pBig = big.queryExecution.executedPlan.toString
      assert(!pBig.contains("TopKPerKey"), s"k>maxK must not rewrite:\n$pBig")
      assert(pBig.contains("Window"), s"expected WindowExec fallback:\n$pBig")
    } finally spark.conf.unset("spark.graft.topk.maxK")
    val wGlobal = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val global = o.select(col("o_orderkey"), row_number().over(wGlobal).as("rn"))
      .filter(col("rn") <= 2)
    global.collect()
    val pGlobal = global.queryExecution.executedPlan.toString
    assert(!pGlobal.contains("TopKPerKey"),
      s"empty partition spec must not rewrite:\n$pGlobal")
  }

  test("exec reports heap-resident rows through the SQL metric") {
    TopKPerKey.register(spark)
    val df = Windows.qWinTopkKey(spark, sf("sf0.001"))
    df.collect()
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(s.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    val topks = allNodes(df.queryExecution.executedPlan)
      .collect { case t: TopKPerKeyExec => t }
    assert(topks.nonEmpty, "no TopKPerKeyExec in the executed plan")
    // both levels ran over >0 rows, so both metrics must be positive
    topks.foreach(t => assert(t.metrics("heapRows").value > 0,
      s"heapRows metric not populated on $t"))
  }

  test("rewrite leaves multi-expression windows and non-rank filters alone") {
    TopKPerKey.register(spark)
    val o = graft.Tables.orders(spark, sf("sf0.001"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    // rank+row_number together: must stay a WindowExec plan
    val multi = o.select(col("o_custkey"), rank().over(w).as("rnk"),
                         row_number().over(w).as("rn"))
      .filter(col("rn") <= 2)
    multi.collect()
    assert(multi.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("exec stays bounded and correct under 10^5 distinct keys") {
    TopKPerKey.register(spark)
    val keys = 100000
    val df = spark.range(2L * keys).select(
      (col("id") % keys).as("k"), col("id").as("v"))
    val w = Window.partitionBy("k").orderBy(col("v").desc)
    val top = df.select(col("k"), col("v"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 1)
    // collect (not count) so the metrics below come from THIS
    // queryExecution — count() plans and runs a separate one
    assert(top.collect().length == keys, "one survivor per key expected")
    val p = top.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), s"many-keys plan skipped the exec:\n$p")
    def allNodes(pl: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = pl match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(s.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    val execs = allNodes(top.queryExecution.executedPlan)
      .collect { case t: TopKPerKeyExec => t }
    assert(execs.nonEmpty)
    // the heaps held at least one row per key somewhere across levels
    assert(execs.map(_.metrics("heapRows").value).max >= keys,
      "heapRows metric under-reports the many-keys load")
  }
}
