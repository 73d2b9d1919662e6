package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DPP face must actually prune: the month-partitioned fact scan
  * carries a runtime `dynamicpruning` partition filter (the selected
  * months are only known after the dim-side aggregate runs — no
  * static filter could do this), reads strictly fewer rows than the
  * fact table holds, and produces the same values as the plain
  * unpartitioned computation. */
class DppSpec extends SparkSpec {

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      allNodes(s.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  test("fact scan is dynamically partition-pruned to the selected months") {
    val dir = sf("sf0.01")
    val df = Layout.qScanDppMonths(spark, dir)
    val got = df.collect().map(_.toString)
    assert(got.nonEmpty, "no above-average months selected")

    val total = graft.Tables.lineitem(spark, dir).count()
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("fact_ym")) => f
    }
    assert(scans.nonEmpty, "no partitioned-fact scan in the plan")
    scans.foreach { f =>
      assert(f.partitionFilters.exists(
          _.toString.toLowerCase.contains("dynamicpruning")),
        s"fact scan has no dynamic pruning filter: ${f.partitionFilters}")
      val rows = f.metrics("numOutputRows").value
      info(s"fact scan rows: $rows of $total")
      assert(rows > 0, "pruned scan read nothing")
      assert(rows < total,
        s"DPP read the whole fact table ($rows rows) - nothing pruned")
    }

    // layout never changes semantics: same values as the plain
    // unpartitioned computation over the source table
    val m = graft.Tables.orders(spark, dir)
      .groupBy(expr("year(o_orderdate) * 100 + month(o_orderdate)").as("ym"))
      .agg(count(lit(1)).as("n"))
    val t = m.agg(sum(col("n")).as("tot"), count(lit(1)).as("nm"))
    val sel = m.crossJoin(broadcast(t))
      .filter(col("n") * col("nm") > col("tot"))
      .select(col("ym"))
    val plain = graft.Tables.lineitem(spark, dir)
      .withColumn("symi", expr("year(l_shipdate) * 100 + month(l_shipdate)"))
      .join(sel, col("symi") === col("ym"))
      .groupBy(col("symi").cast("long").as("ship_ym"))
      .agg(count(lit(1)).as("n_items"),
           graft.sql.Det.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("ship_ym")
      .collect().map(_.toString)
    assert(got === plain, "DPP result diverges from the plain computation")
  }
}
