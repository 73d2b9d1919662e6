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
}
