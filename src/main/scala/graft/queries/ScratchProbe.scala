package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition probe (round-18 optimization triage).
  * Not part of the contract. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    // one stride-2 LPA job's plan over the blocked delta graph: does
    // the intermediate round's label frame dedup via ReusedExchange?
    val ids = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id")).localCheckpoint(true)
    val cand = ids.select(col("id").as("x"),
      explode(array(Seq(1, 2, 3, 5, 8).map(d => col("id") + d): _*)).as("y"))
    val e0 = cand.join(ids.select(col("id").as("y")), Seq("y"))
      .select(col("x"), col("y"))
    val sym = e0.unionByName(e0.select(col("y").as("x"), col("x").as("y")))
      .filter(expr("x div 64 = y div 64")).localCheckpoint(true)
    def round(l: org.apache.spark.sql.DataFrame) = {
      val pick = sym.join(l, col("y") === col("id"))
        .groupBy(col("x"), col("lab")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("x").as("nid"))
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("m"))
        .select(col("nid"), (-col("m.nl")).as("newlab"))
      l.join(pick, col("id") === col("nid"), "left")
        .select(col("id"), col("lab").as("lab0"),
                coalesce(col("newlab"), col("lab")).as("lab"))
    }
    val lab0 = ids.select(col("id"), col("id").as("lab"))
    val two = round(round(lab0).select(col("id"), col("lab")))
      .select(col("id"), col("lab"))
    two.count() // execute so AQE finalizes
    val p = two.queryExecution.executedPlan.toString
    println("REUSED_EXCHANGE_COUNT=" + "ReusedExchange".r.findAllIn(p).size)
    println("EXCHANGE_COUNT=" + "Exchange".r.findAllIn(p).size)
    // job-count check: how many Spark jobs does the full converged face run?
    var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    val t0 = System.nanoTime()
    Graph.qGraphCommunitiesConverged(spark, sfDir).count()
    println(f"COMMUNITIES_CONVERGED jobs=$jobs wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
