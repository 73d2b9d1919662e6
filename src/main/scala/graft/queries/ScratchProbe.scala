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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val l = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").as("v"))
    for (r <- 1 to 3) {
      t(s"scan only count rep$r") { l.count() }
      val bs = t(s"depthBoundaries acc=10000 rep$r") {
        Prefix.depthBoundaries(l, col("v"), 256)
      }
      t(s"depthBoundaries acc=1000 rep$r") {
        Prefix.depthBoundaries(l, col("v"), 256, accuracy = 1000)
      }
      val bucketed = l.withColumn("_pb", Prefix.bucketOf(col("v"), bs))
      t(s"bucket counts collect rep$r") {
        bucketed.groupBy("_pb").agg(count(lit(1)).as("bn")).collect()
      }
      t(s"full percentile_exact rep$r") {
        Sorts.qSortPercentileExact(spark, sfDir).count()
      }
      t(s"full tpch_q20 rep$r") {
        Joins.qJoinTpchQ20(spark, sfDir).count()
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
