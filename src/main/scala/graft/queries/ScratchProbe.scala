package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-decomposition probe for the lakehouse serve paths
  * (round-18 optimization triage). Not part of the contract. */
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
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val demo = t("compactDemoPath (cached artifact)") {
      Layout.compactDemoPath(spark, sfDir)
    }
    val entries = t("manifestEntries") {
      Layout.manifestEntries(demo)
        .filter(_._1.startsWith("table/"))
    }
    println(s"PROBE n_files = ${entries.size}")
    val files = entries.map { case (rel, _) => s"$demo/$rel" }
    for (r <- 1 to 3) {
      val df = t(s"plan (listing+infer) rep$r") {
        spark.read.option("basePath", s"$demo/table").parquet(files: _*)
      }
      t(s"count after plan rep$r") { df.count() }
    }
    spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold",
                   "8192")
    for (r <- 1 to 3) {
      val df = t(s"THR8192 plan rep$r") {
        spark.read.option("basePath", s"$demo/table").parquet(files: _*)
      }
      t(s"THR8192 count rep$r") { df.count() }
    }
    spark.stop()
  }
}
