package graft
import org.apache.spark.sql.SparkSession

/** Throwaway stage-level profiler for the dedup family (round-7 item 1):
  * times each named query N times and prints per-rep + median seconds,
  * so run-order/JIT effects are visible. Not part of the contract. */
object Profile {
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
    Seq("documents", "embeddings", "lineitem")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_minhash_lsh", "q_dedup_minhash_banded",
               "q_dedup_jaccard_ngram", "q_dedup_clusters",
               "q_dedup_clusters_converged", "q_dedup_keep_canonical",
               "q_dedup_incremental")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.size / 2)
      println(f"PROFILE $n%-28s med=$med%6.2f  reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
