package graft

import org.apache.spark.sql.SparkSession

/** Per-query Spark-JOB counter — the triage instrument for
  * scheduler-overhead-bound faces (round-18 finding: one
  * q_graph_communities_converged serve issued 65 Spark jobs at sf0.1,
  * mostly AQE stage materializations; the loop family's cost is job
  * latency, not data). Times each named query like [[Profile]] and
  * additionally reports how many jobs the serve issued, so a
  * "fewer-jobs" optimization has a number to move.
  *
  *   sbt> runMain graft.JobsProbe q_graph_communities_converged ...
  *
  * Same session config and env knobs as [[Bench]]
  * (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PROBE_REPS).
  * Job counts are read from a SparkListener; the listener bus is
  * asynchronous, so the probe drains it with a short settle wait
  * before reading — counts are for triage, not a contract. Not part
  * of the driver contract. */
object JobsProbe {
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
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q_graph_communities_converged")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n, {
        System.err.println(s"unknown query '$n'"); sys.exit(2)
      })
      val rows = (1 to reps).map { _ =>
        Thread.sleep(300) // let the async listener bus drain
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        val dj = jobs.get() - j0
        // same per-rep sweep as Bench
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.sharedState.cacheManager.clearCache()
        (dt, dj)
      }
      val med = rows.map(_._1).sorted.apply(rows.size / 2)
      println(f"JOBSPROBE $n%-32s med=$med%6.2f s  jobs=${rows.map(_._2).mkString(",")}  reps=${rows.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
