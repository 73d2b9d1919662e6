package graft

import org.apache.spark.sql.SparkSession

/** Single-query isolation bench — the one-command repro for bench-delta
  * triage (host-load spikes muddied the per-round artifact in rounds
  * 6, 7 and 8; each time the triage was a hand-written runner).
  *
  *   sbt> runMain graft.BenchOne q_corpus_shuffle 6
  *
  * Runs ONLY the named query (same session config as [[Bench]], same
  * table warm-up) for `reps` consecutive repetitions and prints one
  * JSON line with every rep time plus loadavg at both ends — enough to
  * tell "monotonically improving = cold start, steady ~X s" from a
  * real regression without the other 150 queries competing for cores.
  * Env knobs match Bench: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS. */
object BenchOne {
  private def loadavg(): Seq[Double] =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .trim.split(" ").take(3).toSeq.map(_.toDouble)
    catch { case _: Throwable => Nil }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse {
      System.err.println(
        s"usage: BenchOne <query> [reps]\nqueries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val fn = SparkEntry.queries.getOrElse(name, {
      System.err.println(s"unknown query '$name'; valid: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    })
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = loadavg()
    // the par-membw canary pair IS the arbitration precondition (the
    // r16→r17 lesson: read it FIRST — a 43 s vs flat ~13 s pair means
    // the host is contended and the reps mean nothing), so record it
    // in-artifact exactly like the full Bench does
    val membwParStart = Bench.membwParCanary()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // same per-rep sweep as Bench: stale localCheckpoint blocks and
      // plan caches otherwise make later reps measure cache pressure
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
      dt
    }
    val membwParEnd = Bench.membwParCanary()
    val loadEnd = loadavg()
    def jarr(xs: Seq[Double]): String = xs.mkString("[", ",", "]")
    val sorted = times.sorted
    println(
      s"""{"query":"$name","reps":${jarr(times)},"median":${sorted(sorted.size / 2)},"min":${sorted.head},"loadavg_start":${jarr(loadStart)},"loadavg_end":${jarr(loadEnd)},"membw_par_canary_sec":[$membwParStart,$membwParEnd],"membw_par_threads":${Bench.membwParThreads},"sf":"$sfDir"}""")
    spark.stop()
  }
}
