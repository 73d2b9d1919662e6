package graft
import org.apache.spark.sql.SparkSession

/** Scaling-exponent probe (round-13 judge item: "measure, don't
  * argue, the 100x story"): run a set of registered queries against
  * SEVERAL scale clones of the corpus in one JVM and print one JSON
  * line per (query, dir) — median/min of `reps` timed runs, RDD
  * caches dropped per rep (the Bench discipline). The exponent
  * log(t_big/t_small)/log(scale) over the emitted medians is what
  * docs/bench-tail-triage.md records for the families whose cost is
  * claimed flat-or-linear.
  *
  * Usage: ScaleProbe <reps> <q1,q2,...> <dir1> [dir2 ...]
  * (dirs are sfDir-shaped; build clones with tools/scale10.py). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val queries = args(1).split(",").toSeq
    val dirs = args.drop(2).toSeq
    require(dirs.nonEmpty, "usage: ScaleProbe <reps> <q1,q2,..> <dir..>")
    val bad = queries.filterNot(SparkEntry.queries.contains)
    require(bad.isEmpty, s"unknown queries: ${bad.mkString(",")}")
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
    for (dir <- dirs) {
      // warm the parquet reader per dir so rep 1 isn't footer reads
      Seq("orders", "lineitem", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$dir/$t.parquet").count())
      for (q <- queries) {
        val fn = SparkEntry.queries(q)
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          // ...and the session plan cache (the Bench discipline from
          // the round-16 arbitration): 15 queries x N dirs share this
          // JVM, and a neighbor's leftover cache would inflate a min
          // time into a spurious exponent
          spark.sharedState.cacheManager.clearCache()
          (dt, n)
        }
        val sorted = times.map(_._1).sorted
        println(s"""{"query":"$q","dir":"$dir","rows":${times.head._2},""" +
          s""""median":${sorted(sorted.size / 2)},"min":${sorted.head},""" +
          s""""reps":${times.map(_._1).mkString("[", ",", "]")}}""")
      }
    }
    spark.stop()
  }
}
