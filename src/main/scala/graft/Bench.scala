package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS) — Spark 4 only reads it
      // as a long (see graft.Tables.events normalization).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same config-time extension injection as production / Verify
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM / codegen / parquet reader on EVERY table so the
    // first timed query touching each file isn't charged the one-time
    // footer-read/codegen startup cost
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    // median-of-3 per query: single-shot times at sf0.1 bounce with
    // host load (round-1 bench showed 10x swings on unchanged queries),
    // so report the per-query median to make round-over-round deltas
    // signal instead of noise
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // a crashing query must NOT bench as "fast and green": record the
    // failure per query in an `errors` field (empty object on a clean
    // run) instead of swallowing the throwable (round-6 judge item)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").takeWhile(_ != '\n').take(200)
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.size / 2)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}"""
    println(line)
    // the driver captures only a stdout tail (BENCH_r03.json lost 32 of
    // 95 per-query medians to truncation) — persist the full line too
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
