package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional trailing names restrict the dump (builder iteration);
    // the driver always calls with exactly (sfDir, outDir)
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS) — Spark 4 only reads it
      // as a long (see graft.Tables.events normalization).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // production injection path: the oracle run carries the custom
      // rule/strategy through SparkSessionExtensions (config-time), not
      // just the in-process spark.experimental fallback
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // iterative queries leave localCheckpoint RDD blocks cached for
      // the session's lifetime; across ~200 queries that pressure slows
      // every later query (round-12 q_graph_pagerank triage). Nothing
      // carries cached state ACROSS queries (artifacts live on disk).
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // build-keyed provenance (round-17 advice item): record the hash
    // of the source tree this dump was built from — sbt runMain
    // recompiles first, so src/main at run time IS the running build.
    // counts.py --at-close recomputes and compares instead of mtimes.
    val srcHash = Provenance.treeHash(Provenance.repoRoot, Seq("src/main"))
    Files.writeString(Paths.get(s"$outDir/provenance.json"),
      s"""{"src_main_hash": "$srcHash"}""")
    spark.stop()
  }
}
