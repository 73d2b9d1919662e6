package graft.sql

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime (bloom) filter injection — the optimizer's answer to "a
  * selective dim filter should prune the fact side BEFORE the join
  * shuffle". At 100 TB this is the difference between shuffling the
  * whole fact table and shuffling the ~1% that can match. Spark gates
  * the rewrite on size thresholds; they are lowered for the test's
  * volume and restored afterwards. */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim predicate injects a bloom filter on the fact side") {
    val s = spark
    import s.implicits._
    val conf = s.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep a shuffle join

      // fact/dim written to parquet: the rewrite needs scan-based size
      // estimates, in-memory LocalRelations are never considered
      val dir = java.nio.file.Files.createTempDirectory("graft_rtf").toString
      s.range(100000).select(col("id").as("fk"), (col("id") * 3).as("pay"))
        .write.mode("overwrite").parquet(s"$dir/fact")
      s.range(2000).select(col("id").as("dk"), (col("id") % 97).as("sel"))
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = s.read.parquet(s"$dir/fact")
      val dim = s.read.parquet(s"$dir/dim").filter(col("sel") === 7) // ~1%

      val joined = fact.join(dim, col("fk") === col("dk"))
        .agg(count(lit(1)).as("n"), sum(col("pay")).as("sp"))
      val row = joined.collect().head
      assert(row.getLong(0) > 0)
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
  }

  test("maxRecordsPerFile bounds output file sizes (small/large-file control)") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_filesz").toString
    s.read.parquet(sf("sf0.001") + "/documents.parquet")
      .repartition(1)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 100)
      .parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    // 500 docs at <=100 records/file from one task -> at least 5 files
    assert(files.length >= 5, s"file splitting did not engage: ${files.length}")
    val back = s.read.parquet(dir)
    assert(back.count() == 500)
  }
}
