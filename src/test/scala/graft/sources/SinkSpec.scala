package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sink-side layout tests: the 100 TB story is not just reading fast —
  * curated corpora get WRITTEN partitioned so downstream jobs prune.
  * (Bucketed-table exchange elimination is covered by BucketingSpec;
  * the plain parquet writer itself runs in every Verify dump.) */
class SinkSpec extends SparkSpec {

  test("partitionBy(lang) write prunes partitions and pushes residual filters") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)

    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    val n = back.count()
    val expected = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .filter(col("lang") === "en").count()
    assert(n == expected && n > 0, s"partitioned round-trip lost rows: $n vs $expected")

    // pruning must happen at planning: the scan's numFiles metric
    // counts SELECTED partitions' files, one per lang here
    // (DataFrame.inputFiles deliberately ignores pruning, so it can't
    // prove this)
    back.collect()
    val scan = back.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.toString.contains("PartitionFilters"),
      s"no partition filters:\n$scan")
    assert(scan.metrics("numFiles").value == 1,
      s"read touched ${scan.metrics("numFiles").value} files, expected 1 (lang=en only)")

    // a residual (non-partition) predicate still pushes into parquet
    val resid = spark.read.parquet(dir)
      .filter(col("lang") === "en" && col("n_chars") > 200)
    resid.collect()
    val rp = resid.queryExecution.executedPlan.toString
    assert(rp.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars"),
      s"residual predicate not pushed:\n$rp")
  }

  test("dynamic partition overwrite replaces only the touched partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_dyn").toString
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val before = spark.read.parquet(dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // rewrite ONLY lang=zh with a halved slice, dynamic mode
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      docs.filter(col("lang") === "zh" && col("doc_id") % 2 === 0)
        .write.mode("overwrite").partitionBy("lang").parquet(dir)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")

    val after = spark.read.parquet(dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("en") == before("en") && after("fr") == before("fr"),
      "untouched partitions were clobbered")
    assert(after("zh") < before("zh"), "zh partition not replaced")
  }
}
