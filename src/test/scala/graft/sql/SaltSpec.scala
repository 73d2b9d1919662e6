package graft.sql

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salting is plan surgery only — both helpers must produce exactly the
  * unsalted results. */
class SaltSpec extends SparkSpec {

  test("saltedAgg equals plain groupBy aggregation") {
    val e = Tables.events(spark, sf("sf0.001"))
    val plain = e.groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,6)")).as("s"))
      .orderBy("key").collect()
    val salted = Salt.saltedAgg(e,
        key = col("event_type"), salt = col("event_id"), buckets = 8,
        partials = Seq(count(lit(1)).as("pn"),
                       sum(col("value").cast("decimal(18,6)")).as("ps")),
        combine = Seq(sum(col("pn")).as("n"), sum(col("ps")).as("s")))
      .orderBy("key").collect()
    assert(salted.map(_.toString).toSeq === plain.map(_.toString).toSeq)
  }

  test("saltedJoin equals plain equi-join") {
    val l = Tables.lineitem(spark, sf("sf0.001"))
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val p = Tables.part(spark, sf("sf0.001")).select("p_partkey", "p_brand")
    val plain = l.join(p, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
      .orderBy("l_orderkey", "l_linenumber").collect()
    val salted = Salt.saltedJoin(l, p, col("l_partkey"), col("p_partkey"), 8)
      .select("l_orderkey", "l_linenumber", "p_brand")
      .orderBy("l_orderkey", "l_linenumber").collect()
    assert(salted.length === plain.length)
    assert(salted.map(_.toString).toSeq === plain.map(_.toString).toSeq)
  }
}
