package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The containment metric must do the one thing Jaccard can't — flag a
  * verbatim quote inside a much longer document — and the query's
  * reported numbers must equal a driver-side brute force on raw text. */
class DedupMetricsSpec extends SparkSpec {

  test("containment flags a verbatim quote that Jaccard misses") {
    graft.expressions.ShingleOps.register(spark)
    import spark.implicits._
    val article = (1 to 120)
      .map(i => s"w${i}a w${i}b w${i}c token$i")
      .mkString(" ")
    val quote = article.substring(200, 420) // contiguous slice
    val r = Seq((article, quote)).toDF("text_a", "text_b")
      .select(expr("graft_cgram_common(text_a, text_b, 4)").as("common"),
              expr("graft_cgram_count(text_a, 4)").as("ca"),
              expr("graft_cgram_count(text_b, 4)").as("cb"))
      .collect()(0)
    val (common, ca, cb) =
      (r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble)
    val containment = common / math.min(ca, cb)
    val jaccard = common / (ca + cb - common)
    info(f"containment=$containment%.3f jaccard=$jaccard%.3f")
    // every 4-gram of a contiguous slice is a 4-gram of the article
    assert(containment == 1.0,
      f"quote-in-article containment $containment%.3f != 1.0")
    assert(jaccard < 0.3,
      f"jaccard $jaccard%.3f should be low for a short quote - " +
        "otherwise containment adds nothing")
  }

  test("reported containment pairs equal a driver brute force on raw text") {
    val dir = sf("sf0.001")
    val pairs = Llm.qDedupContainment(spark, dir).collect()
    val txt = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] =
      if (t.length < 4) Set.empty else t.sliding(4).toSet
    assert(pairs.nonEmpty, "no containment pairs at sf0.001")
    pairs.foreach { p =>
      val (da, db) = (p.getLong(0), p.getLong(1))
      val (ga, gb) = (grams(txt(da)), grams(txt(db)))
      val common = ga.intersect(gb).size.toLong
      val nMin = math.min(ga.size, gb.size).toLong
      assert(p.getLong(2) == common,
        s"pair ($da,$db): n_common ${p.getLong(2)} != brute $common")
      assert(p.getLong(3) == nMin,
        s"pair ($da,$db): n_min ${p.getLong(3)} != brute $nMin")
      assert(p.getDouble(4) == common.toDouble / nMin,
        s"pair ($da,$db): containment mismatch")
    }
  }
}
