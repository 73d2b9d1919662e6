package graft.sources

import graft.SparkSpec
import graft.bdf.{Gibbs, Macau}
import org.apache.spark.sql.functions._

/** CSV/TSV triplet ingest must round-trip exactly and feed the
  * factorization engine end-to-end (the reference's csv -> RelationData
  * -> macau flow). */
class DelimitedCooSpec extends SparkSpec {

  test("COO triplets round-trip through csv and tsv") {
    val s = spark
    import s.implicits._
    val coo = (0 until 200)
      .map(i => (i.toLong % 23, i.toLong % 17, i * 0.25 - 10.0))
      .toDF("row", "col", "v")
    for ((delim, dir) <- Seq("," -> "/tmp/graft-coo-csv", "\t" -> "/tmp/graft-coo-tsv")) {
      DelimitedCoo.write(coo, dir, delim)
      val back = DelimitedCoo.read(spark, dir, delim)
      // Spark's csv source forces nullable=true on file-backed fields;
      // names and types are what the contract pins
      assert(back.schema.map(f => (f.name, f.dataType)) ===
        DelimitedCoo.schema.map(f => (f.name, f.dataType)))
      val a = coo.orderBy("row", "col", "v").collect().map(_.toString).toSeq
      val b = back.orderBy("row", "col", "v").collect().map(_.toString).toSeq
      assert(a === b, s"round-trip mismatch for delimiter '$delim'")
    }
  }

  test("csv triplets feed the reference flow: read -> RelationData -> macau") {
    val s = spark
    import s.implicits._
    def g(i: Int, j: Int, st: Long) = graft.bdf.CbRng.gaussian(7L, st, i.toLong, j.toLong)
    val cells = for (i <- 0 until 15; j <- 0 until 12) yield
      (i.toLong, j.toLong, g(i, 0, 1) * g(j, 0, 2) + 0.05 * g(i, j, 3))
    DelimitedCoo.write(cells.toDF("row", "col", "v"), "/tmp/graft-coo-fit")
    val coo = DelimitedCoo.read(spark, "/tmp/graft-coo-fit")
    val res = Macau.fit(spark, coo, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 4, burnin = 2, samples = 2, alpha = 10.0, seed = 3L))
    val sd = coo.select(stddev_pop(col("v"))).head().getDouble(0)
    assert(res.predictions.count() > 0)
    assert(res.finalRmse < sd, s"rmse ${res.finalRmse} not < stddev $sd")
  }
}
