package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The radius-search contract's two claims: the indexed query equals
  * brute force (the cell prune is lossless), and the prune actually
  * cuts cells when the corpus has cluster geometry (the synthetic
  * testdata is near-uniform, so the prune can only show on a
  * clustered fixture — same honesty pattern as BloomSpec). */
class RangeSearchSpec extends SparkSpec {

  test("indexed range search equals brute force at sf0.01") {
    graft.expressions.VectorOps.register(spark)
    val dir = sf("sf0.01")
    val got = Ivf.qSimRangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val qs = graft.Tables.embeddings(spark, dir).filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val brute = graft.Tables.embeddings(spark, dir)
      .crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
              expr("graft_sqdist12(embedding, qemb)").as("dist2"))
      .filter(col("dist2") <= 1.45)
      .orderBy("qid", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "radius returned no pairs — spec is vacuous")
    assert(got.toSeq === brute.toSeq)
  }

  test("cellstats survive in the saved index and cover every cell") {
    val dir = sf("sf0.01")
    val p = Ivf.ensureIndex(spark, dir)
    val stats = Ivf.loadCellStats(spark, p).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cells = Ivf.loadLists(spark, p).select("cid").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(stats.keySet === cells, "cellstats missing populated cells")
    assert(stats.values.forall(_ >= 0.0))
  }

  test("prune cuts cells on a clustered corpus and stays lossless") {
    graft.expressions.VectorOps.register(spark)
    graft.expressions.VecSum6.register(spark)
    import spark.implicits._
    // three well-separated clusters on a 4-dim space, INTERLEAVED by
    // id so Lloyd's first-k seeding (ids 0,1,2) lands one seed per
    // cluster: i%3==0 around (0,0,0,0), ==1 around (10,0,0,0),
    // ==2 around (0,10,0,0)
    val e = (0L until 24L).map { i =>
      val c = i % 3
      val base = c match {
        case 0 => Array(0.0, 0.0, 0.0, 0.0)
        case 1 => Array(10.0, 0.0, 0.0, 0.0)
        case _ => Array(0.0, 10.0, 0.0, 0.0)
      }
      val jitter = (i / 3).toDouble * 0.01
      (i, base.map(_ + jitter).toSeq)
    }.toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files
      .createTempDirectory("ivf_range").toString + "/idx"
    Ivf.save(e, Ivf.train(e, iters = 3, k = 3), tmp, 3, 3)
    // a query at the first cluster's center, radius far smaller than
    // the inter-cluster gap
    val qs = Seq((0L, Seq(0.0, 0.0, 0.0, 0.0)))
      .toDF("qid", "qemb")
    val r2 = 1.0
    val surv = Ivf.rangeSurvivingCells(spark, tmp, qs, r2)
    assert(surv.length < 3,
      s"no cell pruned on a clustered corpus (survivors=${surv.mkString(",")})")
    // lossless: the surviving cells hold every true result
    val viaPrune = Ivf.loadLists(spark, tmp)
      .filter(col("cid").isin(surv: _*))
      .crossJoin(broadcast(qs))
      .select(col("vec_id"),
              expr("graft_sqdist12(embedding, qemb)").as("dist2"))
      .filter(col("dist2") <= r2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    val brute = e.crossJoin(broadcast(qs))
      .select(col("vec_id"),
              expr("graft_sqdist12(embedding, qemb)").as("dist2"))
      .filter(col("dist2") <= r2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(brute.nonEmpty, "clustered fixture returned no in-radius vectors")
    assert(viaPrune.toSeq === brute.toSeq, "prune dropped a true result")
  }
}
