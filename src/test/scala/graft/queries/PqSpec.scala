package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Substitute quality checks for q_sim_ann_pq (its CORRECTNESS is
  * oracle-gated — the unrolled per-subspace Lloyd SQL — so this spec
  * pins the properties the oracle can't see): ANN recall against the
  * exact scan, run-to-run determinism, and the compression contract
  * (a 4-byte-code representation implies <=32 (sub, cid) codebook
  * entries and every vector encodable). */
class PqSpec extends SparkSpec {

  test("adc top-10 recalls most of the exact top-10 at sf0.01") {
    graft.expressions.VectorOps.register(spark)
    val dir = sf("sf0.01")
    val got = Ivf.qSimAnnPq(spark, dir).collect().map(_.getLong(0)).toSet
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val q0 = e.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
    val exact = e.crossJoin(broadcast(q0))
      .select(col("vec_id"),
        expr("graft_sqdist12(embedding, qemb)").as("d"))
      .orderBy(col("d").asc, col("vec_id").asc)
      .limit(10).collect().map(_.getLong(0)).toSet
    val recall = (got & exact).size
    assert(recall >= 8,
      s"PQ ADC+rerank recall@10 degraded to $recall/10 " +
        s"(ids $got vs exact $exact)")
  }

  test("adc scores are deterministic across runs and partitionings") {
    val dir = sf("sf0.01")
    val a = Ivf.qSimAnnPq(spark, dir).collect().map(_.toString).toSeq
    val b = Ivf.qSimAnnPq(spark, dir).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("ivfpq results come only from the probed cells and rank sanely") {
    graft.expressions.VectorOps.register(spark)
    graft.expressions.VecSum6.register(spark)
    val dir = sf("sf0.01")
    val got = Ivf.qSimAnnIvfPq(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 10)
    // results sorted by exact distance, query itself (dist 0) first
    assert(got.head._1 === 0L && got.head._2 === 0.0)
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.toSeq)
    // subset consistency: every result is a member of the query's
    // 2 probed coarse cells — the prune stage really prunes
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val q0 = e.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
    val cent = Llm.ivfLearnedCentroids(e)
    val memberIds = Llm.ivfAssign(e, cent)
      .join(broadcast(Llm.ivfQueryCells(q0, cent, 2)),
        col("cid") === col("qcid"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    got.foreach { case (id, _) =>
      assert(memberIds.contains(id), s"result $id is not in a probed cell")
    }
  }

  test("codebooks: 4 subspaces x 16 codes, every vector encodable") {
    graft.expressions.VectorOps.register(spark)
    graft.expressions.VecSum6.register(spark)
    val dir = sf("sf0.01")
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cb = Ivf.pqCodebooks(e, 4, 16, k = 16).collect()
    assert(cb.length == 64, s"expected 64 codebook rows, got ${cb.length}")
    assert(cb.map(r => (r.getInt(0), r.getLong(1))).toSet.size == 64)
    cb.foreach(r => assert(r.getSeq[Double](2).length == 16,
      "codebook centroid is not 16-dim"))
  }
}
