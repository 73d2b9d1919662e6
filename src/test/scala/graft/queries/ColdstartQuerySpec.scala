package graft.queries

import graft.SparkSpec

/** Substitute correctness for q_bdf_coldstart (Oracle=NO — SQL cannot
  * express the Gibbs chain): determinism across runs, the exact cold
  * id x coord grid, and finite predictions. Cold-start QUALITY (side
  * info actually predicting unseen entities) is proven in GibbsSpec
  * on a fixture with real signal. */
class ColdstartQuerySpec extends SparkSpec {

  test("q_bdf_coldstart is deterministic and covers the cold grid exactly") {
    val dir = sf("sf0.01")
    val a = Bdf.qBdfColdstart(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = Bdf.qBdfColdstart(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq === b.toSeq, "cold-start prediction is not deterministic")
    assert(a.length === 20 * 16)
    assert(a.map(_._1).distinct.sorted === (80L until 100L).toArray,
      "cold ids are not exactly the held-out 80-99")
    assert(a.map(_._2).distinct.sorted === (0L until 16L).toArray)
    assert(a.forall(t => java.lang.Double.isFinite(t._3)),
      "non-finite cold-start prediction")
  }

  test("coldstart model artifact: content change re-trains, pure re-read serves bit-identically") {
    import org.apache.spark.sql.functions._
    val src = graft.Tables.embeddings(spark, sf("sf0.001"))
      .filter(col("vec_id") < 100).select(col("vec_id"), col("embedding"))
      .orderBy("vec_id")
    val root = java.nio.file.Files.createTempDirectory("coldstart_inval")
      .toString
    val (dirA, dirB) = (s"$root/a", s"$root/b")
    src.coalesce(1).write.parquet(s"$dirA/embeddings.parquet")
    // perturb ONE training cell (vec_id 5 is in the trained 0..79
    // range) hard enough that the re-trained model must move
    src.withColumn("embedding",
        when(col("vec_id") === 5,
          expr("transform(embedding, (x, i) -> CAST(IF(i = 0, x + 5.0f, x) AS FLOAT))"))
          .otherwise(col("embedding")))
      .coalesce(1).write.parquet(s"$dirB/embeddings.parquet")
    def rows(dir: String) = Bdf.qBdfColdstart(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // direction 1: the perturbed corpus mints a NEW content key, so a
    // fresh model is trained and the predictions move
    val keyA = graft.ArtifactStore.contentKey(s"$dirA/embeddings.parquet",
      "bdf-coldstart-k4-b3-s3-v1")
    val keyB = graft.ArtifactStore.contentKey(s"$dirB/embeddings.parquet",
      "bdf-coldstart-k4-b3-s3-v1")
    assert(keyA !== keyB, "content perturbation did not change the artifact key")
    val a1 = rows(dirA)
    assert(rows(dirB) !== a1,
      "perturbed training corpus served the SAME predictions — stale model")
    // direction 2: a pure re-read serves bit-identically WITHOUT
    // rebuilding (artifact files untouched)
    val artifact = new java.io.File(
      graft.ArtifactStore.cachePath("bdf_coldstart", keyA))
    assert(artifact.isDirectory, "artifact not published")
    def mtimes(f: java.io.File): Map[String, Long] = {
      def walk(x: java.io.File): Seq[java.io.File] =
        if (x.isDirectory) x.listFiles().toSeq.flatMap(walk) else Seq(x)
      walk(f).map(x => x.getPath -> x.lastModified()).toMap
    }
    val before = mtimes(artifact)
    assert(rows(dirA) === a1, "re-read served different predictions")
    assert(mtimes(artifact) === before,
      "a pure re-read rewrote the artifact (ensure re-ran the build)")
  }
}
