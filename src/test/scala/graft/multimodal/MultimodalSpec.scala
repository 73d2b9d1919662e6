package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The multimodal plumbing must behave like a production decode stage:
  * deterministic, schema-stable, and invariant to batch size and input
  * partitioning (a narrow map — results never depend on physical
  * layout). */
class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.withMediaColumns(
    graft.Tables.documents(spark, sf("sf0.001")))

  test("decode emits one typed row per media item with fixed feature dim") {
    val out = Multimodal.decodeAndFeaturize(spark, media)
    assert(out.count() === media.count())
    assert(out.columns.toSeq === Seq("doc_id", "format", "n_bytes", "width",
      "height", "channels", "duration_ms", "features"))
    val dims = out.select(size(col("features"))).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq === Seq(Multimodal.StubCodec.FeatureDim))
    // wav rows carry duration, image rows carry dimensions
    val wav = out.filter(col("format") === "wav")
    assert(wav.filter(col("duration_ms") <= 0).count() === 0)
    val img = out.filter(col("format") =!= "wav")
    assert(img.filter(col("width") < 64 || col("height") < 64).count() === 0)
  }

  test("decode is invariant to batch size and input partitioning") {
    val a = Multimodal.decodeAndFeaturize(spark, media, batchSize = 64)
      .orderBy("doc_id").collect()
    val b = Multimodal.decodeAndFeaturize(spark, media.repartition(7), batchSize = 1)
      .orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("feature stats aggregate per format deterministically") {
    val out = Multimodal.featureStats(
      Multimodal.decodeAndFeaturize(spark, media))
    assert(out.count() === 3L * Multimodal.StubCodec.FeatureDim)
  }
}
