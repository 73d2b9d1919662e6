package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a large-scale training-data pipeline:
  * image/audio/video payloads ride as opaque BINARY columns with typed
  * metadata, and decode / feature-extract runs as a partition-batched
  * map over those bytes — the Scala analog of a Pandas-UDF/mapInPandas
  * stage: one batch at a time per partition, no driver collection, the
  * output schema fixed and columnar-friendly.
  *
  * The DECODE ITSELF IS STUBBED (`StubCodec`): this container has no
  * image/audio codecs, so the codec derives deterministic pseudo
  * "decoded" properties from the bytes. Swapping in a real codec means
  * replacing StubCodec.decode only — schema, batching, partitioning and
  * the query surface stay as-is.
  */
object Multimodal {

  final case class Decoded(
      width: Int, height: Int, channels: Int, durationMs: Long,
      features: Array[Float])

  /** STUB: a real implementation would dispatch on format to an image/
    * audio decoder. This deterministic fake derives shape/feature values
    * from the byte content so the pipeline is testable end-to-end. */
  object StubCodec {
    val FeatureDim = 16

    def decode(bytes: Array[Byte], format: String): Decoded = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      def mix(k: Int): Long = {
        var z = h + k * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (z ^ (z >>> 27)) & Long.MaxValue
      }
      val feats = Array.tabulate(FeatureDim)(k =>
        ((mix(k) % 2000000L) - 1000000L).toFloat / 1000000.0f)
      format match {
        case "wav" => Decoded(0, 0, 1, 1000L + mix(99) % 60000L, feats)
        case _     => Decoded(64 + (mix(1) % 448L).toInt,
                              64 + (mix(2) % 448L).toInt, 3, 0L, feats)
      }
    }
  }

  /** Attach media columns to a DataFrame: content as BINARY + a format
    * tag (here synthesized from doc text — the testdata carries no real
    * media; a production ingest would read the bytes from object
    * storage). */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, "jpg")
        .when(col("doc_id") % 3 === 1, "png")
        .otherwise("wav").as("format"))

  /** The mapInPandas-shaped stage: per partition, decode in bounded
    * batches and emit a typed row per media item. Runs wherever the
    * bytes already live — no shuffle, no driver loop; at 100 TB this is
    * a narrow map over the scan. */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame,
                         batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte], String)] =
      media.select(col("doc_id").cast("long"), col("content"), col("format"))
        .as[(Long, Array[Byte], String)]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { case (id, bytes, fmt) =>
          val d = StubCodec.decode(bytes, fmt)
          (id, fmt, bytes.length.toLong, d.width, d.height, d.channels,
            d.durationMs, d.features)
        }
      }
    }.toDF("doc_id", "format", "n_bytes", "width", "height", "channels",
           "duration_ms", "features")
  }

  /** Downstream example: per-format feature statistics (what a curation
    * pipeline aggregates after embedding extraction). */
  def featureStats(decoded: DataFrame): DataFrame =
    decoded
      .select(col("format"), posexplode(col("features")).as(Seq("pos", "x")))
      .groupBy("format", "pos")
      .agg(count(lit(1)).as("n"),
           sum(col("x").cast("double").cast("decimal(18,6)")).cast("double")
             .as("sum_x"))
      .orderBy("format", "pos")
}
