package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Binary sparse-COO interop format — the reference ingests raw binary
  * sparse files alongside matrix-market (SURVEY.md §2.A A2). Layout
  * (little-endian):
  *
  *   magic "GCOO" | int32 version=1 | int64 nrow | int64 ncol
  *   | int64 nnz | nnz x (int64 row, int64 col, float64 v)
  *
  * Ids are 0-based. Reading distributes one FILE per task via Spark's
  * binaryFile source — a sharded dataset (many .gcoo parts) parallelizes
  * naturally; ingest at scale means sharding, exactly as the reference's
  * users shard their sparse dumps. Writing a fixture file is a
  * driver-side convenience (the engine's own persistence is parquet). */
object SparseBinary {

  private val Magic = 0x47434f4f // "GCOO"
  private val HeaderBytes = 4 + 4 + 8 + 8 + 8

  /** Read one or many .gcoo files (glob ok) into a COO DataFrame
    * (row, col, v). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        require(buf.getInt() == Magic, "not a GCOO file")
        require(buf.getInt() == 1, "unsupported GCOO version")
        buf.getLong(); buf.getLong() // nrow/ncol (shape travels in header)
        val nnz = buf.getLong()
        require(bytes.length >= HeaderBytes + nnz * 24,
          s"truncated GCOO file: $nnz triplets declared")
        (0L until nnz).iterator.map { _ =>
          (buf.getLong(), buf.getLong(), buf.getDouble())
        }
      }.toDF("row", "col", "v")
  }

  /** Write a single .gcoo fixture file on the driver (small matrices /
    * interop fixtures; shard + distribute for anything larger). */
  def writeSingle(df: DataFrame, path: String, nrow: Long, ncol: Long): Unit = {
    val rows = df.select("row", "col", "v").collect()
    val buf = ByteBuffer.allocate(HeaderBytes + rows.length * 24)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic).putInt(1).putLong(nrow).putLong(ncol)
      .putLong(rows.length.toLong)
    rows.foreach { r =>
      buf.putLong(r.getLong(0)).putLong(r.getLong(1)).putDouble(r.getDouble(2))
    }
    Files.write(Paths.get(path), buf.array())
  }
}
