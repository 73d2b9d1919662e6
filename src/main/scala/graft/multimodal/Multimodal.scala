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
  * Decode dispatch: REAL jpg/png bytes (recognized by magic numbers)
  * decode through JDK ImageIO ([[ImageCodec]] — actual width, height,
  * channels, and a 16-bin luminance histogram as the feature vector),
  * and REAL RIFF/wav bytes parse through [[AudioCodec]] (header fields
  * + PCM amplitude histogram — plain byte reads, no codec libraries).
  * Payloads that are neither (the testdata synthesizes media bytes from
  * doc text) fall back to the deterministic [[StubCodec]], which derives
  * pseudo properties from the bytes so the pipeline stays testable
  * end-to-end in this codec-less container.
  */
object Multimodal {

  final case class Decoded(
      width: Int, height: Int, channels: Int, durationMs: Long,
      frames: Int, features: Array[Float])

  /** Real image decode via JDK ImageIO (jpg/png ship with the JDK). */
  object ImageCodec {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors

    private def isPng(b: Array[Byte]): Boolean =
      b.length > 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    private def isJpeg(b: Array[Byte]): Boolean =
      b.length > 3 && b(0) == 0xff.toByte && b(1) == 0xd8.toByte

    /** None when the bytes are not a decodable image — the caller falls
      * back to the stub (fail-soft: a corrupt image in a 100 TB corpus
      * must not kill the task). */
    def decode(bytes: Array[Byte]): Option[Decoded] =
      if (!isPng(bytes) && !isJpeg(bytes)) None
      else try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          // 16-bin luminance histogram, normalized — a real (if simple)
          // content feature; bounded work via pixel-stride sampling
          val w = img.getWidth; val h = img.getHeight
          val hist = new Array[Float](StubCodec.FeatureDim)
          val stride = math.max(1, math.sqrt(w.toLong * h / 4096.0).toInt)
          var n = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              hist(math.min(lum / 16, 15)) += 1f
              n += 1
              x += stride
            }
            y += stride
          }
          if (n > 0) { var i = 0; while (i < hist.length) { hist(i) /= n; i += 1 } }
          Some(Decoded(w, h, img.getColorModel.getNumComponents, 0L, 1, hist))
        }
      } catch { case _: Exception => None }
  }

  /** Real RIFF/WAVE header + PCM decode — pure byte reads, no codec
    * libraries needed: the fmt chunk carries channels/sample-rate/
    * bits-per-sample, the data chunk length gives the exact duration,
    * and the features are a 16-bin normalized amplitude histogram over
    * stride-sampled PCM (bounded work per file, like ImageCodec's pixel
    * stride). Mirrors the ImageIO path: magic-number dispatch, None on
    * anything malformed (fail-soft — a corrupt file in a 100 TB corpus
    * must not kill the task). */
  object AudioCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    private def isRiffWave(b: Array[Byte]): Boolean =
      b.length > 44 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    def decode(bytes: Array[Byte]): Option[Decoded] =
      if (!isRiffWave(bytes)) None
      else try {
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        var channels = 0; var sampleRate = 0; var byteRate = 0
        var bitsPerSample = 0; var dataOff = -1; var dataLen = 0
        var off = 12
        while (off + 8 <= bytes.length) {
          val id = new String(bytes, off, 4, "US-ASCII")
          val size = bb.getInt(off + 4)
          if (size < 0) return None
          if (id == "fmt " && off + 24 <= bytes.length) {
            channels = bb.getShort(off + 10).toInt
            sampleRate = bb.getInt(off + 12)
            byteRate = bb.getInt(off + 16)
            bitsPerSample = bb.getShort(off + 22).toInt
          } else if (id == "data") {
            dataOff = off + 8
            dataLen = math.min(size.toLong, (bytes.length - dataOff).toLong).toInt
          }
          off += 8 + size + (size & 1) // chunks are word-aligned
        }
        if (channels <= 0 || byteRate <= 0 || dataOff < 0) None
        else {
          val durationMs = dataLen * 1000L / byteRate
          val hist = new Array[Float](StubCodec.FeatureDim)
          val bytesPerSample = math.max(1, bitsPerSample / 8)
          val nSamples = dataLen / bytesPerSample
          val stride = math.max(1, nSamples / 4096)
          var n = 0; var s = 0
          while (s < nSamples) {
            val p = dataOff + s * bytesPerSample
            val bin =
              if (bitsPerSample == 16 && p + 1 < bytes.length)
                (bb.getShort(p) + 32768) / 4096
              else (bytes(p) & 0xff) / 16
            hist(math.min(math.max(bin, 0), 15)) += 1f
            n += 1
            s += stride
          }
          if (n > 0) { var i = 0; while (i < hist.length) { hist(i) /= n; i += 1 } }
          Some(Decoded(0, 0, channels, durationMs, 0, hist))
        }
      } catch { case _: Exception => None }
  }

  /** Real ISO-BMFF (mp4/mov) box walk — pure byte reads, no demuxer
    * libraries: ftyp magic dispatch, mvhd timescale/duration for the
    * exact duration_ms, each mdat box treated as a frame payload
    * (true per-frame enumeration needs an stbl/avcC parse — a real
    * codec; geometry therefore stays 0 and n_frames = mdat count,
    * exactly the slots a production decode UDF fills in). Features:
    * 16-bin byte histogram over stride-sampled mdat payload — the
    * frame-sample stage of a video curation pipeline, bounded work per
    * file. Fail-soft like the other codecs: None on anything
    * malformed, caller falls back to the stub. */
  object VideoCodec {
    private def beInt(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

    private def isBmff(b: Array[Byte]): Boolean =
      b.length > 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    private def beLong(b: Array[Byte], off: Int): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      v
    }

    def decode(bytes: Array[Byte]): Option[Decoded] =
      if (!isBmff(bytes)) None
      else try {
        var durationMs = 0L
        var frames = 0
        val hist = new Array[Float](StubCodec.FeatureDim)
        var n = 0
        var bad = false
        def walk(lo: Int, hi: Int, depth: Int): Unit = {
          var off = lo
          while (!bad && off + 8 <= hi) {
            // ISO-BMFF size encodings: 0 = box extends to end of the
            // enclosing space (valid for the LAST box), 1 = 64-bit
            // largesize follows the type field; otherwise the 32-bit
            // size covers header + payload. A size that cannot be
            // resolved marks the WHOLE file malformed (bad=true ->
            // decode None -> stub path), never a silent partial parse.
            val size32 = beInt(bytes, off)
            val (boxEnd, pLo) =
              if (size32 == 0L) (hi.toLong, (off + 8).toLong)
              else if (size32 == 1L) {
                if (off + 16 > hi) (-1L, -1L)
                else (off + beLong(bytes, off + 8), (off + 16).toLong)
              } else ((off + size32), (off + 8).toLong)
            if (pLo < 0 || boxEnd < pLo || boxEnd > hi) bad = true
            else {
              val tp = new String(bytes, off + 4, 4, "US-ASCII")
              val payLo = pLo.toInt; val payHi = boxEnd.toInt
              tp match {
                case "moov" if depth < 4 =>
                  walk(payLo, payHi, depth + 1)
                case "mvhd" =>
                  // version(1) flags(3) ctime(4) mtime(4) timescale(4)
                  // duration(4) — version-0 layout
                  if (payLo + 20 <= payHi && bytes(payLo) == 0) {
                    val ts = beInt(bytes, payLo + 12)
                    val dur = beInt(bytes, payLo + 16)
                    if (ts > 0) durationMs = dur * 1000L / ts
                  }
                case "mdat" =>
                  frames += 1
                  val stride = math.max(1, (payHi - payLo) / 512)
                  var p = payLo
                  while (p < payHi) {
                    hist((bytes(p) & 0xff) / 16) += 1f
                    n += 1
                    p += stride
                  }
                case _ =>
              }
              off = payHi max (off + 8) // size==0 consumed the rest
            }
          }
        }
        walk(0, bytes.length, 0)
        if (bad || (frames == 0 && durationMs == 0L)) None
        else {
          if (n > 0) { var i = 0; while (i < hist.length) { hist(i) /= n; i += 1 } }
          Some(Decoded(0, 0, 0, durationMs, frames, hist))
        }
      } catch { case _: Exception => None }
  }

  /** STUB fallback for bytes that are not real media (the testdata
    * synthesizes media payloads from doc text): derives deterministic
    * pseudo "decoded" properties from the byte content so the pipeline
    * is testable end-to-end. */
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
        case "wav" => Decoded(0, 0, 1, 1000L + mix(99) % 60000L, 0, feats)
        case "mp4" => Decoded(0, 0, 0, 1000L + mix(99) % 60000L,
                              1 + (mix(3) % 240L).toInt, feats)
        case _     => Decoded(64 + (mix(1) % 448L).toInt,
                              64 + (mix(2) % 448L).toInt, 3, 0L, 1, feats)
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
      when(col("doc_id") % 4 === 0, "jpg")
        .when(col("doc_id") % 4 === 1, "png")
        .when(col("doc_id") % 4 === 2, "wav")
        .otherwise("mp4").as("format"))

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
          val d = fmt match {
            case "jpg" | "png" =>
              ImageCodec.decode(bytes).getOrElse(StubCodec.decode(bytes, fmt))
            case "wav" =>
              AudioCodec.decode(bytes).getOrElse(StubCodec.decode(bytes, fmt))
            case "mp4" =>
              VideoCodec.decode(bytes).getOrElse(StubCodec.decode(bytes, fmt))
            case _ => StubCodec.decode(bytes, fmt)
          }
          (id, fmt, bytes.length.toLong, d.width, d.height, d.channels,
            d.durationMs, d.frames, d.features)
        }
      }
    }.toDF("doc_id", "format", "n_bytes", "width", "height", "channels",
           "duration_ms", "n_frames", "features")
  }

  /** Image resize — the thumbnail/normalization stage every vision
    * training pipeline runs before embedding. Real jpg/png bytes decode
    * through ImageIO and box-resample their LUMINANCE plane to a fixed
    * thumbW x thumbH grid with exact integer arithmetic (per-cell pixel
    * box bounds by floor division, cell value = lum sum div count — no
    * float filter kernels, so the output is bit-stable across JVMs for
    * lossless inputs); non-image bytes fall back to a deterministic
    * stub grid so the stage is testable end-to-end without real media.
    * Resize runs where the bytes live (mapPartitions batches, no
    * shuffle) — at 100 TB this is a narrow map over the scan, same as
    * [[decodeAndFeaturize]]. */
  object Resize {
    /** (inW, inH, cells 0..255 row-major) for a decodable image. */
    def thumbOf(bytes: Array[Byte], thumbW: Int, thumbH: Int)
        : Option[(Int, Int, Array[Int])] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val cells = new Array[Int](thumbW * thumbH)
          var cy = 0
          while (cy < thumbH) {
            val y0 = cy * h / thumbH; val y1 = math.max((cy + 1) * h / thumbH, y0 + 1)
            var cx = 0
            while (cx < thumbW) {
              val x0 = cx * w / thumbW; val x1 = math.max((cx + 1) * w / thumbW, x0 + 1)
              var sum = 0L; var n = 0L
              var y = y0
              while (y < math.min(y1, h)) {
                var x = x0
                while (x < math.min(x1, w)) {
                  val rgb = img.getRGB(x, y)
                  sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                    (rgb & 0xff) * 114) / 1000
                  n += 1
                  x += 1
                }
                y += 1
              }
              cells(cy * thumbW + cx) = if (n == 0) 0 else (sum / n).toInt
              cx += 1
            }
            cy += 1
          }
          Some((w, h, cells))
        }
      } catch { case _: Exception => None }

    /** Deterministic stub grid for non-image bytes (same mixing
      * discipline as [[StubCodec]]). */
    def stubThumb(bytes: Array[Byte], thumbW: Int, thumbH: Int): Array[Int] = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      Array.tabulate(thumbW * thumbH) { k =>
        var z = h + k * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (((z ^ (z >>> 27)) & Long.MaxValue) % 256L).toInt
      }
    }
  }

  /** The resize stage as a partition-batched map: one typed row per
    * media item with input geometry, the fixed output geometry, and
    * the exact-integer thumb cells. `decoded` marks which path ran
    * (real ImageIO vs stub) — a production pipeline alerts on the
    * stub/corrupt rate. */
  def resizeStage(spark: SparkSession, media: DataFrame,
                  thumbW: Int = 8, thumbH: Int = 8,
                  batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte], String)] =
      media.select(col("doc_id").cast("long"), col("content"), col("format"))
        .as[(Long, Array[Byte], String)]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { case (id, bytes, fmt) =>
          val real =
            if (fmt == "jpg" || fmt == "png") Resize.thumbOf(bytes, thumbW, thumbH)
            else None
          real match {
            case Some((w, h, cells)) =>
              (id, fmt, w, h, thumbW, thumbH, cells, true)
            case None =>
              val d = StubCodec.decode(bytes, fmt)
              (id, fmt, d.width, d.height, thumbW, thumbH,
                Resize.stubThumb(bytes, thumbW, thumbH), false)
          }
        }
      }
    }.toDF("doc_id", "format", "in_w", "in_h", "out_w", "out_h",
           "thumb", "decoded")
  }

  /** Perceptual hash (average-hash) per image item — the pixel-space
    * signature that catches re-encoded/renamed duplicate images exact
    * byte hashing misses: 64-bit hash over the [[resizeStage]] 8×8
    * luminance thumb (bit k set iff cell k exceeds the integer-floor
    * cell mean). Pure integer arithmetic end-to-end, so the hash is
    * bit-stable across partitionings; identical pixels ⇒ identical
    * hash regardless of container bytes (MultimodalSpec pins a
    * png-vs-reencoded-png fixture through the REAL ImageIO path).
    * The hash math rides Spark higher-order functions over the thumb
    * array — post-decode, one narrow pass, no shuffle. */
  def phashStage(spark: SparkSession, media: DataFrame): DataFrame =
    resizeStage(spark, media, 8, 8)
      .withColumn("m",
        expr("aggregate(thumb, 0L, (a, x) -> a + x) div 64"))
      .select(col("doc_id"), col("format"),
        expr("aggregate(zip_with(thumb, sequence(0, 63), " +
             "(c, i) -> IF(c > m, shiftleft(1L, CAST(i AS INT)), 0L)), " +
             "0L, (a, x) -> a + x)").as("ahash"),
        col("decoded"))

  /** Frame sampling — the "every k-th frame" stage of a video curation
    * pipeline. Real ISO-BMFF bytes enumerate their mdat payload boxes
    * (the same walk as [[VideoCodec]]) and emit up to `maxFrames`
    * evenly-strided frames with exact payload statistics; non-video
    * bytes emit deterministic stub frames sized by the stub's
    * pseudo frame count. One row PER SAMPLED FRAME (bounded by
    * maxFrames per item), computed where the bytes live — no shuffle,
    * no driver loop. */
  /** The sampled-frame SELECTION shared by [[frameSample]] and
    * [[frameHashStage]] — one place owns the mdat-walk dispatch and
    * the evenly-strided index rule, so the frame-sample face and the
    * video dedup/near signatures can never drift on WHICH frames they
    * look at. `real` is Some(boxes) when the ISO-BMFF walk resolved
    * (index with `sampled`), None on the stub path. */
  private final case class FrameSel(nTotal: Int, sampled: Seq[Int],
                                    real: Option[IndexedSeq[(Int, Int)]])
  private def sampledFrames(bytes: Array[Byte], fmt: String,
                            maxFrames: Int): FrameSel = {
    val boxes = if (fmt == "mp4") mdatBoxes(bytes) else Nil
    val n =
      if (boxes.nonEmpty) boxes.length
      else math.max(StubCodec.decode(bytes, fmt).frames, 1)
    val stride = math.max(1, (n + maxFrames - 1) / maxFrames)
    FrameSel(n, 0 until n by stride,
             if (boxes.nonEmpty) Some(boxes.toIndexedSeq) else None)
  }

  def frameSample(spark: SparkSession, media: DataFrame,
                  maxFrames: Int = 4, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    require(maxFrames > 0, "maxFrames must be positive")
    val ds: Dataset[(Long, Array[Byte], String)] =
      media.select(col("doc_id").cast("long"), col("content"), col("format"))
        .as[(Long, Array[Byte], String)]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { case (id, bytes, fmt) =>
          val sel = sampledFrames(bytes, fmt, maxFrames)
          sel.real match {
            case Some(boxes) =>
              sel.sampled.map { fi =>
                val (off, len) = boxes(fi)
                var sum = 0L
                var p = off
                while (p < off + len) { sum += (bytes(p) & 0xff); p += 1 }
                (id, fmt, fi, sel.nTotal, len.toLong, sum, true)
              }
            case None =>
              sel.sampled.map { fi =>
                var z = (id * 0x9e3779b97f4a7c15L) + fi
                z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
                val len = 32L + ((z ^ (z >>> 27)) & Long.MaxValue) % 4096L
                (id, fmt, fi, sel.nTotal, len, len * 127L, false)
              }
          }
        }
      }
    }.toDF("doc_id", "format", "frame_idx", "n_frames_total",
           "n_frame_bytes", "byte_sum", "decoded")
  }

  /** 64-bit FNV-1a over a byte range — the per-frame content hash of
    * [[frameHashStage]]. Pure integer arithmetic, bit-stable across
    * JVMs and partitionings. */
  private def fnv64(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var p = off
    while (p < off + len) { h = (h ^ (bytes(p) & 0xff)) * 0x100000001b3L; p += 1 }
    h
  }

  /** Per-item FRAME-HASH signature — the video-dedup feature stage:
    * the same evenly-strided sampling as [[frameSample]], but each
    * sampled frame reduced to a 64-bit FNV-1a hash of its PAYLOAD
    * bytes, one row per item carrying the ordered hash array. The
    * hash keys on frame CONTENT, not container framing, so two clips
    * whose mdat payloads agree hash identically even when their
    * ftyp/moov metadata, box ordering, or size encodings differ
    * (byte-md5 dedup cannot see that — the same container-robustness
    * argument as [[phashStage]] for images and [[audioEnvelope]] for
    * audio, one level up: per-FRAME). Non-video bytes take the
    * deterministic stub path ([[StubCodec]] mixing, so stub items are
    * pairwise distinct). ~40 B signature per item on the wire, never
    * frame bytes; computed where the bytes live (partition-batched
    * map, no shuffle). */
  def frameHashStage(spark: SparkSession, media: DataFrame,
                     maxFrames: Int = 4, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    require(maxFrames > 0, "maxFrames must be positive")
    val ds: Dataset[(Long, Array[Byte], String)] =
      media.select(col("doc_id").cast("long"), col("content"), col("format"))
        .as[(Long, Array[Byte], String)]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { case (id, bytes, fmt) =>
          val sel = sampledFrames(bytes, fmt, maxFrames)
          val hashes = sel.real match {
            case Some(boxes) =>
              sel.sampled.map { fi =>
                val (off, len) = boxes(fi)
                fnv64(bytes, off, len)
              }
            case None =>
              // stub hashes derive from the BYTES (never the id), the
              // [[Resize.stubThumb]] discipline: byte-identical items
              // must carry identical signatures so the dedup faces can
              // group them even on the stub path
              val h0 = fnv64(bytes, 0, bytes.length)
              sel.sampled.map { fi =>
                var z = h0 + fi * 0x9e3779b97f4a7c15L
                z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
                z ^ (z >>> 27)
              }
          }
          (id, fmt, sel.nTotal.toLong, hashes.toArray,
           sel.real.isDefined)
        }
      }
    }.toDF("doc_id", "format", "n_frames_total", "frame_hashes", "decoded")
  }

  /** (offset, length) of every top-level mdat payload in an ISO-BMFF
    * byte stream; Nil when the bytes are not BMFF — or when any box
    * size cannot be resolved (the caller then takes the stub path
    * cleanly instead of acting on a silently-truncated frame list).
    * Resolves all three size encodings: 0 = box extends to EOF (last
    * box), 1 = 64-bit largesize after the type, else the 32-bit size. */
  private[multimodal] def mdatBoxes(bytes: Array[Byte]): List[(Int, Int)] = {
    def beInt(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def beLong(off: Int): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
      v
    }
    if (bytes.length <= 12 || bytes(4) != 'f' || bytes(5) != 't' ||
        bytes(6) != 'y' || bytes(7) != 'p') Nil
    else try {
      var acc = List.empty[(Int, Int)]
      var off = 0
      while (off + 8 <= bytes.length) {
        val size32 = beInt(off)
        val (boxEnd, payloadOff) =
          if (size32 == 0L) (bytes.length.toLong, (off + 8).toLong)
          else if (size32 == 1L) {
            if (off + 16 > bytes.length) return Nil
            (off + beLong(off + 8), (off + 16).toLong)
          } else ((off + size32), (off + 8).toLong)
        if (boxEnd < payloadOff || boxEnd > bytes.length) return Nil
        if (bytes(off + 4) == 'm' && bytes(off + 5) == 'd' &&
            bytes(off + 6) == 'a' && bytes(off + 7) == 't')
          acc ::= ((payloadOff.toInt, (boxEnd - payloadOff).toInt))
        off = boxEnd.toInt max (off + 8) // size==0 consumed the rest
      }
      acc.reverse
    } catch { case _: Exception => Nil }
  }

  /** The ONE RIFF/WAVE container parse both audio stages consume —
    * magic check, word-aligned chunk walk with the negative-size
    * guard, fmt field offsets, data-chunk clamp, and the shared
    * signed-sample decode (16-bit LE when it fits, else the byte as
    * unsigned-8 centered at 128 — the near-EOF fallback). A single
    * definition site so [[Envelope]] and [[Spectrum]] can never
    * disagree on which bytes are "real audio" for the same item. */
  private[multimodal] object Riff {
    import java.nio.{ByteBuffer, ByteOrder}

    final case class Wav(bytes: Array[Byte], bb: ByteBuffer,
                         channels: Int, sampleRate: Int, byteRate: Int,
                         bitsPerSample: Int, dataOff: Int, dataLen: Int) {
      def bytesPerSample: Int = math.max(1, bitsPerSample / 8)
      def nSamples: Int = dataLen / bytesPerSample
      /** Signed PCM sample s. */
      def sampleAt(s: Long): Int = {
        val p = dataOff + (s * bytesPerSample).toInt
        if (bitsPerSample == 16 && p + 1 < bytes.length) bb.getShort(p).toInt
        else (bytes(p) & 0xff) - 128
      }
    }

    /** None on anything malformed; field VALIDITY (channels > 0, a
      * data chunk present, ...) is the caller's per-stage check. */
    def parse(bytes: Array[Byte]): Option[Wav] =
      if (!(bytes.length > 44 &&
            bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
            bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'))
        None
      else try {
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        var channels = 0; var sampleRate = 0; var byteRate = 0
        var bitsPerSample = 0; var dataOff = -1; var dataLen = 0
        var off = 12
        while (off + 8 <= bytes.length) {
          val id = new String(bytes, off, 4, "US-ASCII")
          val size = bb.getInt(off + 4)
          if (size < 0) return None
          if (id == "fmt " && off + 24 <= bytes.length) {
            channels = bb.getShort(off + 10).toInt
            sampleRate = bb.getInt(off + 12)
            byteRate = bb.getInt(off + 16)
            bitsPerSample = bb.getShort(off + 22).toInt
          } else if (id == "data") {
            dataOff = off + 8
            dataLen = math.min(size.toLong, (bytes.length - dataOff).toLong).toInt
          }
          off += 8 + size + (size & 1) // chunks are word-aligned
        }
        Some(Wav(bytes, bb, channels, sampleRate, byteRate, bitsPerSample,
          dataOff, dataLen))
      } catch { case _: Exception => None }
  }

  /** Fixed-bin loudness envelope — the audio twin of [[Resize]]: real
    * RIFF/WAVE bytes split their PCM sample stream into `nBins` equal
    * time bins and report each bin's mean absolute amplitude with
    * exact integer arithmetic (bin bounds by floor division, value =
    * sum |sample| div count — bit-stable across JVMs). 16-bit PCM
    * amplitudes land in 0..32768, 8-bit (unsigned) in 0..128.
    * Interleaved channels contribute to the same bin (a mono mixdown
    * of absolute loudness), so the envelope is channel-count-agnostic.
    * Per-bin work is stride-bounded like the other codecs. */
  object Envelope {

    /** (channels, sampleRate, durationMs, bins) for real RIFF/WAVE
      * bytes; None on anything malformed (caller falls back to the
      * stub — fail-soft like every codec here). */
    def envelopeOf(bytes: Array[Byte], nBins: Int): Option[(Int, Int, Long, Array[Int])] =
      Riff.parse(bytes).flatMap { w =>
        if (w.channels <= 0 || w.byteRate <= 0 || w.dataOff < 0 || nBins <= 0)
          None
        else try {
          val durationMs = w.dataLen * 1000L / w.byteRate
          val nSamples = w.nSamples
          val bins = new Array[Int](nBins)
          var k = 0
          while (k < nBins) {
            val s0 = k.toLong * nSamples / nBins
            val s1 = (k + 1).toLong * nSamples / nBins
            val stride = math.max(1L, (s1 - s0) / 1024)
            var sum = 0L; var n = 0L
            var s = s0
            while (s < s1) {
              sum += math.abs(w.sampleAt(s))
              n += 1
              s += stride
            }
            bins(k) = if (n == 0) 0 else (sum / n).toInt
            k += 1
          }
          Some((w.channels, w.sampleRate, durationMs, bins))
        } catch { case _: Exception => None }
      }

    /** Deterministic stub envelope for non-audio bytes (same mixing
      * discipline as [[StubCodec]]; values in the 16-bit 0..32768
      * amplitude range). */
    def stubEnvelope(bytes: Array[Byte], nBins: Int): Array[Int] = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      Array.tabulate(nBins) { k =>
        var z = h + k * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (((z ^ (z >>> 27)) & Long.MaxValue) % 32769L).toInt
      }
    }
  }

  /** Square-wave SPECTRUM — the frequency-domain stage the envelope
    * can't substitute for: per time bin, the magnitudes of the PCM
    * stream's correlation with square waves (Rademacher functions) of
    * period 4/8/16/32 samples — the exact-integer cousin of per-bin
    * Goertzel DFT magnitudes (a square-wave filter bank is the classic
    * integer-only frequency probe; its fundamental tracks the DFT bin
    * at the same period). All arithmetic is integer, like [[Envelope]].
    *
    * The emitted value is mag * 1024 div binEnergy — and that floor
    * ratio is EXACTLY invariant under integer re-gain: scaling every
    * sample by g scales mag and energy both by g, and
    * floor((g*m*1024)/(g*e)) == floor((m*1024)/e). So two takes of the
    * same audio at different volumes carry the SAME spectral signature
    * while their loudness envelopes differ — the re-gain dup case
    * envelope-keyed dedup misses by construction (MultimodalSpec pins
    * exactly that pair, plus frequency selectivity on a pure tone). */
  object Spectrum {

    /** Correlation window cap per time bin — bounds per-item work the
      * way Envelope's stride does (striding would break square-wave
      * phase alignment, so the spectrum caps the window instead). */
    private val MaxWindow = 4096L

    val Periods: Array[Int] = Array(4, 8, 16, 32)

    /** (channels, sampleRate, flattened nTimeBins x Periods.length
      * normalized magnitudes) through the shared [[Riff]] parse; None
      * on malformed bytes (caller falls back to the stub). */
    def spectrumOf(bytes: Array[Byte], nTimeBins: Int)
        : Option[(Int, Int, Array[Int])] =
      Riff.parse(bytes).flatMap { w =>
        if (w.channels <= 0 || w.dataOff < 0 || nTimeBins <= 0) None
        else try {
          val nSamples = w.nSamples
          val out = new Array[Int](nTimeBins * Periods.length)
          var k = 0
          while (k < nTimeBins) {
            val s0 = k.toLong * nSamples / nTimeBins
            val s1 = math.min((k + 1).toLong * nSamples / nTimeBins,
                              s0 + MaxWindow)
            var energy = 0L
            val acc = new Array[Long](Periods.length)
            var s = s0
            while (s < s1) {
              val v = w.sampleAt(s)
              energy += math.abs(v)
              var f = 0
              while (f < Periods.length) {
                val half = Periods(f) / 2
                // Rademacher sign: +1 on even half-periods (phase
                // anchored at the BIN start so the signature is a pure
                // function of the bin's samples)
                if ((((s - s0) / half) & 1L) == 0L) acc(f) += v
                else acc(f) -= v
                f += 1
              }
              s += 1
            }
            var f = 0
            while (f < Periods.length) {
              out(k * Periods.length + f) =
                if (energy == 0L) 0
                else (math.abs(acc(f)) * 1024L / energy).toInt
              f += 1
            }
            k += 1
          }
          Some((w.channels, w.sampleRate, out))
        } catch { case _: Exception => None }
      }

    /** Deterministic stub spectrum for non-audio bytes (same mixing
      * discipline as [[Envelope.stubEnvelope]]; values in the
      * normalized 0..1024 range). */
    def stubSpectrum(bytes: Array[Byte], n: Int): Array[Int] = {
      var h = 741103597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      Array.tabulate(n) { k =>
        var z = h + k * 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        (((z ^ (z >>> 27)) & Long.MaxValue) % 1025L).toInt
      }
    }
  }

  /** The spectral stage as a partition-batched map, same shape as
    * [[audioEnvelope]]: one row per media item with the flattened
    * nTimeBins x 4-period normalized magnitudes and the decode-path
    * flag. Runs where the bytes live — no shuffle, no driver loop;
    * ~8+4*nTimeBins*4 B per item on the wire, never PCM. */
  def audioSpectrum(spark: SparkSession, media: DataFrame,
                    nTimeBins: Int = 8, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    require(nTimeBins > 0, "nTimeBins must be positive")
    val nOut = nTimeBins * Spectrum.Periods.length
    val ds: Dataset[(Long, Array[Byte], String)] =
      media.select(col("doc_id").cast("long"), col("content"), col("format"))
        .as[(Long, Array[Byte], String)]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { case (id, bytes, fmt) =>
          val real =
            if (fmt == "wav") Spectrum.spectrumOf(bytes, nTimeBins) else None
          real match {
            case Some((ch, sr, spec)) =>
              (id, fmt, ch, sr, nTimeBins, spec, true)
            case None =>
              val d = StubCodec.decode(bytes, fmt)
              (id, fmt, d.channels, 0, nTimeBins,
                Spectrum.stubSpectrum(bytes, nOut), false)
          }
        }
      }
    }.toDF("doc_id", "format", "channels", "sample_rate", "n_tbins",
           "spectrum", "decoded")
  }

  /** The audio-envelope stage as a partition-batched map: one typed
    * row per media item with stream properties and the exact-integer
    * loudness bins. `decoded` marks which path ran (real RIFF parse vs
    * stub) — a production pipeline alerts on the stub/corrupt rate.
    * Runs where the bytes live (no shuffle, no driver loop), same
    * shape as [[resizeStage]] / [[frameSample]]. */
  def audioEnvelope(spark: SparkSession, media: DataFrame,
                    nBins: Int = 16, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    require(nBins > 0, "nBins must be positive")
    val ds: Dataset[(Long, Array[Byte], String)] =
      media.select(col("doc_id").cast("long"), col("content"), col("format"))
        .as[(Long, Array[Byte], String)]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { case (id, bytes, fmt) =>
          val real =
            if (fmt == "wav") Envelope.envelopeOf(bytes, nBins) else None
          real match {
            case Some((ch, sr, durMs, bins)) =>
              (id, fmt, ch, sr, durMs, nBins, bins, true)
            case None =>
              val d = StubCodec.decode(bytes, fmt)
              (id, fmt, d.channels, 0, d.durationMs, nBins,
                Envelope.stubEnvelope(bytes, nBins), false)
          }
        }
      }
    }.toDF("doc_id", "format", "channels", "sample_rate", "duration_ms",
           "n_bins", "envelope", "decoded")
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
