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
      "height", "channels", "duration_ms", "n_frames", "features"))
    val dims = out.select(size(col("features"))).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq === Seq(Multimodal.StubCodec.FeatureDim))
    // wav rows carry duration, image rows carry dimensions
    val wav = out.filter(col("format") === "wav")
    assert(wav.filter(col("duration_ms") <= 0).count() === 0)
    val img = out.filter(col("format") === "jpg" || col("format") === "png")
    assert(img.filter(col("width") < 64 || col("height") < 64).count() === 0)
    // video rows carry duration AND a frame count
    val vid = out.filter(col("format") === "mp4")
    assert(vid.count() > 0)
    assert(vid.filter(col("duration_ms") <= 0 || col("n_frames") <= 0).count() === 0)
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
    assert(out.count() === 4L * Multimodal.StubCodec.FeatureDim)
  }

  /** Encode a real image in-memory and check the ImageIO path reports
    * its true geometry (not the stub's byte-derived pseudo shape). */
  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 37 + y * 101) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("real png/jpg bytes decode through ImageIO with true geometry") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (0L, imageBytes("png", 7, 5), "png"),
      (1L, imageBytes("jpg", 9, 4), "jpg"),
      (2L, "not an image".getBytes("UTF-8"), "png"))
    val df = rows.toDF("doc_id", "content", "format")
    val out = Multimodal.decodeAndFeaturize(spark, df)
      .orderBy("doc_id").collect()
    assert((out(0).getAs[Int]("width"), out(0).getAs[Int]("height"),
            out(0).getAs[Int]("channels")) === ((7, 5, 3)))
    assert((out(1).getAs[Int]("width"), out(1).getAs[Int]("height"),
            out(1).getAs[Int]("channels")) === ((9, 4, 3)))
    // histogram features: normalized mass sums to ~1 over a real image
    val feats = out(0).getAs[scala.collection.Seq[Float]]("features")
    assert(math.abs(feats.sum - 1.0f) < 1e-3)
    // non-image bytes tagged as png fall back to the stub, not a crash
    assert(out(2).getAs[Int]("width") >= 64)
  }

  /** Build a minimal valid RIFF/WAVE in-memory: 16-bit mono PCM,
    * sampleRate Hz, nSamples frames of a deterministic ramp. */
  private def wavBytes(sampleRate: Int, channels: Int,
                       nSamples: Int): Array[Byte] = {
    val bps = 2 * channels
    val dataLen = nSamples * bps
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * bps).putShort(bps.toShort).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (i <- 0 until nSamples * channels)
      bb.putShort(((i * 131) % 65536 - 32768).toShort)
    bb.array()
  }

  test("real wav bytes decode through the RIFF header, not the stub") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (0L, wavBytes(8000, 1, 4000), "wav"),   // exactly 500 ms mono
      (1L, wavBytes(16000, 2, 16000), "wav"), // exactly 1000 ms stereo
      (2L, "not audio at all".getBytes("UTF-8"), "wav")) // stub fallback
    val out = Multimodal.decodeAndFeaturize(spark, rows.toDF(
      "doc_id", "content", "format")).orderBy("doc_id").collect()
    assert((out(0).getAs[Int]("channels"), out(0).getAs[Long]("duration_ms"))
      === ((1, 500L)))
    assert((out(1).getAs[Int]("channels"), out(1).getAs[Long]("duration_ms"))
      === ((2, 1000L)))
    // amplitude histogram is normalized over sampled PCM frames
    val feats = out(0).getAs[scala.collection.Seq[Float]]("features")
    assert(math.abs(feats.sum - 1.0f) < 1e-3)
    assert(feats.count(_ > 0f) > 1, "ramp PCM must spread over bins")
    // direct parse agrees with the distributed path
    val d = Multimodal.AudioCodec.decode(wavBytes(8000, 1, 4000)).get
    assert(d.durationMs === 500L && d.channels === 1)
    // non-RIFF bytes fall back to the stub's pseudo duration, not a crash
    assert(out(2).getAs[Long]("duration_ms") >= 1000L)
  }

  /** Minimal ISO-BMFF: ftyp + moov{mvhd(timescale, duration)} + N mdat
    * payload boxes — enough structure for the box-walk parser to
    * recover exact duration and the frame-payload count. */
  private def mp4Bytes(timescale: Int, duration: Int, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
            ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    def box(tp: String, payload: Array[Byte]): Unit = {
      bos.write(be(8 + payload.length)); bos.write(tp.getBytes("US-ASCII"))
      bos.write(payload)
    }
    box("ftyp", "isom".getBytes("US-ASCII") ++ be(0))
    val mvhd = new java.io.ByteArrayOutputStream()
    mvhd.write(be(0))          // version 0 + flags
    mvhd.write(be(0)); mvhd.write(be(0)) // ctime, mtime
    mvhd.write(be(timescale)); mvhd.write(be(duration))
    mvhd.write(be(0))          // padding past the fields the parser reads
    val mvhdBytes = mvhd.toByteArray
    val moov = be(8 + 8 + mvhdBytes.length) ++ "moov".getBytes("US-ASCII") ++
      be(8 + mvhdBytes.length) ++ "mvhd".getBytes("US-ASCII") ++ mvhdBytes
    bos.write(moov)
    for (f <- 0 until nFrames)
      box("mdat", Array.tabulate[Byte](64)(i => ((i * 7 + f * 31) & 0xff).toByte))
    bos.toByteArray
  }

  test("phash groups pixel-identical images across DIFFERENT container bytes") {
    val s = spark
    import s.implicits._
    // same 16x16 pixel pattern encoded as png AND bmp: different bytes
    // (different containers), identical pixels -> byte-hash dedup
    // misses it, phash must catch it; the shifted pattern must not
    val png = imageBytes("png", 16, 16)
    val bmp = imageBytes("bmp", 16, 16)
    assert(!java.util.Arrays.equals(png, bmp),
      "fixture broken: containers produced identical bytes")
    val other = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, ((15 - x) * 37 + y * 101) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq((0L, png, "png"), (1L, bmp, "png"), (2L, other, "png"))
      .toDF("doc_id", "content", "format")
    val out = Multimodal.phashStage(spark, df).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    assert(out.forall(_._3), s"a fixture image fell to the stub path: ${out.mkString(",")}")
    assert(out(0)._2 === out(1)._2,
      "pixel-identical images hashed differently across containers")
    assert(out(0)._2 !== out(2)._2,
      "distinct patterns collided — the hash is degenerate")
  }

  test("phash dedup is deterministic and groups byte-identical items at sf0.1") {
    def run(dir: String) = graft.queries.Llm.qMmPhashDedup(spark, dir)
      .collect().map(r => (r.getAs[Long]("ahash"), r.getAs[Long]("n_items"),
        r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc"),
        r.getAs[Boolean]("decoded")))
    val small = run(sf("sf0.001"))
    assert(small.nonEmpty, "empty signature table at sf0.001")
    assert(small.toSeq === run(sf("sf0.001")).toSeq, "phash dedup not deterministic")
    // the real corpus's byte-identical image pairs (sf0.1 is the
    // smallest factor that has them) MUST land in one group: the stub
    // thumb is a pure function of bytes — the pixel analog of exact
    // dedup's md5 grouping
    val dir01 = sf("sf0.1")
    val groups = run(dir01)
    val dupGroups = groups.filter(_._2 >= 2)
    assert(dupGroups.nonEmpty, "no duplicate-image groups at sf0.1 — fixture claim broken")
    val m = Multimodal.withMediaColumns(
      graft.Tables.documents(spark, dir01))
    val imgs = m.filter(col("format") === "jpg" || col("format") === "png")
    val byteDups = imgs
      .groupBy(md5(col("content")).as("h"))
      .agg(count(lit(1)).as("n"), collect_list(col("doc_id")).as("docs"))
      .filter(col("n") >= 2).collect()
      .map(_.getSeq[Long](2))
    assert(byteDups.nonEmpty, "no byte-identical image pairs at sf0.1")
    // byte-identical members must carry the SAME ahash — asserted on
    // the actual per-doc hashes, not group containment (a giant
    // unrelated group could satisfy a containment check vacuously)
    val hashOf = Multimodal.phashStage(spark, imgs)
      .select(col("doc_id"), col("ahash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byteDups.foreach { docs =>
      val hs = docs.map(hashOf).distinct
      assert(hs.size == 1,
        s"byte-identical docs $docs hashed differently: $hs")
    }
  }

  test("phash near: banded Hamming join surfaces a 1-bit-perturbed edit exact dedup misses") {
    val s = spark
    import s.implicits._
    // base: left half black, right half white — every 2x2 thumb cell
    // sits far from the global mean, so its 64 hash bits are stable
    def img(flipTopLeft: Boolean): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val bright = x >= 8 || (flipTopLeft && x < 2 && y < 2)
        im.setRGB(x, y, if (bright) 0xffffff else 0x000000)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val base = img(flipTopLeft = false)
    val reenc = { // same pixels, different container bytes
      val im = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(base))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "bmp", bos)
      bos.toByteArray
    }
    val edited = img(flipTopLeft = true) // exactly one thumb cell flips
    val far = {
      val im = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        im.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    assert(!java.util.Arrays.equals(base, reenc) &&
           !java.util.Arrays.equals(base, edited))
    val df = Seq((0L, base, "png"), (1L, reenc, "png"),
                 (2L, edited, "png"), (3L, far, "png"))
      .toDF("doc_id", "content", "format")
    // sanity on the hashes themselves: re-encode is 0 bits away, the
    // edit is within the <=3-bit recall guarantee
    val hs = Multimodal.phashStage(spark, df).orderBy("doc_id").collect()
      .map(r => r.getLong(2))
    assert(hs(0) === hs(1), "re-encode changed the pixel hash")
    val d02 = java.lang.Long.bitCount(hs(0) ^ hs(2))
    assert(d02 >= 1 && d02 <= 3, s"fixture edit moved $d02 bits — want 1..3")
    // ... and the banded join must surface both relations without
    // comparing all pairs
    val out = graft.queries.Llm
      .phashNearFrom(Multimodal.phashStage(spark, df)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_near"), Option(r.getAs[Any]("min_hamming")))))
      .toMap
    assert(out(0L)._1 === 2L && out(0L)._2 === Some(0L),
      s"base should pair with re-encode (d=0) and edit (d=$d02): ${out(0L)}")
    assert(out(2L)._1 === 2L && out(2L)._2 === Some(d02.toLong),
      s"edit should pair with base and re-encode at d=$d02: ${out(2L)}")
    assert(out(3L) === ((0L, None)), s"far image must have no near mates: ${out(3L)}")
  }

  test("phash near: hot-band cap bounds a low-texture cluster; under-cap recall survives") {
    val s = spark
    import s.implicits._
    def png(paint: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) im.setRGB(x, y, paint(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    // a "boilerplate template" cluster: M pixel-identical low-texture
    // images (same checkerboard) -> identical ahash -> ALL 4 of its
    // band buckets hold M items
    val M = 6
    val template = png((x, y) => if ((x + y) % 2 == 0) 0xffffff else 0)
    // an unrelated near-dup pair that must keep pairing under the cap
    val base = png((x, y) => if (x >= 8) 0xffffff else 0)
    val edited = png((x, y) => if (x >= 8 || (x < 2 && y < 2)) 0xffffff else 0)
    val rows = (0 until M).map(i => (i.toLong, template, "png")) ++
      Seq((100L, base, "png"), (101L, edited, "png"))
    val hashed = Multimodal.phashStage(spark, rows.toDF("doc_id", "content", "format"))
      .localCheckpoint(true)
    val hs = hashed.orderBy("doc_id").collect().map(r => r.getLong(2))
    // fixture preconditions: the pair matches itself in some band the
    // template cluster does NOT occupy (else the cap legitimately
    // drops it and the test would assert the wrong thing)
    def bandsOf(h: Long) = (0 until 4).map(b => (b, (h >>> (b * 16)) & 0xFFFFL))
    val clusterBands = bandsOf(hs(0)).toSet
    val pairBands = bandsOf(hs(M)).toSet.intersect(bandsOf(hs(M + 1)).toSet)
    assert(pairBands.nonEmpty, "base/edit lost all common bands — fixture broken")
    assert((pairBands -- clusterBands).nonEmpty,
      s"pair's common bands all collide with the template cluster: $pairBands")
    val cap = 4
    // uncapped: the cluster is quadratic — each member pairs with M-1
    val un = graft.queries.Llm.phashNearFrom(hashed).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_near")).toMap
    (0 until M).foreach(i => assert(un(i.toLong) === (M - 1).toLong))
    // capped: cluster pairs are skipped by construction (its buckets
    // exceed the cap in EVERY band), the unrelated pair still surfaces
    val capped = graft.queries.Llm.phashNearFrom(hashed, maxBandBucket = cap)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_near"), Option(r.getAs[Any]("min_hamming"))))).toMap
    (0 until M).foreach { i =>
      assert(capped(i.toLong) === ((0L, None)),
        s"over-cap cluster member $i still paired: ${capped(i.toLong)}")
    }
    assert(capped(100L)._1 === 1L && capped(101L)._1 === 1L,
      s"under-cap pair lost to the cap: ${capped(100L)} / ${capped(101L)}")
    // audit face: exactly the cluster's over-cap buckets, with mass
    val audit = graft.queries.Llm.phashOverCapBands(hashed, maxBandBucket = cap)
      .collect()
      .map(r => ((r.getAs[Int]("band"), r.getAs[Long]("bkey")),
                 r.getAs[Long]("bucket_docs"))).toMap
    assert(audit.keySet === clusterBands.map { case (b, k) => (b, k) },
      s"audit buckets ${audit.keySet} != cluster bands $clusterBands")
    audit.values.foreach(v => assert(v >= M.toLong))
    // default cap never trips on the real corpus: audit empty at sf0.001
    val real = Multimodal.phashStage(spark,
      Multimodal.withMediaColumns(graft.Tables.documents(spark, sf("sf0.001")))
        .filter(col("format") === "jpg" || col("format") === "png"))
    assert(graft.queries.Llm.phashOverCapBands(real).isEmpty,
      "default cap tripped on the sf0.001 corpus — oracle row at risk")
  }

  test("audio near: banded spectrum surfaces a re-gained+padded+overlaid take; different pitch and capped clusters do not") {
    val s = spark
    import s.implicits._
    def square(n: Int, half: Int, amp: Int): Array[Short] =
      Array.tabulate(n)(x => (if ((x / half) % 2 == 0) amp else -amp).toShort)
    // base: period-8 square tone, 4096 samples
    val tone = square(4096, 4, 1000)
    // near take: one-period-aligned pad (64 samples of silence keeps
    // every 520-sample time bin phase-aligned), x3 integer re-gain
    // (exactly invariant), plus a weak period-16 overlay (the "other
    // mic bleed" that makes it NEAR, not exact)
    val near = Array.tabulate(64 + 4096) { x =>
      val t = if (x < 64) 0 else tone(x - 64) * 3
      (t + (if ((x / 8) % 2 == 0) 50 else -50)).toShort
    }
    // different pitch: period-16 square — same loudness, wrong sound
    val pitch = square(4096, 8, 1000)
    // a "jingle cluster": M PCM-identical period-4 tones
    val M = 6
    val jingle = square(4096, 2, 700)
    val rows = Seq((0L, wavPcm(8000, tone), "wav"),
                   (1L, wavPcm(8000, near), "wav"),
                   (2L, wavPcm(8000, pitch), "wav")) ++
      (10 until 10 + M).map(i => (i.toLong, wavPcm(8000, jingle), "wav"))
    val spec = Multimodal.audioSpectrum(spark,
      rows.toDF("doc_id", "content", "format")).localCheckpoint(true)
    def summary(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_near"), Option(r.getAs[Any]("min_l1"))))).toMap
    val un = summary(graft.queries.Llm.audioNearFrom(spec))
    // the near take pairs ONLY with its source (pitch and jingle are
    // past the L1 verify), at a small nonzero distance
    assert(un(0L)._1 === 1L && un(1L)._1 === 1L,
      s"tone/near should pair exactly once: ${un(0L)} / ${un(1L)}")
    val l1 = un(1L)._2.get.asInstanceOf[Long]
    assert(l1 > 0L && l1 <= graft.queries.Llm.AudioNearMaxL1,
      s"near-take L1 $l1 outside (0, ${graft.queries.Llm.AudioNearMaxL1}]")
    assert(un(2L) === ((0L, None)), s"different pitch paired: ${un(2L)}")
    // the identical-jingle cluster is quadratic uncapped...
    (10 until 10 + M).foreach(i =>
      assert(un(i.toLong) === (((M - 1).toLong, Some(0L))), s"jingle $i: ${un(i.toLong)}"))
    // ...and fully skipped under a small cap (every one of its buckets
    // holds all M members), while the under-cap tone/near pair keeps
    // its recall through slots the cluster does not occupy
    val capped = summary(graft.queries.Llm.audioNearFrom(spec, maxBandBucket = 4))
    (10 until 10 + M).foreach(i =>
      assert(capped(i.toLong) === ((0L, None)),
        s"over-cap jingle $i still paired: ${capped(i.toLong)}"))
    assert(capped(0L)._1 === 1L && capped(1L)._1 === 1L,
      s"under-cap pair lost to the cap: ${capped(0L)} / ${capped(1L)}")
    // audit face: the skipped buckets are reported with their mass
    val audit = graft.queries.Llm.audioNearOverCapBands(spec, maxBandBucket = 4)
      .collect().map(_.getAs[Long]("bucket_docs"))
    assert(audit.nonEmpty && audit.max >= M.toLong,
      s"cap audit missing the jingle cluster: ${audit.toSeq}")
    // real corpus: the default cap never trips at sf0.001
    val realSpec = Multimodal.audioSpectrum(spark,
      Multimodal.withMediaColumns(graft.Tables.documents(spark, sf("sf0.001")))
        .filter(col("format") === "wav"))
    assert(graft.queries.Llm.audioNearOverCapBands(realSpec).isEmpty,
      "default cap tripped on the sf0.001 corpus")
  }

  test("audio dedup groups identical PCM across DIFFERENT container bytes") {
    val s = spark
    import s.implicits._
    // same PCM, two containers: plain RIFF vs one with an injected
    // LIST metadata chunk before data — different bytes, same signal
    val plain = wavBytes(8000, 1, 4000)
    val withList = {
      val meta = "INFO-the-same-audio".getBytes("US-ASCII")
      val pad = meta.length & 1
      val bb = java.nio.ByteBuffer.allocate(plain.length + 8 + meta.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(plain, 0, 36) // RIFF..WAVE + fmt chunk
      bb.put("LIST".getBytes("US-ASCII")).putInt(meta.length).put(meta)
      if (pad == 1) bb.put(0.toByte)
      bb.put(plain, 36, plain.length - 36) // the data chunk
      val out = bb.array()
      // patch the RIFF size field to the new payload length
      val szBB = java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      szBB.putInt(4, out.length - 8)
      out
    }
    assert(!java.util.Arrays.equals(plain, withList))
    val other = wavBytes(8000, 1, 4001) // different PCM stream
    val df = Seq((0L, plain, "wav"), (1L, withList, "wav"), (2L, other, "wav"))
      .toDF("doc_id", "content", "format")
    val env = Multimodal.audioEnvelope(spark, df).orderBy("doc_id").collect()
    assert(env.forall(_.getAs[Boolean]("decoded")),
      "a fixture wav fell to the stub path")
    val sigs = env.map(r => (r.getAs[Int]("channels"), r.getAs[Int]("sample_rate"),
      r.getAs[Seq[Int]]("envelope")))
    assert(sigs(0) === sigs(1),
      "identical PCM signed differently across containers")
    assert(sigs(0) !== sigs(2), "distinct PCM collided — signature degenerate")
  }

  /** A RIFF/WAVE container around caller-supplied 16-bit mono PCM. */
  private def wavPcm(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("audio spectrum: exactly re-gain invariant and frequency selective") {
    // a square tone of period 8 samples: +1000 for 4 samples, -1000
    // for 4 — the period-8 Rademacher filter correlates perfectly,
    // the period-4/16/32 filters are orthogonal to it
    val tone = Array.tabulate(4096)(s =>
      (if ((s / 4) % 2 == 0) 1000 else -1000).toShort)
    val gained = tone.map(v => (v * 2).toShort) // exact integer re-gain
    val Some((ch, sr, spec)) =
      Multimodal.Spectrum.spectrumOf(wavPcm(8000, tone), 8)
    assert((ch, sr) === ((1, 8000)))
    val Some((_, _, spec2)) =
      Multimodal.Spectrum.spectrumOf(wavPcm(8000, gained), 8)
    assert(spec.toSeq === spec2.toSeq,
      "normalized spectrum must be exactly invariant under integer re-gain")
    // selectivity: in every time bin the period-8 magnitude saturates
    // (1024 = perfectly correlated) and the orthogonal periods read 0
    val P = Multimodal.Spectrum.Periods // (4, 8, 16, 32)
    for (k <- 0 until 8) {
      val bin = spec.slice(k * P.length, (k + 1) * P.length)
      assert(bin(1) === 1024, s"bin $k period-8 magnitude ${bin(1)} != 1024")
      assert(bin(0) === 0 && bin(2) === 0 && bin(3) === 0,
        s"bin $k orthogonal periods not silent: ${bin.mkString(",")}")
    }
    // ... while the ENVELOPE signature differs across the gain change —
    // the dup pair this stage exists to key that the envelope can't
    val Some((_, _, _, env)) =
      Multimodal.Envelope.envelopeOf(wavPcm(8000, tone), 16)
    val Some((_, _, _, env2)) =
      Multimodal.Envelope.envelopeOf(wavPcm(8000, gained), 16)
    assert(env.toSeq !== env2.toSeq,
      "fixture broken: the envelope should see the gain change")
  }

  test("audio spectrum query is deterministic, covers every wav item, stubs garbage") {
    def run() = graft.queries.Llm.qMmAudioSpectrum(spark, sf("sf0.001"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("spec_sig"),
        r.getAs[Long]("spec_sum"), r.getAs[Boolean]("decoded")))
    val got = run()
    val nWav = media.filter(col("format") === "wav").count()
    assert(got.length.toLong === nWav, "one spectrum row per wav item")
    assert(got.toSeq === run().toSeq, "audio spectrum not deterministic")
    // the stub path is exercised and flagged on non-RIFF bytes
    val s = spark
    import s.implicits._
    val bad = Multimodal.audioSpectrum(spark,
      Seq((7L, "not audio".getBytes("UTF-8"), "wav"))
        .toDF("doc_id", "content", "format")).collect()
    assert(bad.length === 1 && !bad(0).getAs[Boolean]("decoded"))
    assert(bad(0).getAs[Seq[Int]]("spectrum").forall(v => v >= 0 && v <= 1024))
  }

  test("gain-robust audio dedup groups re-gained takes the envelope face splits") {
    val s = spark
    import s.implicits._
    val tone = Array.tabulate(4096)(s =>
      (if ((s / 4) % 2 == 0) 1000 else -1000).toShort)
    val gained = tone.map(v => (v * 2).toShort)
    val other = Array.tabulate(4096)(s =>
      (if ((s / 8) % 2 == 0) 1000 else -1000).toShort) // different pitch
    val df = Seq((0L, wavPcm(8000, tone), "wav"),
                 (1L, wavPcm(8000, gained), "wav"),
                 (2L, wavPcm(8000, other), "wav"))
      .toDF("doc_id", "content", "format")
    val groups = graft.queries.Llm
      .audioDedupGainFrom(Multimodal.audioSpectrum(spark, df))
      .collect().map(r => (r.getAs[Long]("n_items"),
        r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc")))
    assert(groups.toSet === Set((2L, 0L, 1L), (1L, 2L, 2L)),
      s"gain pair must group, different pitch must not: ${groups.mkString(",")}")
    // ... while the ENVELOPE face keeps the two takes apart — the
    // exact divergence this query exists for. (The envelope ALSO
    // collides the equal-loudness different-pitch pair 0 vs 2 — the
    // opposite blindness, which the spectrum face separates above.)
    val envs = Multimodal.audioEnvelope(spark, df).orderBy("doc_id")
      .collect().map(_.getAs[scala.collection.Seq[Int]]("envelope").toList)
    assert(envs(0) !== envs(1),
      "fixture broken: the envelope should separate the gain pair")
  }

  test("audio dedup query is deterministic and covers every wav item") {
    def run() = graft.queries.Llm.qMmAudioDedup(spark, sf("sf0.001"))
      .collect().map(r => (r.getAs[Long]("sig"), r.getAs[Long]("n_items"),
        r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc"),
        r.getAs[Boolean]("decoded")))
    val got = run()
    assert(got.nonEmpty)
    assert(got.toSeq === run().toSeq, "audio dedup not deterministic")
    val nWav = media.filter(col("format") === "wav").count()
    assert(got.map(_._2).sum === nWav,
      "signature groups do not partition the wav corpus")
  }

  test("resize box-samples a real png to exact integer luminance cells") {
    val s = spark
    import s.implicits._
    // 4x2 image, luminance exactly computable: pixel (x,y) has
    // r=g=b = 10 + 20*x + 40*y, so lum == that value (299+587+114=1000)
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) {
      val v = 10 + 20 * x + 40 * y
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq((0L, bos.toByteArray, "png"),
                   (1L, "not an image".getBytes("UTF-8"), "png"))
    val out = Multimodal.resizeStage(spark,
        rows.toDF("doc_id", "content", "format"), thumbW = 2, thumbH = 1)
      .orderBy("doc_id").collect()
    // cell 0 = pixels x in [0,2), all y: lums {10,30,50,70} -> 40
    // cell 1 = pixels x in [2,4): lums {50,70,90,110} -> 80
    assert(out(0).getAs[Boolean]("decoded"))
    assert((out(0).getAs[Int]("in_w"), out(0).getAs[Int]("in_h")) === ((4, 2)))
    assert(out(0).getAs[scala.collection.Seq[Int]]("thumb").toSeq === Seq(40, 80))
    // non-image bytes fall back to the deterministic stub grid
    assert(!out(1).getAs[Boolean]("decoded"))
    val stub = out(1).getAs[scala.collection.Seq[Int]]("thumb")
    assert(stub.length === 2 && stub.forall(c => c >= 0 && c < 256))
    assert(stub.toSeq ===
      Multimodal.Resize.stubThumb("not an image".getBytes("UTF-8"), 2, 1).toSeq)
  }

  test("resize upsamples below-thumb-size images without losing pixels") {
    val s = spark
    import s.implicits._
    val rows = Seq((0L, imageBytes("png", 3, 3), "png"))
    val out = Multimodal.resizeStage(spark,
        rows.toDF("doc_id", "content", "format"), thumbW = 8, thumbH = 8)
      .orderBy("doc_id").collect()
    val thumb = out(0).getAs[scala.collection.Seq[Int]]("thumb")
    assert(thumb.length === 64)
    assert(thumb.forall(c => c >= 0 && c < 256))
  }

  test("frame sample strides real mdat payloads with exact byte sums") {
    val s = spark
    import s.implicits._
    // 5 frames, maxFrames=2 -> stride 3 -> frames 0 and 3
    val rows = Seq((0L, mp4Bytes(1000, 5000, 5), "mp4"),
                   (1L, "not a video".getBytes("UTF-8"), "mp4"))
    val out = Multimodal.frameSample(spark,
        rows.toDF("doc_id", "content", "format"), maxFrames = 2)
      .orderBy("doc_id", "frame_idx").collect()
    val real = out.filter(_.getLong(0) == 0L)
    assert(real.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 3))
    assert(real.forall(_.getAs[Int]("n_frames_total") == 5))
    assert(real.forall(_.getAs[Boolean]("decoded")))
    // fixture payload: 64 bytes of (i*7 + f*31) & 0xff — sum exactly
    def expectSum(f: Int): Long =
      (0 until 64).map(i => ((i * 7 + f * 31) & 0xff).toLong).sum
    assert(real(0).getAs[Long]("byte_sum") === expectSum(0))
    assert(real(1).getAs[Long]("byte_sum") === expectSum(3))
    assert(real.forall(_.getAs[Long]("n_frame_bytes") == 64L))
    // stub path: deterministic pseudo frames, at most maxFrames
    val stub = out.filter(_.getLong(0) == 1L)
    assert(stub.nonEmpty && stub.length <= 2)
    assert(stub.forall(r => !r.getAs[Boolean]("decoded")))
  }

  /** Minimal ISO-BMFF with CALLER-CHOSEN frame payloads (the
    * [[mp4Bytes]] walk structure, payloads injectable) — lets the
    * video-near tests state re-mux/perturb/different relations at the
    * frame-content level. `junk` appends a free box and flips the ftyp
    * brand: container bytes change, payloads do not. */
  private def mp4WithFrames(frames: Seq[Array[Byte]],
                            junk: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
            ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    def box(tp: String, payload: Array[Byte]): Unit = {
      bos.write(be(8 + payload.length)); bos.write(tp.getBytes("US-ASCII"))
      bos.write(payload)
    }
    box("ftyp", (if (junk) "mp42" else "isom").getBytes("US-ASCII") ++ be(0))
    if (junk) box("free", Array.fill[Byte](17)(0x5a))
    frames.foreach(f => box("mdat", f))
    bos.toByteArray
  }

  test("video near: shared-frame join surfaces re-mux and one-frame edits, not different clips") {
    val s = spark
    import s.implicits._
    def frame(seed: Int): Array[Byte] =
      Array.tabulate[Byte](48)(i => ((i * 13 + seed * 97) & 0xff).toByte)
    val baseFrames = Seq(frame(1), frame(2), frame(3), frame(4))
    val base = mp4WithFrames(baseFrames)
    val remux = mp4WithFrames(baseFrames, junk = true) // same payloads, new container
    val pert = mp4WithFrames(baseFrames.init :+ frame(99)) // one frame edited
    val diff = mp4WithFrames(Seq(frame(11), frame(12), frame(13), frame(14)))
    val media = Seq((0L, base, "mp4"), (1L, remux, "mp4"),
                    (2L, pert, "mp4"), (3L, diff, "mp4"))
      .toDF("doc_id", "content", "format")
    val hashed = Multimodal.frameHashStage(spark, media)
    assert(hashed.collect().forall(_.getAs[Boolean]("decoded")),
      "all fixtures must walk the real BMFF path")
    val out = graft.queries.Llm.videoNearFrom(hashed)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    // base pairs with the re-mux (4/4 shared) and the perturbed clip
    // (3/4 >= 2 = min/2); the different clip pairs with nobody
    assert(out(0L) === ((2L, Some(4L))), s"base: ${out(0L)}")
    assert(out(1L) === ((2L, Some(4L))), s"remux: ${out(1L)}")
    assert(out(2L) === ((2L, Some(3L))), s"perturbed: ${out(2L)}")
    assert(out(3L) === ((0L, None)), s"different: ${out(3L)}")
    // byte-identity sanity: the re-mux container differs even though
    // every frame hash matches (what byte-level dedup cannot see)
    assert(!java.util.Arrays.equals(base, remux))
    // partitioning invariance of the signature stage
    val ha = hashed.orderBy("doc_id").collect().map(_.toString).toSeq
    val hb = Multimodal.frameHashStage(spark, media.repartition(3),
        batchSize = 1).orderBy("doc_id").collect().map(_.toString).toSeq
    assert(ha === hb)
  }

  test("video dedup groups re-muxed containers and byte-identical stubs, splits frame edits") {
    val s = spark
    import s.implicits._
    def frame(seed: Int): Array[Byte] =
      Array.tabulate[Byte](48)(i => ((i * 13 + seed * 97) & 0xff).toByte)
    val fs = Seq(frame(1), frame(2), frame(3))
    val junkBytes = "definitely not a video".getBytes("UTF-8")
    val media = Seq(
      (0L, mp4WithFrames(fs), "mp4"),
      (1L, mp4WithFrames(fs, junk = true), "mp4"), // re-mux: groups with 0
      (2L, mp4WithFrames(fs.init :+ frame(9)), "mp4"), // edit: splits
      (3L, junkBytes, "mp4"), // stub path
      (4L, junkBytes.clone(), "mp4")) // byte-identical stub: groups with 3
      .toDF("doc_id", "content", "format")
    val hashed = Multimodal.frameHashStage(spark, media)
    val groups = hashed
      .groupBy(col("frame_hashes"), col("decoded"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect()
      .map(r => (r.getAs[Boolean]("decoded"), r.getAs[Long]("n"),
                 r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    // re-muxed container groups with the original (real path)...
    assert(groups.contains((true, 2L, 0L, 1L)), groups.mkString(", "))
    // ...the frame edit stays its own group...
    assert(groups.contains((true, 1L, 2L, 2L)))
    // ...and byte-identical stubs group on the byte-derived signature
    assert(groups.contains((false, 2L, 3L, 4L)))
    // the registered query: deterministic, one row per distinct
    // signature, populations sum to the mp4 item count
    val dir = sf("sf0.001")
    val q1 = graft.queries.Llm.qMmVideoDedup(spark, dir).collect()
    val q2 = graft.queries.Llm.qMmVideoDedup(spark, dir).collect()
    assert(q1.map(_.toString).toSeq === q2.map(_.toString).toSeq)
    val nMp4 = Multimodal.withMediaColumns(graft.Tables.documents(spark, dir))
      .filter(col("format") === "mp4").count()
    assert(q1.map(_.getAs[Long]("n_items")).sum === nMp4)
  }

  test("video near: hot template-frame bucket is capped and audited; under-cap pairing survives") {
    val s = spark
    import s.implicits._
    // 6 clips sharing one template frame hash (42) + a unique hash each
    val hashed = (0L until 6L).map(id => (id, Array(42L, 1000L + id), true))
      .toDF("doc_id", "frame_hashes", "decoded")
    // under the default cap every pair shares the template frame:
    // n_shared=1, min(n)=2 -> 1*2 >= 2 surfaces all C(6,2) pairs
    val open = graft.queries.Llm.videoNearFrom(hashed).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(open.values.forall(_ === 5L),
      s"uncapped: every clip should near-pair the other 5: $open")
    // cap=5: the 6-member bucket is over cap -> join skipped, no pairs
    val capped = graft.queries.Llm.videoNearFrom(hashed, maxBucket = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(capped.values.forall(_ === 0L),
      s"capped: the template bucket must not self-join: $capped")
    val audit = graft.queries.Llm.videoOverCapFrames(hashed, maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(audit.toSeq === Seq((42L, true, 6L)),
      s"audit must report exactly the skipped template bucket: ${audit.toSeq}")
    // the registered query is deterministic and covers every mp4 item
    val dir = sf("sf0.001")
    val q1 = graft.queries.Llm.qMmVideoNear(spark, dir).collect()
    val q2 = graft.queries.Llm.qMmVideoNear(spark, dir).collect()
    assert(q1.map(_.toString).toSeq === q2.map(_.toString).toSeq)
    val nMp4 = Multimodal.withMediaColumns(
        graft.Tables.documents(spark, dir))
      .filter(col("format") === "mp4").count()
    assert(q1.length.toLong === nMp4,
      "one summary row per mp4 item, scale-stable")
  }

  test("resize and frame sample are invariant to partitioning") {
    val a = Multimodal.resizeStage(spark, media).orderBy("doc_id").collect()
    val b = Multimodal.resizeStage(spark, media.repartition(7), batchSize = 1)
      .orderBy("doc_id").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val fa = Multimodal.frameSample(spark, media)
      .orderBy("doc_id", "frame_idx").collect()
    val fb = Multimodal.frameSample(spark, media.repartition(5), batchSize = 1)
      .orderBy("doc_id", "frame_idx").collect()
    assert(fa.map(_.toString).toSeq === fb.map(_.toString).toSeq)
  }

  test("audio envelope bins real PCM with exact integer means") {
    val s = spark
    import s.implicits._
    // 8 mono 16-bit samples of the wavBytes ramp ((i*131)%65536-32768),
    // 2 bins of 4 samples each: expected value = sum(|sample|) div 4,
    // computed here from first principles
    def amp(i: Int): Long = math.abs((i * 131) % 65536 - 32768).toLong
    val exp0 = (0 until 4).map(amp).sum / 4
    val exp1 = (4 until 8).map(amp).sum / 4
    val rows = Seq((0L, wavBytes(8000, 1, 8), "wav"),
                   (1L, "not audio at all".getBytes("UTF-8"), "wav"))
    val out = Multimodal.audioEnvelope(spark,
        rows.toDF("doc_id", "content", "format"), nBins = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Boolean]("decoded"))
    assert(out(0).getAs[Int]("channels") === 1)
    assert(out(0).getAs[Int]("sample_rate") === 8000)
    assert(out(0).getAs[Long]("duration_ms") === 1L) // 8 samples @ 8 kHz
    assert(out(0).getAs[scala.collection.Seq[Int]]("envelope").toSeq
      === Seq(exp0.toInt, exp1.toInt))
    // non-audio bytes fall back to the deterministic stub envelope
    assert(!out(1).getAs[Boolean]("decoded"))
    val stub = out(1).getAs[scala.collection.Seq[Int]]("envelope")
    assert(stub.length === 2 && stub.forall(v => v >= 0 && v <= 32768))
    assert(stub.toSeq === Multimodal.Envelope
      .stubEnvelope("not audio at all".getBytes("UTF-8"), 2).toSeq)
  }

  test("audio envelope is invariant to partitioning and batch size") {
    val wavs = media.filter(org.apache.spark.sql.functions.col("format") === "wav")
    val a = Multimodal.audioEnvelope(spark, wavs).orderBy("doc_id").collect()
    val b = Multimodal.audioEnvelope(spark, wavs.repartition(7), batchSize = 1)
      .orderBy("doc_id").collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("mdat walk resolves size==0 (to-EOF) and size==1 (64-bit largesize) boxes") {
    def be(i: Int): Array[Byte] =
      Array(((i >> 24) & 0xff).toByte, ((i >> 16) & 0xff).toByte,
            ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)
    def be64(l: Long): Array[Byte] = (0 until 8).map(k =>
      ((l >> (56 - 8 * k)) & 0xff).toByte).toArray
    val ftyp = be(16) ++ "ftyp".getBytes("US-ASCII") ++
      "isom".getBytes("US-ASCII") ++ be(0)
    val pay1 = Array.tabulate[Byte](32)(i => (i * 3).toByte)
    val pay2 = Array.tabulate[Byte](48)(i => (i * 5).toByte)
    // mdat #1 uses the 64-bit largesize encoding (header 16 bytes);
    // mdat #2 uses size==0 (extends to EOF) as the last box
    val large = be(1) ++ "mdat".getBytes("US-ASCII") ++
      be64(16L + pay1.length) ++ pay1
    val toEof = be(0) ++ "mdat".getBytes("US-ASCII") ++ pay2
    val bytes = ftyp ++ large ++ toEof
    val boxes = Multimodal.mdatBoxes(bytes)
    assert(boxes.map(_._2) === List(32, 48),
      s"payload lengths wrong: $boxes")
    // payload offsets line up with the actual bytes
    val (o1, l1) = boxes(0)
    assert(bytes.slice(o1, o1 + l1).toSeq === pay1.toSeq)
    val (o2, l2) = boxes(1)
    assert(bytes.slice(o2, o2 + l2).toSeq === pay2.toSeq)

    // a size that cannot be resolved (4 < header size) invalidates the
    // WHOLE parse -> Nil -> the stage takes the stub path cleanly
    // instead of acting on a truncated frame list
    val badBox = be(4) ++ "mdat".getBytes("US-ASCII")
    assert(Multimodal.mdatBoxes(ftyp ++ large ++ badBox) === Nil)

    // frameSample enumerates the special-size payloads with exact sums
    val s = spark
    import s.implicits._
    val out = Multimodal.frameSample(spark,
        Seq((0L, bytes, "mp4")).toDF("doc_id", "content", "format"),
        maxFrames = 4)
      .orderBy("frame_idx").collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Boolean]("decoded")))
    assert(out(0).getAs[Long]("byte_sum") === pay1.map(b => (b & 0xff).toLong).sum)
    assert(out(1).getAs[Long]("byte_sum") === pay2.map(b => (b & 0xff).toLong).sum)
  }

  test("real mp4 boxes decode through the BMFF walk, not the stub") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (0L, mp4Bytes(1000, 5000, 3), "mp4"),  // 5 s, 3 frame payloads
      (1L, mp4Bytes(600, 1200, 1), "mp4"),   // 2 s, 1 frame payload
      (2L, "not a video".getBytes("UTF-8"), "mp4")) // stub fallback
    val out = Multimodal.decodeAndFeaturize(spark, rows.toDF(
      "doc_id", "content", "format")).orderBy("doc_id").collect()
    assert((out(0).getAs[Long]("duration_ms"), out(0).getAs[Int]("n_frames"))
      === ((5000L, 3)))
    assert((out(1).getAs[Long]("duration_ms"), out(1).getAs[Int]("n_frames"))
      === ((2000L, 1)))
    // frame-sample histogram is normalized over sampled payload bytes
    val feats = out(0).getAs[scala.collection.Seq[Float]]("features")
    assert(math.abs(feats.sum - 1.0f) < 1e-3)
    assert(feats.count(_ > 0f) > 1, "ramp payload must spread over bins")
    // direct parse agrees with the distributed path
    val d = Multimodal.VideoCodec.decode(mp4Bytes(1000, 5000, 3)).get
    assert(d.durationMs === 5000L && d.frames === 3)
    // non-BMFF bytes fall back to the stub's pseudo fields, not a crash
    assert(out(2).getAs[Long]("duration_ms") >= 1000L)
    assert(out(2).getAs[Int]("n_frames") >= 1)
  }
}
