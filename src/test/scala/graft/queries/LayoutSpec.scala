package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: kernel exactness against a brute-force Morton code,
  * and the actual data-skipping payoff measured on parquet footers —
  * a box predicate overlaps FEWER files under the z-order layout than
  * under a 1-D sort, on the dimension the 1-D sort ignores. */
class LayoutSpec extends SparkSpec {

  private def mortonRef(x: Int, y: Int): Long = {
    var z = 0L
    for (i <- 0 until 16)
      z |= ((x >> i) & 1).toLong << (2 * i) | ((y >> i) & 1).toLong << (2 * i + 1)
    z
  }

  test("z2 equals the bit-by-bit Morton reference on the 16-bit corners") {
    val s = spark
    import s.implicits._
    val vals = Seq(0, 1, 2, 3, 255, 256, 4095, 32768, 65535, 40000)
    val pairs = for (x <- vals; y <- vals) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select($"x", $"y", graft.queries.Layout.z2($"x", $"y").as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"z2($x, $y)")
    }
  }

  /** Reference d2xy (inverse Hilbert walk) — independent of the
    * kernel's xy2d, so the roundtrip test would catch a transcription
    * error in either direction. */
  private def hilbertD2xy(d: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var t = d
    var s = 1L
    while (s < 65536L) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  test("hilbert kernel round-trips against the independent inverse walk") {
    // corners, axes, and a pseudo-random scatter of the 2^32 domain
    val ds = Seq(0L, 1L, 2L, 3L, 65535L, 65536L, (1L << 31) - 1, (1L << 32) - 1) ++
      (1 to 200).map(i => (i * 0x9E3779B9L) & 0xFFFFFFFFL)
    ds.foreach { d =>
      val (x, y) = hilbertD2xy(d)
      assert(graft.expressions.HilbertOps.xy2d(x, y) == d,
        s"xy2d(d2xy($d)) != $d")
    }
  }

  test("hilbert locality: consecutive indexes are edge-adjacent cells") {
    // the property Morton lacks (it jumps at power-of-two boundaries)
    var (px, py) = hilbertD2xy(0L)
    (1L to 5000L).foreach { d =>
      val (x, y) = hilbertD2xy(d)
      assert(math.abs(x - px) + math.abs(y - py) == 1L,
        s"d=$d: (${px},${py}) -> ($x,$y) is not an edge step")
      px = x; py = y
    }
  }

  test("q_layout_hilbert buckets are index-consistent") {
    val rows = Layout.qLayoutHilbert(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, hmin, hmax) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(hmin >> 26 == b && hmax >> 26 == b, "bucket boundary violated")
    }
  }

  test("q_layout_zorder buckets are interleave-consistent") {
    val rows = Layout.qLayoutZorder(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, zmin, zmax) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(zmin >> 26 == b && zmax >> 26 == b, "bucket boundary violated")
    }
  }

  /** Per-file [min,max] of a column straight from the parquet footers —
    * exactly the stats a scan uses for row-group skipping. */
  private def fileRanges(dir: String, column: String): Seq[(Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._
    new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getPath), new Configuration()))
        try {
          val ranges = r.getFooter.getBlocks.asScala.flatMap { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .map { c =>
                val st = c.getStatistics
                (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
                 st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
              }
          }
          (ranges.map(_._1).min, ranges.map(_._2).max)
        } finally r.close()
      }
  }

  /** The files-overlap proof, parameterized by source dir and bucket
    * count: write the same projection range-sorted by partkey and
    * z-ordered on (partkey, suppkey), then count which files a narrow
    * suppkey box overlaps per the parquet footer stats. */
  private def zorderProof(srcDir: String, buckets: Int): Unit = {
    val li = graft.Tables.lineitem(spark, srcDir)
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString

    // 1-D layout: range-sorted by partkey only
    li.repartitionByRange(buckets, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$base/linear")
    // 2-D layout: z-ordered on (partkey, suppkey)
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", s"$base/zorder", buckets)

    def overlapping(dir: String, lo: Long, hi: Long): Int =
      fileRanges(dir, "l_suppkey").count { case (mn, mx) => mx >= lo && mn <= hi }

    // narrow box on the dimension the linear sort ignores
    val (lo, hi) = (2L, 3L)
    val linHit = overlapping(s"$base/linear", lo, hi)
    val zHit = overlapping(s"$base/zorder", lo, hi)
    // compare against the ACTUAL file count, not the bucket literal:
    // the range partitioner / AQE may produce fewer non-empty files
    // without any layout regression — the claim is only "a partkey
    // sort skips nothing on suppkey, z-order skips something"
    val linFiles = fileRanges(s"$base/linear", "l_suppkey").size
    info(s"$srcDir buckets=$buckets: linear $linHit/$linFiles overlap, " +
      s"z-order $zHit/${fileRanges(s"$base/zorder", "l_suppkey").size}")
    assert(linHit == linFiles,
      s"partkey sort should leave every file overlapping: $linHit of $linFiles")
    assert(zHit < linHit, s"z-order must skip files on suppkey: $zHit vs $linHit")
    // and both layouts hold the same rows — compared DISTRIBUTED
    // (count + orderless per-column sums + row-hash sum), not via a
    // driver-side collect that would cap the proof at fixture sizes
    def sig(dir: String): Seq[Any] =
      spark.read.parquet(dir)
        .agg(count(lit(1)), sum("l_orderkey"), sum("l_partkey"),
             sum("l_suppkey"),
             sum(abs(hash(col("l_orderkey"), col("l_partkey"),
                          col("l_suppkey")).cast("long"))))
        .collect()(0).toSeq
    assert(sig(s"$base/linear") == sig(s"$base/zorder"),
      "layouts must hold the same rows")
    // proof artifacts can be GB-scale at the clone: clean up eagerly
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(base))
  }

  test("z-order layout prunes a suppkey box that a partkey sort cannot") {
    zorderProof(sf("sf0.001"), 8)
  }

  test("compaction apply: file count drops to the plan's bins with zero row loss, on real footers") {
    val dir = sf("sf0.01")
    val out = Layout.qLayoutCompactionApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    // every planned bin produced EXACTLY ONE output file
    out.foreach { case (part, bin, nIn, _, _, nOut) =>
      assert(nOut === 1L, s"bin ($part,$bin) wrote $nOut files, want 1")
      assert(nIn >= 1L)
    }
    // the rewrite must actually compact: fewer output files than input
    val filesIn = out.map(_._3).sum
    val bins = out.length.toLong
    assert(bins < filesIn,
      s"no compaction happened: $bins bins from $filesIn files")
    // zero row loss vs the source table
    val demoRows = graft.Tables.lineitem(spark, dir).count()
    assert(out.map(_._5).sum === demoRows,
      "compacted table lost or duplicated rows")
    // the running-sum bin rule on real sizes — the property the rule
    // actually guarantees (an individual non-final bin CAN be small if
    // a boundary-crossing file orphans the next one): the cumulative
    // bytes of all bins up to and including bin b reach b2 * target
    // for the next planned bin b2, i.e. average bin fill >= target
    // across every prefix
    out.groupBy(_._1).foreach { case (part, rows) =>
      val sorted = rows.sortBy(_._2)
      var cum = 0L
      sorted.toSeq.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val bytesIn = pair(0)._4
          val nextBin = pair(1)._2
          cum += bytesIn
          assert(cum >= nextBin * Layout.CompactTargetBytes,
            s"partition $part: prefix $cum bytes cannot reach bin $nextBin " +
              "under the running-sum rule")
        }
      }
    }
    // serve-twice determinism (both artifacts content-keyed)
    val again = Layout.qLayoutCompactionApply(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5)))
    assert(again.toSeq === out.toSeq,
      "compaction apply is not serve-deterministic")
  }

  test("snapshot read: v1 files survive the v2 publish byte-identical; both versions serve the same rollup") {
    val dir = sf("sf0.01")
    // v1 manifest (name, size) BEFORE forcing the v2 build
    val demo = Layout.compactDemoPath(spark, dir)
    val before = Layout.realManifest(spark, s"$demo/table")
    // force the compacted v2 artifact into existence (and the face's
    // own result while at it)
    val out = Layout.qLayoutSnapshotRead(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // the OPTIMIZE-is-invisible contract, on footers: publishing v2
    // touched NO v1 file — same names, same byte sizes
    val after = Layout.realManifest(spark, s"$demo/table")
    assert(after === before,
      "v2 publish modified the v1 snapshot's files")
    // both version pins serve the identical rollup
    val v1 = out.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).sortBy(_._1)
    val v2 = out.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)).sortBy(_._1)
    assert(v1.nonEmpty && v1.toSeq === v2.toSeq,
      "version-pinned reads diverged across the rewrite")
  }

  test("incremental read: the snapshot delta is exact set algebra on the manifest") {
    val dir = sf("sf0.01")
    val demo = Layout.compactDemoPath(spark, dir)
    val full = Layout.realManifest(spark, s"$demo/table")
      .map { case (p, f, _) => (p, f) }.toSet
    val t2 = full.filter(_._1 < 199901L)
    // the delta the face reads = files of the >= 199901 partitions
    val delta = full.filter(_._1 >= 199901L)
    assert(t2.intersect(delta).isEmpty, "delta overlaps the t2 snapshot")
    assert(t2.union(delta) === full, "t2 + delta does not reassemble t3")
    assert(delta.nonEmpty, "the fixture has no 1999+ ship months")
    // and the face's row total equals the appended rows exactly
    val got = Layout.qLayoutIncrementalRead(spark, dir).collect()
    val wantRows = graft.Tables.lineitem(spark, dir)
      .filter(org.apache.spark.sql.functions.expr(
        "year(l_shipdate) * 100 + month(l_shipdate) >= 199901"))
      .count()
    assert(got.map(_.getLong(1)).sum === wantRows,
      "incremental read lost or duplicated appended rows")
    // every month in the output is inside the delta window
    assert(got.forall(_.getLong(0) >= 199901L), "pre-boundary month leaked")
  }

  test("merge upsert: copy-on-write — base files untouched, artifact holds only the touched window, zero row loss") {
    val dir = sf("sf0.01")
    val demo = Layout.compactDemoPath(spark, dir)
    val before = Layout.realManifest(spark, s"$demo/table")
    // force the merge artifact + get the served rollup
    val out = Layout.qLayoutMergeUpsert(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // CoW contract on footers: publishing the merge modified NO base
    // file — time travel to the pre-merge snapshot stays free
    val after = Layout.realManifest(spark, s"$demo/table")
    assert(after === before, "merge publish modified the base snapshot")
    // the merge artifact contains ONLY the touched window's partitions
    val merged = Layout.mergeUpsertPath(spark, dir)
    val artParts = Layout.realManifest(spark, s"$merged/table")
      .map(_._1).distinct
    assert(artParts.nonEmpty &&
             artParts.forall(p => p >= 199701L && p <= 199712L),
      s"merge artifact leaked outside the touched window: $artParts")
    // zero row loss across the seam, and every source month served
    val src = graft.Tables.lineitem(spark, dir)
    assert(out.map(_._2).sum === src.count(),
      "merged snapshot lost or duplicated rows")
    val wantMonths = src.selectExpr(
        "CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet === wantMonths, "month set mismatch")
    // the update actually landed: every touched month's sum differs
    // from the pre-merge rollup (prices only ever doubled, never
    // reduced, and every 1997 month has some orderkey % 3 == 0 line)
    val pre = graft.Tables.lineitem(spark, dir)
      .filter(org.apache.spark.sql.functions.expr(
        "year(l_shipdate) = 1997"))
      .groupBy(org.apache.spark.sql.functions.expr(
        "CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)").as("ym"))
      .agg(graft.sql.Det.dsum(org.apache.spark.sql.functions.col("l_extendedprice")).as("sp"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.filter(t => t._1 >= 199701L && t._1 <= 199712L).foreach {
      case (ym, _, sp) =>
        assert(sp > pre(ym), s"month $ym: merge update did not land")
    }
  }

  test("compacting a z-ordered table preserves its file-skipping quality") {
    // the interaction real OPTIMIZE implementations get wrong (round-15
    // verdict item): bin-packing a CLUSTERED table must group
    // consecutive-in-cluster-order files — name order IS z order under
    // zorderWrite (range partitioner task numbering), the same rule
    // realManifest documents — or the merged footer bounding boxes
    // inflate to the whole key space and the layout silently loses its
    // skipping. Pinned: (a) a consecutive-bin compaction never
    // increases the number of files a narrow suppkey box overlaps and
    // still skips files afterwards; (b) the same bin sizes grouped
    // ACROSS the z order (the strided adversarial control) are no
    // better than consecutive; (c) zero row loss.
    val li = graft.Tables.lineitem(spark, sf("sf0.01"))
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val base = java.nio.file.Files.createTempDirectory("graft_zc").toString
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", s"$base/zorder", 16)
    val files = new java.io.File(s"$base/zorder").listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted

    def compactInto(outDir: String, bins: Seq[Seq[String]]): Unit = {
      new java.io.File(outDir).mkdirs()
      bins.zipWithIndex.foreach { case (bin, i) =>
        spark.read.parquet(bin: _*).coalesce(1)
          .write.mode("overwrite").parquet(s"$base/tmp_bin")
        val part = new java.io.File(s"$base/tmp_bin").listFiles
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(f"$outDir/bin-$i%05d.parquet")): Unit
      }
    }
    compactInto(s"$base/consec", files.grouped(2).map(_.toSeq).toSeq)
    // adversarial control with the SAME bin-size multiset for any file
    // count (grouped(2) = floor(n/2) pairs + a singleton iff n is odd;
    // mirror pairing produces exactly the same): pair first-with-last
    // — the most z-DISTANT files — middle file solo when n is odd
    val half = files.length / 2
    compactInto(s"$base/strided",
      (0 until half).map(i => Seq(files(i), files(files.length - 1 - i))) ++
        (if (files.length % 2 == 1) Seq(Seq(files(half))) else Nil))

    def hits(dir: String): (Int, Int) = {
      val rs = fileRanges(dir, "l_suppkey")
      (rs.count { case (mn, mx) => mx >= 2L && mn <= 3L }, rs.size)
    }
    val (hPre, nPre) = hits(s"$base/zorder")
    val (hCon, nCon) = hits(s"$base/consec")
    val (hStr, _) = hits(s"$base/strided")
    info(s"suppkey box [2,3]: pre $hPre/$nPre, consecutive $hCon/$nCon, " +
      s"strided $hStr/$nCon")
    assert(hPre < nPre, s"fixture must skip pre-compaction: $hPre/$nPre")
    assert(hCon <= hPre,
      s"consecutive compaction increased overlapping files: $hCon > $hPre")
    assert(hCon < nCon,
      s"compacted z-table lost ALL skipping: $hCon/$nCon")
    assert(hStr >= hCon,
      s"strided control out-skipped consecutive bins?! $hStr < $hCon")

    // zero row loss, distributed signature (the zorderProof discipline)
    def sig(dir: String): Seq[Any] =
      spark.read.parquet(dir)
        .agg(count(lit(1)), sum("l_orderkey"), sum("l_partkey"),
             sum("l_suppkey"),
             sum(abs(hash(col("l_orderkey"), col("l_partkey"),
                          col("l_suppkey")).cast("long"))))
        .collect()(0).toSeq
    assert(sig(s"$base/zorder") == sig(s"$base/consec"),
      "consecutive compaction lost or duplicated rows")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(base))
  }

  test("z-order pruning holds at the 10x clone's real file counts") {
    val dir = sys.env.getOrElse("GRAFT_X10_DIR", "/tmp/graft_sf1")
    assume(new java.io.File(s"$dir/lineitem.parquet").exists(),
      s"10x clone absent at $dir (tools/scale10.py builds it)")
    // 6M rows, 32 files — row-group stats and file counts at a scale
    // where the skip ratio is real, not a 2-file artifact
    zorderProof(dir, 32)
  }

  test("persisted manifests are honest: stored == live listing (round-18 serve-path contract)") {
    val dir = sf("sf0.01")
    // the serve paths now plan EXCLUSIVELY from manifest.tsv — this
    // pin is what makes that safe: the manifest written at build time
    // must equal a live (name, size) listing of the published table
    val demo = Layout.compactDemoPath(spark, dir)
    assert(Layout.storedManifest(spark, demo) ===
             Layout.realManifest(spark, s"$demo/table"),
      "demo artifact's persisted manifest drifted from its footers")
    val plan = Layout.planBins(Layout.storedManifest(spark, demo),
                               Layout.CompactTargetBytes)
    val applied = Layout.compactAppliedPath(spark, dir, plan)
    // the applied table is two-level (part=/bin=) — compare at full
    // relative-path granularity against a live recursive walk
    val stored = Layout.manifestEntries(applied)
      .filter(_._1.startsWith("table/")).toSet
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    val root = new java.io.File(s"$applied/table")
    val live = walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => ("table/" + root.toPath.relativize(f.toPath).toString
                   .replace(java.io.File.separatorChar, '/'),
                 f.length())).toSet
    assert(stored === live,
      "applied artifact's persisted manifest drifted from its footers")
  }

  test("merge-on-read: zero data-file rewrites, DV-delta parity, reader equals copy-on-write") {
    val dir = sf("sf0.01")
    val demo = Layout.compactDemoPath(spark, dir)
    val before = Layout.realManifest(spark, s"$demo/table")
    val morOut = Layout.qLayoutMergeMor(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the MoR pin OPPOSITE the CoW face's: the commit rewrote NO data
    // file anywhere — base untouched AND the artifact itself holds
    // only the deletion vector and the delta, never copied base rows
    val after = Layout.realManifest(spark, s"$demo/table")
    assert(after === before, "MoR commit modified a base file")
    val mor = Layout.mergeMorPath(spark, dir)
    val ents = Layout.manifestEntries(mor)
    assert(ents.nonEmpty &&
             ents.forall(e => e._1.startsWith("dv/") ||
                              e._1.startsWith("delta/")),
      s"MoR artifact holds more than dv/ + delta/: ${ents.map(_._1)}")
    // every deleted position has exactly one replacement row
    val dvN = spark.read.parquet(s"$mor/dv").count()
    val deltaN = spark.read.parquet(s"$mor/delta").count()
    assert(dvN > 0 && dvN === deltaN,
      s"DV/delta row mismatch: $dvN deletes vs $deltaN replacements")
    // the DV never names a file outside the touched window
    val dvParts = spark.read.parquet(s"$mor/dv")
      .select("part").distinct().collect().map(_.getLong(0))
    assert(dvParts.forall(p => p >= 199701L && p <= 199712L),
      s"DV leaked outside the touched window: ${dvParts.toSeq}")
    // reader-indistinguishable from the copy-on-write strategy
    val cow = Layout.qLayoutMergeUpsert(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(morOut.toSeq === cow.toSeq,
      "MoR and CoW readers disagree on the merged table")
  }

  test("schema evolution: history files carry their original schema; evolved reader null-fills exactly") {
    val dir = sf("sf0.01")
    val root = Layout.evolvePath(spark, dir)
    def commitFiles(sub: String): Seq[String] =
      Layout.manifestEntries(root).filter(_._1.startsWith(sub + "/"))
        .map { case (rel, _) => s"$root/$rel" }
    // the add-column commit was metadata-only: pre-evolution files
    // physically lack the column, the evolved commit's files carry it
    val s1Fields = spark.read.parquet(commitFiles("s1"): _*)
      .schema.fieldNames.toSet
    val s3Fields = spark.read.parquet(commitFiles("s3"): _*)
      .schema.fieldNames.toSet
    assert(!s1Fields.contains("l_ret"), "history file gained the new column")
    assert(s3Fields.contains("l_ret"), "evolved commit lacks the new column")
    val out = Layout.qLayoutSnapshotEvolve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 if (r.isNullAt(4)) None else Some(r.getLong(4))))
    // pre-evolution readers: the column does not exist → NULL
    assert(out.filter(_._1 <= 2L).forall(_._4.isEmpty),
      "a pre-evolution reader fabricated return counts")
    // evolved reader: null-filled history years report 0, evolved
    // years report the true count
    val v3 = out.filter(_._1 == 3L)
    assert(v3.filter(_._2 <= Layout.EvolveV2MaxYr).forall(_._4.contains(0L)),
      "null-filled history produced nonzero return counts")
    val wantRet = graft.Tables.lineitem(spark, dir)
      .filter(expr(s"year(l_shipdate) > ${Layout.EvolveV2MaxYr}" +
                   " AND l_returnflag = 'R'")).count()
    assert(v3.filter(_._2 > Layout.EvolveV2MaxYr).flatMap(_._4).sum === wantRet,
      "evolved years' return counts wrong")
    // version row counts grow with the chain: v1 ⊂ v2 ⊂ v3
    val rows = (1L to 3L).map(v => out.filter(_._1 == v).map(_._3).sum)
    assert(rows(0) < rows(1) && rows(1) < rows(2),
      s"snapshot row totals not strictly growing: $rows")
  }
}
