package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DataSource V2 face of the MatrixMarket reader: format registration,
  * byte-range split correctness (records crossing split boundaries,
  * header owned by the byte-0 split), and column pruning pushdown. */
class MatrixMarketSourceSpec extends SparkSpec {

  private def writeMtx(nnz: Int): String = {
    val p = Files.createTempDirectory("mtxv2").resolve("m.mtx")
    val body = (1 to nnz).map { i =>
      s"${i % 97 + 1} ${i % 53 + 1} ${i * 0.5}"
    }.mkString("\n")
    Files.writeString(p,
      s"%%MatrixMarket matrix coordinate real general\n% generated\n97 53 $nnz\n$body\n")
    p.toString
  }

  test("format(\"matrixmarket\") reads the same rows as MatrixMarket.read") {
    val path = writeMtx(500)
    val v2 = spark.read.format("matrixmarket").load(path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val v1 = MatrixMarket.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(v2 === v1)
    assert(v2.size === 500)
  }

  test("tiny maxSplitBytes forces many splits; boundary records survive") {
    val path = writeMtx(2000)
    val len = new java.io.File(path).length()
    // ~64-byte splits -> hundreds of partitions, most boundaries
    // mid-record; every record must appear exactly once
    val df = spark.read.format("matrixmarket")
      .option("maxSplitBytes", "64").load(path)
    assert(df.rdd.getNumPartitions > 10,
      s"$len-byte file at 64-byte splits should plan many partitions")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 2000, "records lost or duplicated at split boundaries")
    assert(got.toSet === MatrixMarket.read(spark, path)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("column pruning reaches the scan (readSchema shrinks)") {
    val path = writeMtx(100)
    val df = spark.read.format("matrixmarket").load(path).select("v")
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty, "no BatchScanExec in the plan")
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("v"),
      s"pruning did not reach the scan: ${scans.head.scan.readSchema()}")
    // pruned read still returns correct values
    assert(df.agg(sum("v")).collect()(0).getDouble(0) ===
      (1 to 100).map(_ * 0.5).sum)
  }

  test("pattern files (no value column) read as 1.0 through the connector") {
    val p = Files.createTempDirectory("mtxpat").resolve("p.mtx")
    Files.writeString(p,
      "%%MatrixMarket matrix coordinate pattern general\n3 3 2\n1 2\n3 1\n")
    val got = spark.read.format("matrixmarket").load(p.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((0L, 1L, 1.0), (2L, 0L, 1.0)))
  }

  test("DSv2 write round-trips: sharded parts + header from commit messages") {
    val path = writeMtx(300)
    val df = spark.read.format("matrixmarket").load(path)
    val out = Files.createTempDirectory("mtxw").toString
    df.repartition(4).write.format("matrixmarket").mode("append").save(out)
    // header carries the true global dims + nnz, computed from the
    // tasks' commit messages (never a driver data pass)
    val headerLines = Files.readAllLines(
      java.nio.file.Paths.get(out, "header.mtx"))
    assert(headerLines.get(0).startsWith("%%MatrixMarket"))
    assert(headerLines.get(1) === "97 53 300",
      s"header dims wrong: ${headerLines.get(1)}")
    // multiple body shards, each bare COO (banner-gated reader reads
    // them without losing a first row)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length === 4, s"expected 4 shards, got ${parts.length}")
    val back = spark.read.format("matrixmarket").load(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(back.length === 300, "rows lost in write/read round-trip")
    assert(back.toSet === df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("DSv2 overwrite truncates prior parts; stale shards never resurface") {
    val out = Files.createTempDirectory("mtxow").toString
    val mk = (n: Int) => spark.range(n).selectExpr(
      "id AS row", "id AS col", "CAST(id AS DOUBLE) AS v")
    mk(50).repartition(8).write.format("matrixmarket")
      .mode("append").save(out)
    mk(10).repartition(2).write.format("matrixmarket")
      .mode("overwrite").save(out)
    val back = spark.read.format("matrixmarket").load(out).collect()
    assert(back.length === 10,
      s"overwrite left stale rows: ${back.length}")
    val headerLines = Files.readAllLines(
      java.nio.file.Paths.get(out, "header.mtx"))
    assert(headerLines.get(1) === "10 10 10")
  }

  test("comment header longer than a split never leaks the dims line") {
    // 1 KB of comment lines, then dims, then data - at 64-byte splits
    // the header spans ~16 splits; planning must start all splits past
    // it or the dims line (97 53 3) would parse as the bogus row
    // (96, 52, 3.0)
    val p = Files.createTempDirectory("mtxhdr").resolve("h.mtx")
    val comments = (1 to 20)
      .map(i => s"% padding comment line number $i for header length")
      .mkString("\n")
    Files.writeString(p,
      s"%%MatrixMarket matrix coordinate real general\n$comments\n97 53 3\n" +
        "1 1 1.0\n2 2 2.0\n3 3 3.0\n")
    val got = spark.read.format("matrixmarket")
      .option("maxSplitBytes", "64").load(p.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((0L, 0L, 1.0), (1L, 1L, 2.0), (2L, 2L, 3.0)),
      s"dims line leaked or rows lost: $got")
  }

  test("missing path errors instead of planning an empty scan") {
    val e = intercept[Exception] {
      spark.read.format("matrixmarket").load("/tmp/no/such/file.mtx").collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("not found"),
      s"wrong error: $e")
  }

  test("gzip input plans one split per file and reads whole") {
    val dir = Files.createTempDirectory("mtxgz")
    val p = dir.resolve("m.mtx.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(p))
    out.write(
      ("%%MatrixMarket matrix coordinate real general\n5 5 3\n" +
        "1 1 1.0\n2 2 2.0\n3 3 3.0\n").getBytes("UTF-8"))
    out.close()
    val df = spark.read.format("matrixmarket")
      .option("maxSplitBytes", "8").load(p.toString)
    assert(df.rdd.getNumPartitions === 1,
      "non-splittable codec must get exactly one split")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet === Set((0L, 0L, 1.0), (1L, 1L, 2.0), (2L, 2L, 3.0)))
  }

  test("in-flight temp files are invisible to a concurrent reader") {
    val out = Files.createTempDirectory("mtxtmp").toString
    spark.range(5).selectExpr("id AS row", "id AS col",
      "CAST(id AS DOUBLE) AS v")
      .coalesce(1).write.format("matrixmarket").mode("append").save(out)
    // a dead task attempt's leftover temp (never committed)
    Files.writeString(java.nio.file.Paths.get(out, ".part-00099-7.mtx.tmp"),
      "9 9 9.0\n")
    val got = spark.read.format("matrixmarket").load(out).collect()
    assert(got.length === 5, s"orphan temp leaked into the read: ${got.length}")
  }

  test("headered bz2 (splittable codec) reads whole, no dims-line leak") {
    val dir = Files.createTempDirectory("mtxbz2")
    val p = dir.resolve("m.mtx.bz2")
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(new org.apache.hadoop.conf.Configuration())
    val out = codec.createOutputStream(
      java.nio.file.Files.newOutputStream(p))
    out.write(
      ("%%MatrixMarket matrix coordinate real general\n5 5 3\n" +
        "1 1 1.0\n2 2 2.0\n3 3 3.0\n").getBytes("UTF-8"))
    out.close()
    val df = spark.read.format("matrixmarket")
      .option("maxSplitBytes", "8").load(p.toString)
    assert(df.rdd.getNumPartitions === 1,
      "compressed input must plan one split regardless of codec splittability")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet === Set((0L, 0L, 1.0), (1L, 1L, 2.0), (2L, 2L, 3.0)),
      "dims line leaked or rows lost through the bz2 path")
  }

  test("header past the planning scan cap falls back to a correct read") {
    // >1 MB of comments: dataStart gives up; the file must read as one
    // reader-side-skip split, never from a mid-header offset
    val p = Files.createTempDirectory("mtxbig").resolve("big.mtx")
    val pad = "% " + "x" * 120
    val sb = new StringBuilder("%%MatrixMarket matrix coordinate real general\n")
    (1 to 10000).foreach(_ => sb.append(pad).append('\n'))
    sb.append("7 7 2\n1 1 1.0\n2 2 2.0\n")
    Files.writeString(p, sb.toString)
    assert(new java.io.File(p.toString).length() > (1L << 20))
    val df = spark.read.format("matrixmarket")
      .option("maxSplitBytes", "4096").load(p.toString)
    assert(df.rdd.getNumPartitions === 1,
      "capped header must fall back to a single split")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet === Set((0L, 0L, 1.0), (1L, 1L, 2.0)))
  }

  test("append folds the standing header: dims/nnz describe ALL parts") {
    val out = Files.createTempDirectory("mtxapp").toString
    val mk = (n: Int) => spark.range(n).selectExpr(
      "id AS row", "id AS col", "CAST(id AS DOUBLE) AS v")
    mk(50).coalesce(1).write.format("matrixmarket").mode("append").save(out)
    mk(10).coalesce(1).write.format("matrixmarket").mode("append").save(out)
    val headerLines = Files.readAllLines(
      java.nio.file.Paths.get(out, "header.mtx"))
    assert(headerLines.get(1) === "50 50 60",
      s"append header must describe all 60 rows: ${headerLines.get(1)}")
    assert(spark.read.format("matrixmarket").load(out).count() === 60)
  }

  test("shard names embed the write's queryId; corrupt headers fail loudly") {
    val out = Files.createTempDirectory("mtxuid").toString
    val mk = (n: Int) => spark.range(n).selectExpr(
      "id AS row", "id AS col", "CAST(id AS DOUBLE) AS v")
    mk(3).coalesce(1).write.format("matrixmarket").mode("append").save(out)
    mk(3).coalesce(1).write.format("matrixmarket").mode("append").save(out)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getName)
    // two writes, same partition id and (restarting) task ids - the
    // embedded per-write queryId keeps the names distinct (the
    // cross-application collision this guards against)
    assert(parts.length === 2, s"expected 2 shards: ${parts.toSeq}")
    assert(parts.distinct.length === 2)
    parts.foreach(n => assert(
      n.matches("part-\\d{5}-\\d+-[0-9a-f-]{36}\\.mtx"),
      s"shard name missing the write uid: $n"))
    // a header that cannot be parsed must fail the append, not
    // silently undercount the standing parts (drop the local-FS
    // checksum sidecar so the corruption reaches the parser, not the
    // CRC check)
    Files.writeString(java.nio.file.Paths.get(out, "header.mtx"),
      "%%MatrixMarket matrix coordinate real general\n50 5x\n")
    Files.deleteIfExists(java.nio.file.Paths.get(out, ".header.mtx.crc"))
    val e = intercept[Exception] {
      mk(2).coalesce(1).write.format("matrixmarket").mode("append").save(out)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("corrupt header")),
      s"append over a corrupt header did not fail loudly: $e")
  }

  test("symmetric banner mirrors through the DSv2 path, across split boundaries") {
    // 200 strictly-lower-triangle entries + 5 diagonal; at 64-byte
    // splits the mirror flag must reach every split, not just the
    // header-owning one
    val p = Files.createTempDirectory("mtxsymv2").resolve("s.mtx")
    val lower = (1 to 200).map { i =>
      val r = i % 40 + 2; val c = (i * 7) % (r - 1) + 1 // c < r strictly
      s"$r $c ${i * 0.25}"
    }
    val diag = (1 to 5).map(i => s"$i $i ${i * 1.0}")
    Files.writeString(p,
      s"%%MatrixMarket matrix coordinate real symmetric\n42 42 205\n" +
        (lower ++ diag).mkString("\n") + "\n")
    val df = spark.read.format("matrixmarket")
      .option("maxSplitBytes", "64").load(p.toString)
    assert(df.rdd.getNumPartitions > 5, "expected many splits")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val stored = (lower ++ diag).map { l =>
      val t = l.split(" "); (t(0).toLong - 1, t(1).toLong - 1, t(2).toDouble)
    }
    val expected = stored.flatMap { case (r, c, v) =>
      if (r == c) Seq((r, c, v)) else Seq((r, c, v), (c, r, v))
    }
    assert(got.length === expected.length,
      s"mirror lost/duplicated rows: ${got.length} vs ${expected.length}")
    assert(got.toSet === expected.toSet)
    // same answer as the classic reader
    assert(got.toSet === MatrixMarket.read(spark, p.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("symmetric gzip resolves the banner reader-side and mirrors") {
    val dir = Files.createTempDirectory("mtxsymgz")
    val p = dir.resolve("s.mtx.gz")
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(p))
    out.write(
      ("%%MatrixMarket matrix coordinate real symmetric\n3 3 2\n" +
        "2 1 5.0\n3 3 4.0\n").getBytes("UTF-8"))
    out.close()
    val got = spark.read.format("matrixmarket").load(p.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 0L, 5.0), (0L, 1L, 5.0), (2L, 2L, 4.0)))
  }

  test("complex banner rejects at planning time, before any task runs") {
    val p = Files.createTempDirectory("mtxcpx").resolve("c.mtx")
    Files.writeString(p,
      "%%MatrixMarket matrix coordinate complex general\n2 2 1\n1 2 1.0 0.0\n")
    val e = intercept[Exception] {
      spark.read.format("matrixmarket").load(p.toString).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unsupported field 'complex'")),
      s"complex file did not reject loudly: $e")
  }

  test("symmetric pruned to (v) still mirrors off-diagonal multiplicity") {
    // pruning away row/col must not break the duplicate-count: sum(v)
    // counts each off-diagonal value twice
    val p = Files.createTempDirectory("mtxsymprune").resolve("s.mtx")
    Files.writeString(p,
      "%%MatrixMarket matrix coordinate real symmetric\n3 3 2\n2 1 5.0\n3 3 4.0\n")
    val s = spark.read.format("matrixmarket").load(p.toString)
      .agg(sum("v")).collect()(0).getDouble(0)
    assert(s === 14.0, s"pruned symmetric sum wrong: $s") // 5+5+4
  }

  test("nested subdirectories are read recursively") {
    val dir = Files.createTempDirectory("mtxnest")
    Files.createDirectories(dir.resolve("sub/deeper"))
    Files.writeString(dir.resolve("a.mtx"),
      "%%MatrixMarket matrix coordinate real general\n5 5 1\n1 1 1.0\n")
    Files.writeString(dir.resolve("sub").resolve("b.mtx"),
      "%%MatrixMarket matrix coordinate real general\n5 5 1\n2 2 2.0\n")
    Files.writeString(dir.resolve("sub/deeper").resolve("c.mtx"),
      "%%MatrixMarket matrix coordinate real general\n5 5 1\n3 3 3.0\n")
    Files.createDirectories(dir.resolve("_hidden"))
    Files.writeString(dir.resolve("_hidden").resolve("d.mtx"),
      "%%MatrixMarket matrix coordinate real general\n5 5 1\n4 4 4.0\n")
    val got = spark.read.format("matrixmarket").load(dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((0L, 0L, 1.0), (1L, 1L, 2.0), (2L, 2L, 3.0)),
      s"nested parts lost or hidden dir leaked: $got")
  }

  test("commit sweeps only its own queryId temps (concurrent append safety)") {
    val out = Files.createTempDirectory("mtxqid").toString
    // a FOREIGN write's in-flight temp (different queryId): a commit
    // of this write must leave it alone
    val foreign = java.nio.file.Paths.get(out,
      ".part-00001-3-00000000-0000-0000-0000-000000000000.mtx.tmp")
    Files.createDirectories(java.nio.file.Paths.get(out))
    Files.writeString(foreign, "1 1 1.0\n")
    spark.range(3).selectExpr("id AS row", "id AS col",
      "CAST(id AS DOUBLE) AS v")
      .coalesce(1).write.format("matrixmarket").mode("append").save(out)
    assert(Files.exists(foreign),
      "commit swept a concurrent write's live temp file")
  }

  test("directory input reads every part file, skipping _ and . files") {
    val dir = Files.createTempDirectory("mtxdir")
    Files.writeString(dir.resolve("a.mtx"),
      "%%MatrixMarket matrix coordinate real general\n5 5 2\n1 1 1.0\n2 2 2.0\n")
    Files.writeString(dir.resolve("b.mtx"),
      "%%MatrixMarket matrix coordinate real general\n5 5 1\n3 3 3.0\n")
    Files.writeString(dir.resolve("_SUCCESS"), "")
    val got = spark.read.format("matrixmarket").load(dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((0L, 0L, 1.0), (1L, 1L, 2.0), (2L, 2L, 3.0)))
  }
}
