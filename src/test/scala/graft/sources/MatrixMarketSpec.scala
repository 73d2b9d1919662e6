package graft.sources

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.bdf.{Gibbs, Macau}

/** MatrixMarket round-trip + the reference's canonical flow: sparse file
  * -> RelationData -> macau(). */
class MatrixMarketSpec extends SparkSpec {

  private def writeSample(): String = {
    val p = Files.createTempDirectory("mtx").resolve("m.mtx")
    Files.writeString(p,
      """%%MatrixMarket matrix coordinate real general
        |% comment line
        |3 4 5
        |1 1 1.5
        |1 2 -2.0
        |2 3 0.25
        |3 1 7.0
        |3 4 -0.5
        |""".stripMargin)
    p.toString
  }

  test("reads header and 0-based COO rows") {
    val path = writeSample()
    val h = MatrixMarket.readHeader(spark, path)
    assert(h === MatrixMarket.Header(3, 4, 5))
    val df = MatrixMarket.read(spark, path)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((0L, 0L, 1.5), (0L, 1L, -2.0), (1L, 2L, 0.25),
      (2L, 0L, 7.0), (2L, 3L, -0.5)))
  }

  test("symmetric banner mirrors the stored triangle (classic path)") {
    val p = Files.createTempDirectory("mtxsym").resolve("s.mtx")
    // lower triangle of a 3x3 symmetric matrix: 2 off-diagonal + 1 diag
    Files.writeString(p,
      """%%MatrixMarket matrix coordinate real symmetric
        |3 3 3
        |2 1 5.0
        |3 2 -1.5
        |2 2 9.0
        |""".stripMargin)
    val got = MatrixMarket.read(spark, p.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // nnz doubles minus the diagonal: 3 stored -> 5 logical entries
    assert(got === Set((1L, 0L, 5.0), (0L, 1L, 5.0),
      (2L, 1L, -1.5), (1L, 2L, -1.5), (1L, 1L, 9.0)))
  }

  test("pattern and integer banners read explicitly; value column honored") {
    val pp = Files.createTempDirectory("mtxpat2").resolve("p.mtx")
    Files.writeString(pp,
      "%%MatrixMarket matrix coordinate pattern symmetric\n3 3 2\n2 1\n3 3\n")
    val pat = MatrixMarket.read(spark, pp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pat === Set((1L, 0L, 1.0), (0L, 1L, 1.0), (2L, 2L, 1.0)))
    val ip = Files.createTempDirectory("mtxint").resolve("i.mtx")
    Files.writeString(ip,
      "%%MatrixMarket matrix coordinate integer general\n2 2 2\n1 1 7\n2 2 -3\n")
    val ints = MatrixMarket.read(spark, ip.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ints === Set((0L, 0L, 7.0), (1L, 1L, -3.0)))
  }

  test("complex/hermitian/skew-symmetric/array banners reject loudly") {
    def mtx(banner: String): String = {
      val p = Files.createTempDirectory("mtxrej").resolve("r.mtx")
      Files.writeString(p, s"$banner\n2 2 1\n1 2 1.0 0.0\n")
      p.toString
    }
    for (banner <- Seq(
        "%%MatrixMarket matrix coordinate complex general",
        "%%MatrixMarket matrix coordinate real hermitian",
        "%%MatrixMarket matrix coordinate real skew-symmetric",
        "%%MatrixMarket matrix array real general")) {
      val e = intercept[Exception] {
        MatrixMarket.read(spark, mtx(banner)).collect()
      }
      assert(e.getMessage != null &&
        (e.getMessage.contains("unsupported") ||
          e.getMessage.contains("only coordinate")),
        s"banner '$banner' did not reject loudly: $e")
      val eh = intercept[Exception] {
        MatrixMarket.readHeader(spark, mtx(banner))
      }
      assert(eh.getMessage != null &&
        (eh.getMessage.contains("unsupported") ||
          eh.getMessage.contains("only coordinate")),
        s"readHeader on '$banner' did not reject loudly: $eh")
    }
  }

  test("write/read round-trips") {
    val path = writeSample()
    val df = MatrixMarket.read(spark, path)
    val out = Files.createTempDirectory("mtxout").toString
    MatrixMarket.write(df, out)
    // reassemble header + body into one file, as documented
    def partLines(dir: String): Seq[String] =
      Files.list(Paths.get(dir)).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.getFileName.toString.startsWith("part-"))
        .sortBy(_.toString).toSeq
        .flatMap(f => scala.io.Source.fromFile(f.toFile).getLines())
    val body = partLines(s"$out/body")
    val headerLines = partLines(s"$out/header")
    val merged = Files.createTempDirectory("mtx2").resolve("m.mtx")
    Files.writeString(merged, (headerLines ++ body).mkString("\n") + "\n")
    val again = MatrixMarket.read(spark, merged.toString)
    assert(again.collect().toSet === df.collect().toSet)
  }

  test("binary GCOO round-trips and reads sharded") {
    val s = spark
    import s.implicits._
    val df = Seq((0L, 0L, 1.5), (1L, 2L, -0.25), (2L, 1L, 42.0))
      .toDF("row", "col", "v")
    val dir = Files.createTempDirectory("gcoo")
    SparseBinary.writeSingle(df, s"$dir/a.gcoo", 3, 3)
    SparseBinary.writeSingle(df.filter($"row" === 0L), s"$dir/b.gcoo", 3, 3)
    // glob read: two files = two parallel tasks, union of triplets
    val back = SparseBinary.read(spark, s"$dir/*.gcoo")
    assert(back.count() === 4)
    assert(back.filter($"row" === 0L).count() === 2)
    val single = SparseBinary.read(spark, s"$dir/a.gcoo")
    assert(single.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      === Set((0L, 0L, 1.5), (1L, 2L, -0.25), (2L, 1L, 42.0)))
  }

  test("sparse .mtx feature matrix feeds the side-info link (CSR, full flow)") {
    val s = spark
    import s.implicits._
    import graft.bdf.{Entity, Relation, RelationData}
    // observations cluster by a one-hot feature carried in an .mtx file
    val n = 30; val m = 20
    val cells = for (i <- 0 until n; j <- 0 until m) yield {
      val g = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, j.toLong,
        g + 0.1 * graft.bdf.CbRng.gaussian(23L, 1L, i.toLong, j.toLong))
    }
    val mtx = (0 until n).map(i => s"${i + 1} ${i % 2 + 1} 1.0")
    val p = Files.createTempDirectory("mtxside").resolve("side.mtx")
    Files.writeString(p,
      s"%%MatrixMarket matrix coordinate real general\n$n 2 $n\n" +
        mtx.mkString("\n") + "\n")
    val side = Macau.sideFromCoo(MatrixMarket.read(spark, p.toString))
    assert(side.count() === n)

    val rd0 = RelationData.fromDF(cells.toDF("row", "col", "v"),
      Seq("row", "col"), "v")
    val rd = rd0.copy(entities = rd0.entities.updated("row",
      rd0.entities("row").copy(side = Some(side))))
    val split = Macau.assignToTest(rd, 0.2)
    val res = Macau.macau(spark, split.train, split.test,
      Gibbs.Options(numLatent = 4, burnin = 3, samples = 3, alpha = 20.0,
        seed = 37L, distributedFactors = Some(true)))
    val sd = cells.toDF("row", "col", "v")
      .select(org.apache.spark.sql.functions.stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < sd, s"mtx side-info rmse ${res.finalRmse} not < $sd")
  }

  test("sparse file feeds the reference flow: RelationData -> macau") {
    // rank-1 structured 20x15 matrix written as .mtx, then factorized
    val cells = for (i <- 0 until 20; j <- 0 until 15)
      yield s"${i + 1} ${j + 1} ${(i % 5 + 1) * (j % 3 + 1)}.0"
    val p = Files.createTempDirectory("mtx3").resolve("m.mtx")
    Files.writeString(p,
      s"%%MatrixMarket matrix coordinate real general\n20 15 ${cells.size}\n" +
        cells.mkString("\n") + "\n")
    val df = MatrixMarket.read(spark, p.toString)
    val res = Macau.fit(spark, df, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 4, burnin = 3, samples = 3, alpha = 10.0, seed = 31L))
    assert(res.predictions.count() > 0)
    assert(res.finalRmse < 4.0, s"rmse ${res.finalRmse}") // values range 1..15
  }
}
