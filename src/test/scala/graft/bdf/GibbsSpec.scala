package graft.bdf

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-fixture factorization tests (SURVEY.md §5.4): a rank-2
  * synthetic matrix must be recovered well below the
  * predict-the-global-mean baseline, deterministically. */
class GibbsSpec extends SparkSpec {

  private def rank2Matrix(nRows: Int, nCols: Int, seed: Long): Seq[(Long, Long, Double)] = {
    def u(i: Int, j: Int) = CbRng.gaussian(seed, 1L, i.toLong, j.toLong)
    def v(i: Int, j: Int) = CbRng.gaussian(seed, 2L, i.toLong, j.toLong)
    for (i <- 0 until nRows; j <- 0 until nCols) yield {
      val x = u(i, 0) * v(j, 0) + u(i, 1) * v(j, 1) +
        0.05 * CbRng.gaussian(seed, 3L, i.toLong, j.toLong)
      (i.toLong, j.toLong, x)
    }
  }

  test("BPMF recovers a rank-2 matrix below the mean-baseline RMSE") {
    val s = spark
    import s.implicits._
    val cells = rank2Matrix(40, 30, seed = 7L)
    val df = cells.toDF("row", "col", "v")
    val res = Macau.fit(spark, df, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 8, burnin = 6, samples = 6, alpha = 20.0, seed = 11L),
      testFraction = 0.2)

    // baseline: predict the global mean of the full matrix
    val stats = df.select(avg($"v").as("m"), stddev_pop($"v").as("sd")).head()
    val baseline = stats.getDouble(1)
    assert(res.predictions.count() > 0)
    assert(res.finalRmse < 0.5 * baseline,
      s"rmse ${res.finalRmse} not < 0.5 * baseline $baseline")
    // posterior averaging should not be worse than the first sample
    assert(res.rmseHistory.last <= res.rmseHistory.head + 1e-9)
    // posterior predictive std: finite, non-negative, and actually
    // varying across samples for at least some cells
    val stds = res.predictions.select("pred_std").collect().map(_.getDouble(0))
    assert(stds.forall(x => x >= 0.0 && !x.isNaN))
    assert(stds.exists(_ > 0.0))
  }

  test("Gibbs is deterministic for a fixed seed") {
    val s = spark
    import s.implicits._
    val df = rank2Matrix(20, 15, seed = 3L).toDF("row", "col", "v")
    val opts = Gibbs.Options(numLatent = 4, burnin = 2, samples = 2, seed = 5L)
    val r1 = Macau.fit(spark, df, Seq("row", "col"), "v", opts)
    val r2 = Macau.fit(spark, df, Seq("row", "col"), "v", opts)
    assert(r1.finalRmse === r2.finalRmse)
  }

  test("3-mode tensor factorization runs and beats the zero predictor") {
    val s = spark
    import s.implicits._
    def f(stream: Long, i: Int, j: Int) = CbRng.gaussian(13L, stream, i.toLong, j.toLong)
    val cells = for (i <- 0 until 12; j <- 0 until 10; k <- 0 until 6) yield {
      val x = (0 until 2).map(r => f(1, i, r) * f(2, j, r) * f(3, k, r)).sum +
        0.05 * CbRng.gaussian(13L, 4L, (i * 100 + j * 10 + k).toLong, 0L)
      (i.toLong, j.toLong, k.toLong, x)
    }
    val df = cells.toDF("a", "b", "c", "v")
    val res = Macau.fit(spark, df, Seq("a", "b", "c"), "v",
      Gibbs.Options(numLatent = 4, burnin = 4, samples = 4, alpha = 20.0, seed = 17L))
    val sd = df.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < sd, s"tensor rmse ${res.finalRmse} not < sd $sd")
  }

  test("side information shifts the latent mean (Macau link term)") {
    val s = spark
    import s.implicits._
    // rows cluster by a binary side feature; values = feature effect + noise
    val n = 30; val m = 20
    val cells = for (i <- 0 until n; j <- 0 until m) yield {
      val g = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, j.toLong, g + 0.1 * CbRng.gaussian(23L, 1L, i.toLong, j.toLong))
    }
    val df = cells.toDF("row", "col", "v")
    val side = (0 until n).map(i => (i.toLong, Array(if (i % 2 == 0) 1.0 else -1.0)))
      .toDF("id", "features")
    val rd0 = RelationData.fromDF(df, Seq("row", "col"), "v")
    val rd = rd0.copy(entities = rd0.entities.updated("row",
      rd0.entities("row").copy(side = Some(side))))
    val split = Macau.assignToTest(rd, 0.2)
    val res = Macau.macau(spark, split.train, split.test,
      Gibbs.Options(numLatent = 4, burnin = 4, samples = 4, alpha = 20.0, seed = 29L))
    val sd = df.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < sd, s"side-info rmse ${res.finalRmse} not < sd $sd")
  }

  test("distributed-factors mode recovers the rank-2 matrix too") {
    val s = spark
    import s.implicits._
    val cells = rank2Matrix(40, 30, seed = 7L)
    val df = cells.toDF("row", "col", "v")
    val res = Macau.fit(spark, df, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 8, burnin = 4, samples = 4, alpha = 20.0,
        seed = 11L, distributedFactors = Some(true)),
      testFraction = 0.2)
    val baseline = df.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < 0.5 * baseline,
      s"distributed rmse ${res.finalRmse} not < 0.5 * baseline $baseline")
    // the distributed path surfaces the same persistable uncertainty
    // state as the broadcast path, and it derives the SAME predictions
    assert(res.mode === "distributed")
    assert(res.predMoments.nonEmpty,
      "distributed train did not surface the moments table")
    val fromMoments = Macau.predictionsFromMoments(res.predMoments.get)
      .select("row_id", "pred", "pred_std").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val inRun = res.predictions.select("row_id", "pred", "pred_std").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(fromMoments === inRun,
      "distributed moments diverged from in-run predictions")
  }

  test("auto mode switch routes by the broadcast driver footprint") {
    val s = spark
    import s.implicits._
    val df = rank2Matrix(20, 15, seed = 3L).toDF("row", "col", "v")
    // footprint here = (20 + 15) entities x k=4 = 140 doubles
    val base = Gibbs.Options(numLatent = 4, burnin = 1, samples = 1, seed = 5L)
    val small = Macau.fit(spark, df, Seq("row", "col"), "v",
      base, testFraction = 0.2)
    assert(small.mode == "broadcast",
      s"tiny problem should stay on the broadcast path, got ${small.mode}")
    val forced = Macau.fit(spark, df, Seq("row", "col"), "v",
      base.copy(autoDistributedDoubles = 100L), testFraction = 0.2)
    assert(forced.mode == "distributed",
      s"footprint 140 > threshold 100 should switch, got ${forced.mode}")
    // explicit flag always wins over the heuristic
    val explicit = Macau.fit(spark, df, Seq("row", "col"), "v",
      base.copy(autoDistributedDoubles = 100L,
        distributedFactors = Some(false)), testFraction = 0.2)
    assert(explicit.mode == "broadcast")
  }

  test("multi-relation coupling: a second relation sharing the row entity helps") {
    val s = spark
    import s.implicits._
    // shared row factors drive BOTH relations; train jointly (Macau §2.3)
    def u(i: Int, r: Int) = CbRng.gaussian(41L, 1L, i.toLong, r.toLong)
    def v1(j: Int, r: Int) = CbRng.gaussian(41L, 2L, j.toLong, r.toLong)
    def v2(j: Int, r: Int) = CbRng.gaussian(41L, 3L, j.toLong, r.toLong)
    val r1 = for (i <- 0 until 30; j <- 0 until 20) yield
      (i.toLong, j.toLong, u(i, 0) * v1(j, 0) + u(i, 1) * v1(j, 1) +
        0.05 * CbRng.gaussian(41L, 4L, i.toLong, j.toLong))
    val r2 = for (i <- 0 until 30; j <- 0 until 15) yield
      (i.toLong, j.toLong, u(i, 0) * v2(j, 0) + u(i, 1) * v2(j, 1) +
        0.05 * CbRng.gaussian(41L, 5L, i.toLong, j.toLong))
    val df1 = r1.toDF("row", "col", "v")
    val df2 = r2.toDF("row", "col2", "v")
    val rd = RelationData(
      Map("row" -> Entity("row", 30), "col" -> Entity("col", 20),
          "col2" -> Entity("col2", 15)),
      Seq(Relation("r1", df1, Seq("row", "col"), Seq("row", "col"), "v"),
          Relation("r2", df2, Seq("row", "col2"), Seq("row", "col2"), "v")))
    val split = Macau.assignToTest(rd, 0.2)
    val res = Macau.macau(spark, split.train, split.test,
      Gibbs.Options(numLatent = 6, burnin = 4, samples = 4, alpha = 20.0, seed = 43L))
    val sd = df1.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < 0.6 * sd,
      s"multi-relation rmse ${res.finalRmse} not < 0.6 * sd $sd")
  }

  test("sampled noise precision (alpha) still converges") {
    val s = spark
    import s.implicits._
    val df = rank2Matrix(25, 20, seed = 9L).toDF("row", "col", "v")
    val res = Macau.fit(spark, df, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 6, burnin = 4, samples = 4, sampleAlpha = true,
        alpha = 1.0, seed = 19L))
    val sd = df.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < sd, s"sampled-alpha rmse ${res.finalRmse} not < sd $sd")
  }

  test("distributed-factors mode samples the noise precision too") {
    val s = spark
    import s.implicits._
    val df = rank2Matrix(25, 20, seed = 9L).toDF("row", "col", "v")
    val res = Macau.fit(spark, df, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 6, burnin = 3, samples = 3, sampleAlpha = true,
        alpha = 1.0, seed = 19L, distributedFactors = Some(true)))
    val sd = df.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < sd,
      s"distributed sampled-alpha rmse ${res.finalRmse} not < sd $sd")
  }

  test("distributed-factors mode handles a 3-mode tensor") {
    val s = spark
    import s.implicits._
    def f(stream: Long, i: Int, j: Int) = CbRng.gaussian(13L, stream, i.toLong, j.toLong)
    val cells = for (i <- 0 until 10; j <- 0 until 8; k2 <- 0 until 5) yield {
      val x = (0 until 2).map(r => f(1, i, r) * f(2, j, r) * f(3, k2, r)).sum +
        0.05 * CbRng.gaussian(13L, 4L, (i * 100 + j * 10 + k2).toLong, 0L)
      (i.toLong, j.toLong, k2.toLong, x)
    }
    val df = cells.toDF("a", "b", "c", "v")
    val res = Macau.fit(spark, df, Seq("a", "b", "c"), "v",
      Gibbs.Options(numLatent = 4, burnin = 3, samples = 3, alpha = 20.0,
        seed = 17L, distributedFactors = Some(true)))
    val sd = df.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < sd, s"distributed tensor rmse ${res.finalRmse} not < sd $sd")
  }

  test("distributed-factors mode with side info (full Macau, nothing on the driver)") {
    val s = spark
    import s.implicits._
    val n = 30; val m = 20
    val cells = for (i <- 0 until n; j <- 0 until m) yield {
      val g = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, j.toLong, g + 0.1 * CbRng.gaussian(23L, 1L, i.toLong, j.toLong))
    }
    val df = cells.toDF("row", "col", "v")
    val side = (0 until n).map(i => (i.toLong, Array(if (i % 2 == 0) 1.0 else -1.0)))
      .toDF("id", "features")
    val rd0 = RelationData.fromDF(df, Seq("row", "col"), "v")
    val rd = rd0.copy(entities = rd0.entities.updated("row",
      rd0.entities("row").copy(side = Some(side))))
    val split = Macau.assignToTest(rd, 0.2)
    val res = Macau.macau(spark, split.train, split.test,
      Gibbs.Options(numLatent = 4, burnin = 3, samples = 3, alpha = 20.0,
        seed = 37L, distributedFactors = Some(true)))
    val sd = df.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < sd,
      s"distributed side-info rmse ${res.finalRmse} not < sd $sd")
  }

  test("distributed-factors mode with SPARSE side info (CSR one-hot rows)") {
    val s = spark
    import s.implicits._
    val n = 30; val m = 20
    val cells = for (i <- 0 until n; j <- 0 until m) yield {
      val g = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, j.toLong, g + 0.1 * CbRng.gaussian(23L, 1L, i.toLong, j.toLong))
    }
    val df = cells.toDF("row", "col", "v")
    // sparse one-hot group feature: indices = [group], values = [1.0]
    val side = (0 until n).map(i => (i.toLong, Seq(i % 2), Seq(1.0)))
      .toDF("id", "indices", "values")
    val rd0 = RelationData.fromDF(df, Seq("row", "col"), "v")
    val rd = rd0.copy(entities = rd0.entities.updated("row",
      rd0.entities("row").copy(side = Some(side))))
    val split = Macau.assignToTest(rd, 0.2)
    val res = Macau.macau(spark, split.train, split.test,
      Gibbs.Options(numLatent = 4, burnin = 3, samples = 3, alpha = 20.0,
        seed = 37L, distributedFactors = Some(true)))
    val sd = df.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < sd,
      s"sparse side-info rmse ${res.finalRmse} not < sd $sd")
  }

  test("binary probit (Albert-Chib) extension ranks positives above negatives") {
    val s = spark
    import s.implicits._
    // rank-1 latent scores -> probit probabilities -> Bernoulli labels
    val n = 40; val m = 30
    def uF(i: Int) = CbRng.gaussian(51L, 1L, i.toLong, 0L)
    def wF(j: Int) = CbRng.gaussian(51L, 2L, j.toLong, 0L)
    val cells = for (i <- 0 until n; j <- 0 until m) yield {
      val score = 1.5 * uF(i) * wF(j)
      val p = Gibbs.Probit.phi(score)
      val y = if (CbRng.uniform(51L, 3L, i.toLong, j.toLong) < p) 1.0 else 0.0
      (i.toLong, j.toLong, y)
    }
    val df = cells.toDF("row", "col", "v")
    val res = Macau.fit(spark, df, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 4, burnin = 6, samples = 6,
        binaryProbit = true, seed = 61L), testFraction = 0.2)
    val preds = res.predictions.select("v", "pred").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val pos = preds.filter(_._1 > 0.5).map(_._2)
    val neg = preds.filter(_._1 < 0.5).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty)
    val auc = pos.map(p =>
      neg.count(_ < p) + 0.5 * neg.count(_ == p)).sum /
      (pos.length.toDouble * neg.length)
    assert(auc > 0.75, s"probit AUC $auc not > 0.75")

    // distributed-factors parity: same model, same quality bar
    val resD = Macau.fit(spark, df, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 4, burnin = 4, samples = 4,
        binaryProbit = true, seed = 61L, distributedFactors = Some(true)),
      testFraction = 0.2)
    val predsD = resD.predictions.select("v", "pred").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val posD = predsD.filter(_._1 > 0.5).map(_._2)
    val negD = predsD.filter(_._1 < 0.5).map(_._2)
    val aucD = posD.map(p =>
      negD.count(_ < p) + 0.5 * negD.count(_ == p)).sum /
      (posD.length.toDouble * negD.length)
    assert(aucD > 0.75, s"distributed probit AUC $aucD not > 0.75")
  }

  test("dense-matrix ingest (fromDense) equals the COO path bitwise") {
    val s = spark
    import s.implicits._
    val cells = rank2Matrix(20, 12, seed = 3L)
    val dense = cells.groupBy(_._1).toSeq.sortBy(_._1).map { case (i, rows) =>
      (i, rows.sortBy(_._2).map(_._3).toArray)
    }.toDF("row", "vals")
    val rdDense = RelationData.fromDense(dense, "row", "vals")
    val rdCoo = RelationData.fromDF(cells.toDF("row", "col", "v"),
      Seq("row", "col"), "v")
    val opts = Gibbs.Options(numLatent = 3, burnin = 2, samples = 2, seed = 7L)
    val r1 = Macau.macau(spark, Macau.assignToTest(rdDense, 0.2).train,
      Macau.assignToTest(rdDense, 0.2).test, opts)
    val r2 = Macau.macau(spark, Macau.assignToTest(rdCoo, 0.2).train,
      Macau.assignToTest(rdCoo, 0.2).test, opts)
    // draws are counter-based (partitioning-invariant); only the final
    // RMSE avg() accumulates in physical row order, hence the epsilon
    assert(math.abs(r1.finalRmse - r2.finalRmse) < 1e-12,
      s"${r1.finalRmse} vs ${r2.finalRmse}")
  }

  test("per-relation alpha: a zero-precision relation contributes nothing (bitwise)") {
    val s = spark
    import s.implicits._
    val cells = rank2Matrix(30, 20, seed = 7L) // dense: every id observed in r1
    val df1 = cells.toDF("row", "col", "v")
    val noise = for (i <- 0 until 30; j <- 0 until 15)
      yield (i.toLong, j.toLong, CbRng.gaussian(99L, 1L, i.toLong, j.toLong))
    val df2 = noise.toDF("row", "col2", "v")
    val opts = Gibbs.Options(numLatent = 4, burnin = 2, samples = 2,
      alpha = 20.0, seed = 31L)

    val rd1 = RelationData.fromDF(df1, Seq("row", "col"), "v")
    val s1 = Macau.assignToTest(rd1, 0.2)
    val res1 = Macau.macau(spark, s1.train, s1.test, opts)

    // same factorization + a second relation whose alpha = 0: its
    // likelihood terms are exactly zero, so every draw must be
    // bit-identical to the single-relation run
    val rd2 = RelationData(
      Map("row" -> Entity("row", 30), "col" -> Entity("col", 20),
          "col2" -> Entity("col2", 15)),
      Seq(Relation("r0", df1, Seq("row", "col"), Seq("row", "col"), "v"),
          Relation("r2", df2, Seq("row", "col2"), Seq("row", "col2"), "v",
            alpha = Some(0.0))))
    val s2 = Macau.assignToTest(rd2, 0.2)
    val res2 = Macau.macau(spark, s2.train, s2.test, opts)

    assert(res1.finalRmse === res2.finalRmse)
    assert(res1.rmseHistory === res2.rmseHistory)
  }

  test("model persistence: save -> load -> predict reproduces in-memory factors") {
    val s = spark
    import s.implicits._
    val df = rank2Matrix(25, 20, seed = 5L).toDF("row", "col", "v")
    val res = Macau.fit(spark, df, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 4, burnin = 2, samples = 2, alpha = 20.0, seed = 13L))
    assert(res.factors.keySet === Set("row", "col"))

    val dir = java.nio.file.Files.createTempDirectory("macau-model").toString
    Macau.saveModel(dir, res)
    val loaded = Macau.loadModel(spark, dir, Seq("row", "col"))

    val cells = (for (i <- 0 until 5; j <- 0 until 4)
      yield (i.toLong, j.toLong)).toDF("row", "col")
    def score(f: Map[String, org.apache.spark.sql.DataFrame]) =
      Macau.predict(spark, f, cells, Seq("row", "col"))
        .select("row", "col", "pred").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val fromMem = score(res.factors)
    val fromDisk = score(loaded)
    assert(fromMem === fromDisk)
    assert(fromMem.size === 20 && fromMem.values.forall(v => !v.isNaN))
  }

  test("saved-model uncertainty equals in-run posterior std (moments round-trip)") {
    val s = spark
    import s.implicits._
    val df = rank2Matrix(25, 20, seed = 9L).toDF("row", "col", "v")
    val clamp = Some((-3.0, 3.0))
    val res = Macau.fit(spark, df, Seq("row", "col"), "v",
      Gibbs.Options(numLatent = 4, burnin = 2, samples = 3, alpha = 20.0,
        seed = 17L, clamp = clamp))
    assert(res.predMoments.nonEmpty, "train did not surface the moments table")

    val dir = java.nio.file.Files.createTempDirectory("macau-unc").toString
    Macau.saveModel(dir, res)

    def asMap(p: org.apache.spark.sql.DataFrame) =
      p.select("row_id", "v", "pred", "pred_std").collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
        .toMap
    val inRun = asMap(res.predictions)
    // the LOADED moments answer the same uncertainty queries, bitwise
    val fromDisk = asMap(
      Macau.predictionsFromMoments(Macau.loadMoments(spark, dir), clamp))
    assert(fromDisk === inRun,
      "saved-model (pred, pred_std) diverged from the in-run values")
    assert(inRun.nonEmpty &&
      inRun.values.exists { case (_, _, sd) => sd > 0.0 })
    // the moments carry the kept-sample count (merge-ready state)
    val n = Macau.loadMoments(spark, dir).select("n_samples")
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(n === Seq(3), s"expected n_samples = 3, got $n")
  }

  test("keepSamples: saved empirical credible bounds equal in-run, both modes") {
    val s = spark
    import s.implicits._
    val df = rank2Matrix(25, 20, seed = 21L).toDF("row", "col", "v")
    for (distributed <- Seq(false, true)) {
      val res = Macau.fit(spark, df, Seq("row", "col"), "v",
        Gibbs.Options(numLatent = 4, burnin = 2, samples = 5, alpha = 20.0,
          seed = 19L, keepSamples = 5,
          distributedFactors = Some(distributed)))
      assert(res.samplePreds.nonEmpty, s"no sample trace (distributed=$distributed)")
      // keepSamples = samples retains EVERY kept sweep
      val trace = res.samplePreds.get
      val idxs = trace.select("sample_idx").distinct()
        .collect().map(_.getInt(0)).sorted.toSeq
      assert(idxs === Seq(0, 1, 2, 3, 4),
        s"retention not exhaustive at keepSamples=samples: $idxs")

      def asMap(p: org.apache.spark.sql.DataFrame) =
        p.select("row_id", "lo_pred", "hi_pred").collect()
          .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      val inRun = asMap(Macau.empiricalCredible(trace, 0.2, 0.8))
      val dir = java.nio.file.Files
        .createTempDirectory(s"macau-samp-$distributed").toString
      Macau.saveModel(dir, res)
      val fromDisk = asMap(
        Macau.empiricalCredible(Macau.loadSamples(spark, dir), 0.2, 0.8))
      assert(fromDisk === inRun,
        s"saved-sample quantiles diverged from in-run (distributed=$distributed)")
      assert(inRun.nonEmpty && inRun.values.forall { case (lo, hi) => lo <= hi })
      // order stats ARE order stats: with 5 samples, (0.2, 0.8) are the
      // 1st and 4th values — strictly inside the (min, max) envelope
      // whenever the trace varies
      val envelope = trace.groupBy("row_id")
        .agg(min("pred").as("mn"), max("pred").as("mx"))
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      assert(inRun.forall { case (id, (lo, hi)) =>
        lo >= envelope(id)._1 && hi <= envelope(id)._2 })
    }
  }

  test("keepSamples thinning: evenly spaced, bounded count") {
    // pure selector arithmetic (no Spark): 2 of 6 -> indices 2 and 5;
    // keep >= total -> all; keep = 0 -> none
    def retained(total: Int, keep: Int): Seq[Int] =
      (0 until total).filter(Gibbs.retainSample(_, total, keep))
    assert(retained(6, 2) === Seq(2, 5))
    assert(retained(5, 5) === Seq(0, 1, 2, 3, 4))
    assert(retained(3, 7) === Seq(0, 1, 2))
    assert(retained(4, 0) === Seq())
    assert(retained(10, 3).size === 3)
  }

  test("distributed CG side solver matches the driver Cholesky path's quality") {
    val s = spark
    import s.implicits._
    val n = 30; val m = 20
    val cells = for (i <- 0 until n; j <- 0 until m) yield {
      val g = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, j.toLong, g + 0.1 * CbRng.gaussian(23L, 1L, i.toLong, j.toLong))
    }
    val df = cells.toDF("row", "col", "v")
    val side = (0 until n).map(i => (i.toLong, Array(if (i % 2 == 0) 1.0 else -1.0)))
      .toDF("id", "features")
    val rd0 = RelationData.fromDF(df, Seq("row", "col"), "v")
    val rd = rd0.copy(entities = rd0.entities.updated("row",
      rd0.entities("row").copy(side = Some(side))))
    val split = Macau.assignToTest(rd, 0.2)
    val res = Macau.macau(spark, split.train, split.test,
      Gibbs.Options(numLatent = 4, burnin = 3, samples = 3, alpha = 20.0,
        seed = 29L, useCgSideSolver = true))
    val sd = df.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < sd, s"CG side-info rmse ${res.finalRmse} not < sd $sd")
  }

  test("sampled link precision (lambda_beta) still converges and is observable") {
    val s = spark
    import s.implicits._
    val n = 30; val m = 20
    val cells = for (i <- 0 until n; j <- 0 until m) yield {
      val g = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, j.toLong, g + 0.1 * CbRng.gaussian(41L, 1L, i.toLong, j.toLong))
    }
    val df = cells.toDF("row", "col", "v")
    val side = (0 until n).map(i => (i.toLong, Array(if (i % 2 == 0) 1.0 else -1.0)))
      .toDF("id", "features")
    val rd0 = RelationData.fromDF(df, Seq("row", "col"), "v")
    val rd = rd0.copy(entities = rd0.entities.updated("row",
      rd0.entities("row").copy(side = Some(side))))
    val split = Macau.assignToTest(rd, 0.2)
    val res = Macau.macau(spark, split.train, split.test,
      Gibbs.Options(numLatent = 4, burnin = 3, samples = 3, alpha = 20.0,
        seed = 43L, sampleLambdaBeta = true))
    val sd = df.select(stddev_pop($"v")).head().getDouble(0)
    assert(res.finalRmse < sd, s"sampled-lambda rmse ${res.finalRmse} not < sd $sd")
    // the drawn precision must be positive and have actually moved off
    // the fixed default
    val lp = res.linkPrecisions("row")
    assert(lp > 0.0 && math.abs(lp - Gibbs.Options().lambdaBeta) > 1e-9,
      s"lambda_beta not sampled: $lp")

    // distributed mode draws it too
    val resD = Macau.macau(spark, split.train, split.test,
      Gibbs.Options(numLatent = 4, burnin = 2, samples = 2, alpha = 20.0,
        seed = 43L, sampleLambdaBeta = true, distributedFactors = Some(true)))
    assert(resD.mode == "distributed")
    val lpD = resD.linkPrecisions("row")
    assert(lpD > 0.0 && math.abs(lpD - Gibbs.Options().lambdaBeta) > 1e-9)
  }

  test("cold start: side info alone predicts rows never observed in training") {
    val s = spark
    import s.implicits._
    // values depend ONLY on the row's side feature (plus noise), so a
    // model that learned the link matrix can score brand-new rows
    val nTrain = 30; val nCold = 10; val m = 20
    def gOf(i: Int) = if (i % 2 == 0) 1.0 else -1.0
    val train = for (i <- 0 until nTrain; j <- 0 until m) yield
      (i.toLong, j.toLong, gOf(i) + 0.1 * CbRng.gaussian(31L, 1L, i.toLong, j.toLong))
    val df = train.toDF("row", "col", "v")
    val side = (0 until nTrain).map(i => (i.toLong, Array(gOf(i))))
      .toDF("id", "features")
    val rd0 = RelationData.fromDF(df, Seq("row", "col"), "v")
    val rd = rd0.copy(entities = rd0.entities.updated("row",
      rd0.entities("row").copy(side = Some(side))))
    val split = Macau.assignToTest(rd, 0.1)
    val res = Macau.macau(spark, split.train, split.test,
      Gibbs.Options(numLatent = 4, burnin = 4, samples = 4, alpha = 20.0, seed = 37L))
    assert(res.links.contains("row") && res.priorMu.contains("row"))

    // rows nTrain..nTrain+nCold-1 were NEVER in the model — only their
    // side features exist
    val xNew = (0 until nCold).map(c => ((nTrain + c).toLong, Array(gOf(nTrain + c))))
      .toDF("id", "features")
    val coldU = Macau.coldStartFactors(spark, res, "row", xNew)
    val cells = (for (c <- 0 until nCold; j <- 0 until m)
      yield ((nTrain + c).toLong, j.toLong)).toDF("row", "col")
    val preds = Macau.predict(spark,
      res.factors + ("row" -> coldU), cells, Seq("row", "col"))
    val truth = (for (c <- 0 until nCold; j <- 0 until m) yield {
      val i = nTrain + c
      (i.toLong, j.toLong, gOf(i) + 0.1 * CbRng.gaussian(31L, 1L, i.toLong, j.toLong))
    }).toDF("row", "col", "t")
    val rmse = math.sqrt(preds.join(truth, Seq("row", "col"))
      .select(avg(pow($"pred" - $"t", 2))).head().getDouble(0))
    val sd2 = truth.select(stddev_pop($"t")).head().getDouble(0)
    assert(rmse < 0.6 * sd2,
      s"cold-start rmse $rmse not < 0.6 * baseline $sd2")
  }
}
