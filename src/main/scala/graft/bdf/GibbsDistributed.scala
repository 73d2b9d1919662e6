package graft.bdf

import breeze.linalg.{cholesky, DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fully distributed Gibbs sweep: factor matrices never leave the
  * cluster. Where [[Gibbs]] collects each entity's N x K factors to the
  * driver and broadcasts them (the SharedArray analog — right up to the
  * point where N x K outgrows driver/broadcast memory), this path keeps
  * every factor table as a DataFrame (id, f: Array[Double]) and:
  *
  *  - builds the per-observation opposite-mode product z by JOINING the
  *    COO with each other mode's factor table (shuffle joins on the
  *    entity ids — the ALS in/out-block exchange expressed as joins,
  *    so AQE picks broadcast automatically while a side still fits and
  *    degrades to sort-merge when it doesn't);
  *  - draws each entity's K-dim conditional in groupByKey.mapGroups
  *    exactly as the broadcast path does (counter-based RNG, so the
  *    per-entity draws are partitioning-invariant; the NW sufficient
  *    statistics and CG matvecs sum doubles via [[DetSum]] in
  *    partition-id order, so full runs are bit-stable for a fixed
  *    partitioning — the sums still reorder if the partitioning
  *    itself changes);
  *  - aggregates the Normal-Wishart sufficient statistics
  *    (n, sum u, sum u u^T) with one treeAggregate pass instead of
  *    iterating driver-side rows;
  *  - localCheckpoints the new factor tables each sweep to truncate
  *    lineage.
  *
  * Sampling math is identical to [[Gibbs]] (BPMF ICML'08 §3.1;
  * Macau arXiv:1509.04610 §2.3-2.4 and the §3.2 side-information link,
  * solved with the distributed CG so X never leaves the cluster).
  */
object GibbsDistributed {
  import Gibbs.{NW, Options, Result}

  def train(spark: SparkSession, rd: RelationData, test: DataFrame,
            opts: Options): Result = {
    import spark.implicits._
    val k = opts.numLatent
    val entNames = rd.entities.keys.toSeq.sorted
    val sizes = entNames.map(e => e -> rd.entities(e).numItems).toMap
    val coos: Seq[(Relation, DataFrame)] = rd.relations.map(r => r -> r.coo.persist())
    val testCoo = test.persist()
    val seed = opts.seed

    // --- factor tables, initialized by counter RNG (id-addressed, so
    // identical to the broadcast path's init) ---
    val factors = scala.collection.mutable.Map(entNames.map { e =>
      val eHash = e.hashCode.toLong
      val kk = k
      e -> spark.range(sizes(e)).as[Long].map { id =>
        (id, Array.tabulate(kk)(j =>
          0.3 * CbRng.gaussian(seed, -1L, eHash, id, j.toLong)))
      }.toDF("id", "f").localCheckpoint(true)
    }: _*)

    // side-info tables stay distributed; only beta (F x K) and the NW
    // state live on the driver — the Macau link solve runs through the
    // distributed CG (Cg.solveNormal), so neither X nor X^T X ever
    // materializes in one place. A side table with (indices, values)
    // columns is treated as sparse CSR rows (the reference's fingerprint
    // matrices, F ~ 1e5 with ~100 nnz/row — dense rows would be 800 KB).
    val sideSparse: Map[String, Boolean] = rd.entities.collect {
      case (name, Entity(_, _, Some(sd))) => name -> sd.columns.contains("indices")
    }
    val sideDFs: Map[String, DataFrame] = rd.entities.collect {
      case (name, Entity(_, _, Some(sd))) =>
        val proj =
          if (sd.columns.contains("indices"))
            sd.select(col("id").cast("long").as("id"), col("indices"), col("values"))
          else sd.select(col("id").cast("long").as("id"), col("features"))
        name -> proj.persist()
    }
    val fDims: Map[String, Int] = sideDFs.map { case (e, sd) =>
      e -> (if (sideSparse(e)) {
              val mx = sd.select(max(expr("array_max(indices)"))).head()
              require(!mx.isNullAt(0),
                s"sparse side table for entity $e has no nonzero features")
              mx.getInt(0) + 1
            } else sd.select(size(col("features"))).head().getInt(0))
    }
    // (id, shift = beta^T x_i), refreshed each sweep
    val linkShift = scala.collection.mutable.Map[String, DataFrame]()
    val betas = scala.collection.mutable.Map[String, DenseMatrix[Double]]()
    val lambdaBetas = scala.collection.mutable.Map[String, Double]()
    var lastHyper: Map[String, Gibbs.NW] = Map.empty

    val rmseHist = scala.collection.mutable.ArrayBuffer[Double]()
    val sampleRmseHist = scala.collection.mutable.ArrayBuffer[Double]()
    var predSum: Option[DataFrame] = None
    var nSamples = 0
    // thinned per-sample retention (Options.keepSamples), same
    // discipline as the broadcast mode: checkpoint each retained
    // 3-col sample, union lazily at the end
    val keptSamples = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var alphaCur = opts.alpha

    /** z = elementwise product over the given modes' factor rows,
      * joined onto the COO. */
    def withZ(coo: DataFrame, rel: Relation, modes: Seq[Int]): DataFrame = {
      var df = coo.withColumn("z", expr(s"array_repeat(1.0D, $k)"))
      modes.foreach { om =>
        val f = factors(rel.modeEntities(om))
          .select(col("id").as(s"fid$om"), col("f").as(s"f$om"))
        df = df.join(f, col("ids").getItem(om) === col(s"fid$om"))
          .withColumn("z", expr(s"zip_with(z, f$om, (a, b) -> a * b)"))
          .drop(s"fid$om", s"f$om")
      }
      df
    }

    for (iter <- 0 until (opts.burnin + opts.samples)) {
      // -- (a) NW hyperprior from distributed sufficient statistics
      //       (factors centered by the link shift when side info exists) --
      val hyper: Map[String, NW] = entNames.map { e =>
        val kk = k
        // LEFT joins throughout: an entity with no side row (a sparse
        // COO source legally omits all-zero rows) has zero link shift,
        // and must never fall out of the model
        val centered = linkShift.get(e) match {
          case Some(sh) => factors(e).join(sh, Seq("id"), "left")
            .select(when(col("shift").isNull, col("f"))
              .otherwise(expr("zip_with(f, shift, (a, b) -> a - b)")).as("f"))
          case None => factors(e).select("f")
        }
        // one DetSum pass for [count, sum u, sum u u^T] — deterministic
        // for a fixed partitioning (treeAggregate merges in task-arrival
        // order, which is not)
        val stats = DetSum.sum(
          centered.as[Array[Double]].rdd.mapPartitionsWithIndex { (pid, it) =>
            val buf = new Array[Double](1 + kk + kk * kk)
            it.foreach { f =>
              buf(0) += 1.0
              var i = 0
              while (i < kk) {
                buf(1 + i) += f(i)
                var j = 0
                while (j < kk) { buf(1 + kk + i * kk + j) += f(i) * f(j); j += 1 }
                i += 1
              }
            }
            Iterator((pid, buf))
          }, 1 + kk + kk * kk)
        val n = stats(0).toLong
        val mean = DenseVector(java.util.Arrays.copyOfRange(stats, 1, 1 + kk)) / n.toDouble
        val scatter = new DenseMatrix(kk, kk,
          java.util.Arrays.copyOfRange(stats, 1 + kk, 1 + kk + kk * kk)) -
          (mean * mean.t) * n.toDouble
        e -> Gibbs.sampleNWFromStats(n, mean, scatter, seed, iter, e.hashCode)
      }.toMap
      lastHyper = hyper

      // -- (b) side-info link draw: noise-injected centered target
      //       (distributed map) -> distributed CG -> refreshed shift --
      sideDFs.foreach { case (e, sd) =>
        val nw = hyper(e)
        val lb = lambdaBetas.getOrElse(e, opts.lambdaBeta)
        val bMu = spark.sparkContext.broadcast(nw.mu.toArray)
        val kk = k; val it = iter.toLong; val tagL = e.hashCode.toLong
        // beta's conditional is matrix-normal with row precision
        // (X^T X + lambda I) and column covariance Lambda^-1: inject one
        // N(0, Lambda^-1) row per entity (E1, distributed) and fold
        // sqrt(lambda) E2 (F x K, driver-sized) through the same solve
        val lLam = cholesky((nw.lambda + nw.lambda.t) * 0.5)
        val bLamL = spark.sparkContext.broadcast(lLam.toArray) // column-major k x k
        val target = factors(e).as[(Long, Array[Double])].map { case (id, f) =>
          val lmat = new DenseMatrix[Double](kk, kk, bLamL.value)
          val eps = DenseVector.tabulate(kk)(j =>
            CbRng.gaussian(seed, it, tagL ^ 0x5ea1L, id, j.toLong))
          val e1 = Gibbs.upperSolveT(lmat, eps) // N(0, Lambda^-1)
          (id, Array.tabulate(kk)(j => f(j) - bMu.value(j) + e1(j)))
        }.toDF("id", "target")
        val sqLb = math.sqrt(lb)
        val fD0 = fDims(e)
        val e2 = DenseMatrix.zeros[Double](fD0, kk)
        var fi = 0
        while (fi < fD0) {
          val eps = DenseVector.tabulate(kk)(j =>
            CbRng.gaussian(seed, it, tagL ^ 0x0e2eL, fi.toLong, j.toLong))
          e2(fi, ::) := (Gibbs.upperSolveT(lLam, eps) * sqLb).t
          fi += 1
        }
        val beta =
          if (sideSparse(e)) {
            val xt = sd.join(target, "id").select("indices", "values", "target")
            Cg.solveNormalSparse(spark, xt, fDims(e), kk, lb,
              rhsExtra = Some(e2))
          } else {
            val xt = sd.join(target, "id").select("features", "target")
            Cg.solveNormal(spark, xt, fDims(e), kk, lb,
              rhsExtra = Some(e2))
          }
        betas(e) = beta
        if (opts.sampleLambdaBeta)
          lambdaBetas(e) = Gibbs.drawLambdaBeta(beta, nw.lambda, seed, iter, e.hashCode)
        val bBeta = spark.sparkContext.broadcast(beta.toArray) // column-major F x K
        val fD = fDims(e)
        linkShift(e) =
          (if (sideSparse(e))
             sd.as[(Long, Seq[Int], Seq[Double])].map { case (id, ix, v) =>
               val shift = new Array[Double](kk)
               var j = 0
               while (j < kk) {
                 var acc = 0.0; var q = 0
                 while (q < ix.length) { acc += v(q) * bBeta.value(j * fD + ix(q)); q += 1 }
                 shift(j) = acc; j += 1
               }
               (id, shift)
             }
           else
             sd.as[(Long, Seq[Double])].map { case (id, x) =>
               val shift = new Array[Double](kk)
               var j = 0
               while (j < kk) {
                 var acc = 0.0; var i2 = 0
                 while (i2 < fD) { acc += x(i2) * bBeta.value(j * fD + i2); i2 += 1 }
                 shift(j) = acc; j += 1
               }
               (id, shift)
             }).toDF("id", "shift").localCheckpoint(true)
      }

      // -- (c) per-mode conditional draws via joins --
      for (e <- entNames) {
        val contribs = coos.flatMap { case (r, coo) =>
          r.modeEntities.zipWithIndex.collect {
            case (ent, m) if ent == e =>
              val base = withZ(coo, r, r.modeEntities.indices.filterNot(_ == m))
              if (!opts.binaryProbit) {
                // per-relation noise precision (Macau §2.3), per row
                base.select(col("ids").getItem(m).as("id"), col("z"), col("v"),
                            lit(r.alpha.getOrElse(alphaCur)).as("aw"))
              } else {
                // Albert-Chib latent: the prediction needs THIS mode's
                // current factor too — one more join, then the
                // truncated-normal draw per cell (counter-RNG, alpha=1)
                val fSelf = factors(e)
                  .select(col("id").as("sfid"), col("f").as("fself"))
                val relTag = r.name.hashCode.toLong ^ (m.toLong << 17) ^ 0x9b17L
                val kk2 = k; val seedL = seed; val itL = iter.toLong
                base.select(col("ids"), col("ids").getItem(m).as("id"),
                            col("z"), col("v"))
                  .join(fSelf, col("id") === col("sfid"))
                  .select("ids", "id", "z", "v", "fself")
                  .as[(Seq[Long], Long, Array[Double], Double, Array[Double])]
                  .map { case (ids, id, z, v, fself) =>
                    var pred = 0.0
                    var j = 0
                    while (j < kk2) { pred += z(j) * fself(j); j += 1 }
                    val ck = ids.foldLeft(0L)((acc2, i) => acc2 * 1000003L + i)
                    val u = CbRng.uniform(seedL, itL, relTag, ck)
                    (id, z, Gibbs.Probit.truncatedNormal(pred, v > 0.5, u), 1.0)
                  }.toDF("id", "z", "v", "aw")
              }
          }
        }
        val all0 = contribs.reduce(_ unionByName _)
        // side info shifts the prior mean per entity: mu0 = mu + beta^T x_i
        val all = linkShift.get(e) match {
          case Some(sh) =>
            all0.join(sh.select(col("id").as("sid"), col("shift")),
                      col("id") === col("sid"), "left")
              .select(col("id"), col("z"), col("v"), col("aw"), col("shift"))
          case None =>
            all0.withColumn("shift", lit(null).cast("array<double>"))
              .select(col("id"), col("z"), col("v"), col("aw"), col("shift"))
        }
        val nw = hyper(e)
        val bMu = spark.sparkContext.broadcast(nw.mu.toArray)
        val bLam = spark.sparkContext.broadcast(nw.lambda.toArray)
        val kk = k; val it = iter.toLong
        val eHash = e.hashCode.toLong
        val drawn = all.as[(Long, Array[Double], Double, Double, Array[Double])]
          .groupByKey(_._1)
          .mapGroups { (id, rows) =>
            // accumulate likelihood terms first so the prior mean (which
            // depends on the row-carried shift) can be applied at the end
            val sZZ = DenseMatrix.zeros[Double](kk, kk)
            val sZv = DenseVector.zeros[Double](kk)
            var shiftArr: Array[Double] = null
            rows.foreach { case (_, z, v, aw, sh) =>
              if (shiftArr == null && sh != null) shiftArr = sh
              var r0 = 0
              while (r0 < kk) {
                val zr = z(r0) * aw
                var c0 = 0
                while (c0 < kk) { sZZ(r0, c0) += zr * z(c0); c0 += 1 }
                sZv(r0) += zr * v
                r0 += 1
              }
            }
            val lam = new DenseMatrix[Double](kk, kk, bLam.value.clone())
            val mu0 = DenseVector(bMu.value)
            if (shiftArr != null) { mu0 :+= DenseVector(shiftArr) }
            val prec = lam + sZZ
            val rhs = (lam * mu0) + sZv
            val l = cholesky(prec)
            val y = Gibbs.lowerSolve(l, rhs)
            val mean = Gibbs.upperSolveT(l, y)
            val eps = DenseVector.tabulate(kk)(j =>
              CbRng.gaussian(seed, it, eHash, id, j.toLong))
            val u = mean + Gibbs.upperSolveT(l, eps)
            (id, u.toArray)
          }.toDF("id", "f")

        // unobserved entities keep a pure prior draw (distributed anti-join)
        val lamArr = nw.lambda.toArray
        val muArr = nw.mu.toArray
        val unseen = factors(e).select("id")
          .join(drawn.select(col("id").as("did")), col("id") === col("did"), "left_anti")
        val unseenWithShift = linkShift.get(e) match {
          case Some(sh) =>
            unseen.join(sh.select(col("id").as("sid"), col("shift")),
                        col("id") === col("sid"), "left")
              .select(col("id"), col("shift"))
          case None => unseen.withColumn("shift", lit(null).cast("array<double>"))
        }
        val prior = unseenWithShift.as[(Long, Array[Double])].map { case (id, sh) =>
          val lChol = cholesky(new DenseMatrix[Double](kk, kk, lamArr.clone()))
          val eps = DenseVector.tabulate(kk)(j =>
            CbRng.gaussian(seed, it, eHash + 7L, id, j.toLong))
          val mu0 = DenseVector(muArr.clone())
          if (sh != null) { mu0 :+= DenseVector(sh) }
          val u = mu0 + Gibbs.upperSolveT(lChol, eps)
          (id, u.toArray)
        }.toDF("id", "f")

        val next = drawn.unionByName(prior).localCheckpoint(true)
        factors(e) = next
      }

      // -- (d) noise precision draw from residuals (Macau §2.1) —
      //       SSE over relation 0's observed cells in one distributed
      //       pass; the Gamma draw runs on the driver like the
      //       broadcast path --
      if (opts.sampleAlpha) {
        val (rel0, coo0) = coos.head
        val r = withZ(coo0.select(col("ids"), col("v")), rel0,
            rel0.modeEntities.indices)
          .select(col("v"),
                  expr("aggregate(z, 0D, (acc, x) -> acc + x)").as("pred"))
          .agg(sum(pow(col("v") - col("pred"), 2)).as("sse"),
               count(lit(1)).as("n"))
          .head()
        val rng = new RngStream(seed, 1000L + iter)
        alphaCur = rng.nextGamma(1.0 + r.getLong(1) / 2.0) /
          (1.0 + r.getDouble(0) / 2.0)
      }

      // -- (e) post burn-in: fold prediction into the running mean --
      if (iter >= opts.burnin) {
        val rel = rd.relations.head
        // carry v and materialize ONCE: the predSum fold and the
        // per-sample RMSE both read the same cached blocks
        val p = withZ(testCoo.select(col("row_id"), col("ids"), col("v")), rel,
            rel.modeEntities.indices)
          .select(col("row_id"), col("v"),
                  expr("aggregate(z, 0D, (acc, x) -> acc + x)").as("pred"))
          .localCheckpoint(true)
        predSum = predSum match {
          case None => Some(p
            .select(col("row_id"), col("pred").as("pred_sum"),
                    (col("pred") * col("pred")).as("pred_sq_sum"))
            .localCheckpoint(true))
          case Some(acc) =>
            val next = acc.join(p, "row_id")
              .select(col("row_id"),
                      (col("pred_sum") + col("pred")).as("pred_sum"),
                      (col("pred_sq_sum") + col("pred") * col("pred"))
                        .as("pred_sq_sum"))
              .localCheckpoint(true)
            acc.unpersist()
            Some(next)
        }
        nSamples += 1
        val sIdx = iter - opts.burnin
        if (Gibbs.retainSample(sIdx, opts.samples, opts.keepSamples))
          keptSamples += p
            .select(col("row_id"), lit(sIdx).as("sample_idx"), col("pred"))
            .localCheckpoint(true)
        val cur = currentPrediction(testCoo, predSum.get, nSamples, opts)
        val rmse = math.sqrt(cur.select(avg(pow(col("pred") - col("v"), 2))).head().getDouble(0))
        rmseHist += rmse
        // the SAMPLE's own RMSE (stationary trace for Diagnostics.rHat)
        sampleRmseHist += math.sqrt(
          p.select(avg(pow(col("pred") - col("v"), 2))).head().getDouble(0))
      }
    }

    val preds = currentPrediction(testCoo, predSum.get, nSamples, opts)
    Result(preds, rmseHist.toSeq, rmseHist.last, factors.toMap,
      mode = "distributed",
      predMoments = Some(Gibbs.momentsTable(testCoo, predSum.get, nSamples)),
      links = betas.map { case (e, b) =>
        e -> Array.tabulate(b.rows)(i => Array.tabulate(b.cols)(j => b(i, j)))
      }.toMap,
      priorMu = lastHyper.map { case (e, nw) => e -> nw.mu.toArray },
      linkPrecisions = betas.keys.map(e =>
        e -> lambdaBetas.getOrElse(e, opts.lambdaBeta)).toMap,
      sampleRmseHistory = sampleRmseHist.toSeq,
      samplePreds =
        if (keptSamples.isEmpty) None
        else Some(keptSamples.reduce(_ unionByName _)))
  }

  private def currentPrediction(testCoo: DataFrame, predSum: DataFrame,
                                nSamples: Int, opts: Options): DataFrame = {
    val p = testCoo.join(predSum, "row_id")
      .withColumn("pred", col("pred_sum") / nSamples)
      .withColumn("pred_std", sqrt(greatest(lit(0.0),
        col("pred_sq_sum") / nSamples - pow(col("pred_sum") / nSamples, 2))))
    opts.clamp match {
      case Some((lo, hi)) =>
        p.withColumn("pred", least(greatest(col("pred"), lit(lo)), lit(hi)))
          .select("row_id", "ids", "v", "pred", "pred_std")
      case None => p.select("row_id", "ids", "v", "pred", "pred_std")
    }
  }
}
