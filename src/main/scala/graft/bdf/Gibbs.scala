package graft.bdf

import breeze.linalg.{cholesky, DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Blocked Gibbs sampler for Bayesian matrix/tensor factorization with
  * side information — the engine core mirroring the reference's
  * capabilities (BPMF ICML'08 §3.1 for the conditional draws and
  * Normal-Wishart hyperpriors; Macau arXiv:1509.04610 §2.3 multi-
  * relation coupling, §2.4 tensors, §3.2 side-information link term).
  *
  * Execution model (SURVEY.md §3.1): observations stay distributed in
  * COO DataFrames; each sweep ships the (small) opposite-mode factor
  * matrices to executors as broadcasts — the Spark analog of the
  * reference's SharedArray zero-copy factors — and draws every entity's
  * K-dim conditional IN PARALLEL via a groupBy over the entity's
  * observations (the IndexedDF inverted index materialized by the
  * shuffle, reused via persisted COO). K x K math is breeze; the
  * per-entity draw is a counter-based pure function of
  * (seed, iter, entity), so results are independent of partitioning.
  *
  * Scale path (documented, not needed at test scale): when a factor
  * matrix outgrows broadcast, swap the broadcast for the ALS block
  * exchange (org.apache.spark.ml.recommendation.ALS's in/out block
  * structure) — the sweep below is already shaped for it because every
  * update only needs (cells of entity i) x (opposite factors of those
  * cells).
  */
object Gibbs {

  final case class Options(
      numLatent: Int = 16,
      burnin: Int = 20,
      samples: Int = 30,
      alpha: Double = 4.0,           // observation noise precision
      sampleAlpha: Boolean = false,
      /** EXTENSION beyond the reference surface: treat relation values
        * as binary {0,1} and sample Albert-Chib truncated-normal
        * latents each sweep (probit link) — the model behind AUC-style
        * evaluation of binarized relations. Works in both execution
        * modes; applies to EVERY relation of the RelationData; the
        * latent likelihood fixes alpha = 1. Predictions stay on the
        * latent scale (apply Phi for probabilities) and
        * finalRmse/rmseHistory compare that latent scale against the
        * 0/1 labels — rank-based metrics (AUC) are the meaningful
        * evaluation here. */
      binaryProbit: Boolean = false,
      lambdaBeta: Double = 5.0,      // side-info link ridge precision
      /** Sample the link precision from its Gamma conditional instead
        * of keeping the fixed ridge (the full Macau §3.2 model): with
        * beta rows a priori N(0, λβ^-1 Λ^-1),
        *   λβ | beta ~ Gamma(a0 + F·K/2, b0 + tr(beta Λ beta^T)/2),
        * a0 = b0 = 1 (weakly informative), one λβ per side-equipped
        * entity, drawn on the driver each sweep (F×K state). Works in
        * both execution modes; final values observable via
        * [[Result.linkPrecisions]]. */
      sampleLambdaBeta: Boolean = false,
      /** Solve the side-info link with the distributed CG (Cg.scala)
        * instead of the driver Cholesky — the path for side matrices
        * too large for the driver (Macau §3.2). */
      useCgSideSolver: Boolean = false,
      /** Keep factor matrices as DataFrames and run the sweep with
        * shuffle joins instead of driver collection + broadcast — the
        * path for entity counts whose N x K factors no longer fit the
        * driver (see GibbsDistributed). Side info runs through the
        * distributed CG in this mode. None (default) = decide at
        * train() entry from the broadcast mode's driver footprint
        * (N x K factors + N x F densified side matrices) vs
        * [[autoDistributedDoubles]]. */
      distributedFactors: Option[Boolean] = None,
      /** Auto-mode threshold: broadcast mode is allowed up to this many
        * driver-resident doubles (default 32M ~ 256 MB). */
      autoDistributedDoubles: Long = 32L << 20,
      clamp: Option[(Double, Double)] = None,
      /** Retain up to this many of the post-burn-in posterior SAMPLE
        * predictions, evenly thinned over the run, as
        * [[Result.samplePreds]] (row_id, sample_idx, pred) — so a
        * SAVED model can answer empirical (order-statistic) credible
        * intervals like the in-run ones, not just moment-based
        * normal-approximation bounds. 0 (default) retains nothing;
        * >= `samples` retains every kept sample. Each retained sample
        * is one test-set-sized table — thin aggressively at scale
        * (storage is keepSamples x |test|, never driver-resident). */
      keepSamples: Int = 0,
      seed: Long = 42L)

  /** Per-entity Normal-Wishart hyperparameter state. */
  private[bdf] final case class NW(mu: DenseVector[Double], lambda: DenseMatrix[Double])

  final case class Result(
      /** Posterior predictions for the test cells of relation 0:
        * (row_id, ids: Array[Long], v, pred, pred_std) — pred is the
        * posterior mean over kept samples (clamped if configured),
        * pred_std the posterior predictive standard deviation. */
      predictions: DataFrame,
      rmseHistory: Seq[Double],
      finalRmse: Double,
      /** Final-sample factor tables per entity, (id: long,
        * f: array<double>) — the persistable model artifact
        * (Macau.saveModel / loadModel / predict). */
      factors: Map[String, DataFrame] = Map.empty,
      /** Which execution path ran: "broadcast" or "distributed"
        * (observable outcome of the auto mode switch). */
      mode: String = "broadcast",
      /** Final-sample side-info link matrices (F x K, row-major) for
        * every side-equipped entity. Together with [[priorMu]] they
        * give COLD-START factors mu + beta^T x for entities never
        * observed in training — the main payoff of the Macau §3.2
        * link term (see Macau.coldStartFactors). */
      links: Map[String, Array[Array[Double]]] = Map.empty,
      /** Final-iteration Normal-Wishart prior mean per entity. */
      priorMu: Map[String, Array[Double]] = Map.empty,
      /** Final link precision λβ per side-equipped entity (the fixed
        * Options.lambdaBeta unless sampleLambdaBeta drew it). */
      linkPrecisions: Map[String, Double] = Map.empty,
      /** Test RMSE of each individual posterior SAMPLE (not the running
        * mean `rmseHistory` tracks) — the stationary trace
        * Diagnostics.rHat needs for multi-chain convergence checks. */
      sampleRmseHistory: Seq[Double] = Nil,
      /** Running per-test-cell posterior SUFFICIENT STATISTICS over the
        * kept samples: (row_id, ids, v, n_samples, pred_sum,
        * pred_sq_sum) — exactly the state `predictions`' (pred,
        * pred_std) derive from. Macau.saveModel persists this table so
        * a LOADED model answers uncertainty (posterior-std /
        * credible-shaped) queries, not just point predictions, and two
        * saved runs can be MERGED by adding moments (mean+M2 style
        * combine) — see Macau.predictionsFromMoments. */
      predMoments: Option[DataFrame] = None,
      /** Thinned posterior sample trace (row_id, sample_idx, pred) —
        * present iff Options.keepSamples > 0. sample_idx is the
        * 0-based post-burn-in sweep index, so two chains' retained
        * samples are distinguishable after a union. Persisted by
        * Macau.saveModel under `__samples/`; order-stat credible
        * bounds via Macau.empiricalCredible. */
      samplePreds: Option[DataFrame] = None)

  /** Evenly-spaced thinning: retain sample `s` (0-based of `total`)
    * iff the integer selector floor((s+1)*keep/total) advances at s —
    * exactly `min(keep, total)` samples, evenly spread, no RNG. */
  private[bdf] def retainSample(s: Int, total: Int, keep: Int): Boolean =
    keep > 0 &&
      ((s + 1).toLong * keep) / total > (s.toLong * keep) / total

  /** Driver-resident doubles the broadcast mode would allocate: the
    * N x K factor matrix per entity plus the densified N x F side
    * matrix where side info is attached (sparse side features count at
    * their dense width — that is what the broadcast path materializes). */
  private[bdf] def broadcastFootprint(rd: RelationData, k: Int): Long =
    rd.entities.valuesIterator.map { ent =>
      val f: Long = ent.side.map { df =>
        if (df.columns.contains("indices")) {
          val mx = df.select(max(expr("array_max(indices)"))).head()
          if (mx.isNullAt(0)) 0L else mx.getInt(0) + 1L
        } else df.select(expr("size(features)")).head().getInt(0).toLong
      }.getOrElse(0L)
      ent.numItems.toLong * (k + f)
    }.sum

  def train(spark: SparkSession, rd: RelationData, test: DataFrame,
            opts: Options): Result = {
    require(!(opts.binaryProbit && opts.sampleAlpha),
      "binaryProbit fixes alpha = 1; disable sampleAlpha")
    // auto mode switch: an explicit flag wins; otherwise route by the
    // broadcast mode's would-be driver footprint
    val useDistributed = opts.distributedFactors.getOrElse(
      broadcastFootprint(rd, opts.numLatent) > opts.autoDistributedDoubles)
    if (useDistributed) {
      return GibbsDistributed.train(spark, rd, test, opts)
    }
    import spark.implicits._
    val k = opts.numLatent
    val entNames = rd.entities.keys.toSeq.sorted
    val sizes = entNames.map(e => e -> rd.entities(e).numItems).toMap

    // --- persisted COO per relation (the IndexedDF analog: shuffled
    // once per grouping key, reused every sweep) ---
    val coos: Seq[(Relation, DataFrame)] = rd.relations.map { r =>
      r -> r.coo.persist()
    }
    val testCoo = test.persist()

    // --- mutable driver state: factor matrices (rows = items) ---
    val factors: scala.collection.mutable.Map[String, DenseMatrix[Double]] =
      scala.collection.mutable.Map(entNames.map { e =>
        val m = DenseMatrix.tabulate[Double](sizes(e), k)((i, j) =>
          0.3 * CbRng.gaussian(opts.seed, -1L, e.hashCode.toLong, i.toLong, j.toLong))
        e -> m
      }: _*)

    // side-info (Macau §3.2): collected driver-side (scale path: keep
    // distributed and run CG with DataFrame matvecs — see
    // GibbsDistributed, which also keeps sparse rows sparse). A sparse
    // (indices, values) side table is densified here: this path is the
    // small-data one by construction.
    val sideData: Map[String, Array[Array[Double]]] = rd.entities.collect {
      case (name, Entity(_, n, Some(sideDf))) =>
        val arr = Array.ofDim[Array[Double]](n)
        if (sideDf.columns.contains("indices")) {
          val mx = sideDf.select(max(expr("array_max(indices)"))).head()
          require(!mx.isNullAt(0),
            s"sparse side table for entity $name has no nonzero features")
          val fDim = mx.getInt(0) + 1
          sideDf.select(col("id").cast("long"), col("indices"), col("values"))
            .collect().foreach { r =>
              val dense = new Array[Double](fDim)
              val ix = r.getSeq[Int](1); val v = r.getSeq[Double](2)
              var q = 0
              while (q < ix.length) { dense(ix(q)) = v(q); q += 1 }
              arr(r.getLong(0).toInt) = dense
            }
        } else {
          sideDf.select(col("id").cast("long"), col("features")).collect().foreach { r =>
            arr(r.getLong(0).toInt) = r.getSeq[Double](1).toArray
          }
        }
        // ids absent from the side table (legal: a sparse COO source
        // omits all-zero rows) get an all-zero feature row — never null
        val fDim0 = arr.collectFirst { case a if a != null => a.length }
        require(fDim0.isDefined, s"side table for entity $name is empty")
        var i0 = 0
        while (i0 < n) {
          if (arr(i0) == null) arr(i0) = new Array[Double](fDim0.get)
          i0 += 1
        }
        name -> arr
    }
    val betas = scala.collection.mutable.Map[String, DenseMatrix[Double]]()
    val linkMeans = scala.collection.mutable.Map[String, DenseMatrix[Double]]()
    val lambdaBetas = scala.collection.mutable.Map[String, Double]()

    var alpha = opts.alpha
    var lastHyper: Map[String, NW] = Map.empty
    val rmseHist = scala.collection.mutable.ArrayBuffer[Double]()
    val sampleRmseHist = scala.collection.mutable.ArrayBuffer[Double]()

    // running posterior mean over post-burnin samples, keyed by test row
    var predSum: Option[DataFrame] = None
    var nSamples = 0
    // thinned per-sample retention (Options.keepSamples): each entry is
    // its own checkpointed 3-col table, unioned lazily at the end —
    // O(retained rows) materialized total, never O(n^2) re-unions
    val keptSamples = scala.collection.mutable.ArrayBuffer[DataFrame]()

    val sc = spark.sparkContext

    for (iter <- 0 until (opts.burnin + opts.samples)) {
      // -- (a) Normal-Wishart hyperprior draw per entity (driver, K x K) --
      val hyper: Map[String, NW] = entNames.map { e =>
        val u = factors(e)
        val shift = linkMeans.get(e)                  // beta^T x_i per item
        val centered = shift.map(u - _).getOrElse(u)
        e -> sampleNW(centered, opts.seed, iter, e.hashCode)
      }.toMap
      lastHyper = hyper

      // -- (b) side-info link draw (Macau §3.2 ridge + noise injection) --
      sideData.foreach { case (e, xs) =>
        val lb = lambdaBetas.getOrElse(e, opts.lambdaBeta)
        val beta = sampleBeta(spark, factors(e), xs, hyper(e), opts, lb, iter, e.hashCode)
        betas(e) = beta
        if (opts.sampleLambdaBeta)
          lambdaBetas(e) = drawLambdaBeta(beta, hyper(e).lambda, opts.seed, iter, e.hashCode)
        val n = xs.length
        val lm = DenseMatrix.zeros[Double](n, k)
        var i = 0
        while (i < n) {
          val xi = DenseVector(xs(i))
          lm(i, ::) := (beta.t * xi).t
          i += 1
        }
        linkMeans(e) = lm
      }

      // -- (c) per-entity conditional draws, one mode at a time,
      //        distributed over the observations --
      for (e <- entNames) {
        // contributions (z, v) from every relation/mode this entity joins
        val sweepBcs = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.broadcast.Broadcast[_]]
        val contribs: Seq[DataFrame] = coos.flatMap { case (r, coo) =>
          r.modeEntities.zipWithIndex.collect {
            case (ent, m) if ent == e =>
              val otherFactors = r.modeEntities.zipWithIndex
                .filter(_._2 != m)
                .map { case (oe, om) => (om, sc.broadcast(toArrays(factors(oe)))) }
              sweepBcs ++= otherFactors.map(_._2)
              val kk = k
              // each relation may carry its own noise precision
              // (Macau §2.3); default = the global (possibly sampled)
              // alpha — except probit, whose latent likelihood is unit
              // variance
              val probit = opts.binaryProbit
              val aRel = if (probit) 1.0 else r.alpha.getOrElse(alpha)
              val bSelf = if (probit) sc.broadcast(toArrays(factors(e))) else null
              if (bSelf != null) sweepBcs += bSelf
              val seedL = opts.seed; val itL = iter.toLong
              val relTag = r.name.hashCode.toLong ^ (m.toLong << 17) ^ 0x9b17L
              coo.select(col("ids"), col("v")).as[(Seq[Long], Double)]
                .map { case (ids, v) =>
                  // z = elementwise product of the other modes' latents
                  // (Macau §2.4 tensor rule; arity-2 reduces to BPMF)
                  val z = Array.fill(kk)(1.0)
                  otherFactors.foreach { case (om, bf) =>
                    val f = bf.value(ids(om).toInt)
                    var j = 0
                    while (j < kk) { z(j) *= f(j); j += 1 }
                  }
                  val vv = if (!probit) v else {
                    // Albert-Chib: replace the 0/1 label by a truncated-
                    // normal latent around the CURRENT prediction
                    val self = bSelf.value(ids(m).toInt)
                    var pred = 0.0
                    var j = 0
                    while (j < kk) { pred += z(j) * self(j); j += 1 }
                    val ck = ids.foldLeft(0L)((acc, i) => acc * 1000003L + i)
                    val u = CbRng.uniform(seedL, itL, relTag, ck)
                    Probit.truncatedNormal(pred, v > 0.5, u)
                  }
                  (ids(m), z, vv, aRel)
                }.toDF("id", "z", "v", "aw")
          }
        }
        val all = contribs.reduce(_ unionByName _)

        val nw = hyper(e)
        val bMu = sc.broadcast(nw.mu.toArray)
        val bLam = sc.broadcast(nw.lambda.toArray) // column-major k*k
        val bLink = sc.broadcast(linkMeans.get(e).map(toArrays).orNull)
        val kk = k; val seed = opts.seed; val it = iter.toLong
        val eHash = e.hashCode.toLong

        val drawn = all.as[(Long, Array[Double], Double, Double)]
          .groupByKey(_._1)
          .mapGroups { (id, rows) =>
            val prec = new DenseMatrix[Double](kk, kk, bLam.value.clone())
            val mu0 =
              if (bLink.value != null) DenseVector(bMu.value) + DenseVector(bLink.value(id.toInt))
              else DenseVector(bMu.value)
            val rhs = prec * mu0
            rows.foreach { case (_, z, v, aw) =>
              var r0 = 0
              while (r0 < kk) {
                val zr = z(r0) * aw
                var c0 = 0
                while (c0 < kk) { prec(r0, c0) += zr * z(c0); c0 += 1 }
                rhs(r0) += zr * v
                r0 += 1
              }
            }
            val l = cholesky(prec)
            // mean = prec^-1 rhs via two triangular solves
            val y = lowerSolve(l, rhs)
            val mean = upperSolveT(l, y)
            // sample: mean + L^-T eps  (counter-based, partition-invariant)
            val eps = DenseVector.tabulate(kk)(j =>
              CbRng.gaussian(seed, it, eHash, id, j.toLong))
            val u = mean + upperSolveT(l, eps)
            (id, u.toArray)
          }.collect()
        // the per-sweep broadcasts (other-mode factors, probit self
        // factors, NW state) are dead after the collect — destroy them
        // instead of waiting on GC-driven cleanup (N x K each, every
        // sweep, every mode)
        bMu.destroy(); bLam.destroy(); bLink.destroy()
        sweepBcs.foreach(_.destroy())

        // fold drawn rows into the (driver) factor matrix; entities with
        // no observations keep a pure prior draw
        val f = factors(e)
        val seen = new Array[Boolean](sizes(e))
        drawn.foreach { case (id, u) =>
          seen(id.toInt) = true
          var j = 0
          while (j < k) { f(id.toInt, j) = u(j); j += 1 }
        }
        var i = 0
        while (i < sizes(e)) {
          if (!seen(i)) {
            val lChol = cholesky(nw.lambda)
            val eps = DenseVector.tabulate(k)(j =>
              CbRng.gaussian(opts.seed, iter.toLong, e.hashCode.toLong + 7L, i.toLong, j.toLong))
            val mu0 =
              if (linkMeans.contains(e)) nw.mu + linkMeans(e)(i, ::).t else nw.mu
            val u = mu0 + upperSolveT(lChol, eps)
            var j = 0
            while (j < k) { f(i, j) = u(j); j += 1 }
          }
          i += 1
        }
      }

      // -- (d) noise precision draw from residuals (Macau §2.1) --
      if (opts.sampleAlpha) {
        val (sse, n) = sumSquaredError(spark, coos.head._2, rd.relations.head, factors, k)
        val rng = new RngStream(opts.seed, 1000L + iter)
        alpha = rng.nextGamma(1.0 + n / 2.0) / (1.0 + sse / 2.0)
      }

      // -- (e) post burn-in: fold prediction into the running mean
      //       (and sum of squares, for the posterior predictive std) --
      if (iter >= opts.burnin) {
        // carry v and materialize ONCE: both consumers (the predSum
        // fold and the per-sample RMSE) read the same cached blocks
        // instead of re-running the prediction map per action
        val p = predictOnce(spark, testCoo, rd.relations.head, factors, k)
          .join(testCoo.select(col("row_id"), col("v")), "row_id")
          .localCheckpoint(true)
        predSum = predSum match {
          case None => Some(p
            .select(col("row_id"), col("pred").as("pred_sum"),
                    (col("pred") * col("pred")).as("pred_sq_sum"))
            .persist())
          case Some(acc) =>
            // localCheckpoint truncates the lineage (SURVEY.md §7.4.5) —
            // plain persist would keep a plan tree growing one join per
            // posterior sample
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
        if (retainSample(sIdx, opts.samples, opts.keepSamples))
          keptSamples += p
            .select(col("row_id"), lit(sIdx).as("sample_idx"), col("pred"))
            .localCheckpoint(true)
        val cur = currentPrediction(spark, testCoo, rd.relations.head, predSum.get, nSamples, opts)
        val rmse = math.sqrt(cur.select(avg(pow(col("pred") - col("v"), 2))).head().getDouble(0))
        rmseHist += rmse
        // the SAMPLE's own RMSE (stationary trace for Diagnostics.rHat)
        sampleRmseHist += math.sqrt(
          p.select(avg(pow(col("pred") - col("v"), 2))).head().getDouble(0))
        // p's checkpoint blocks are ContextCleaner-reclaimed once p
        // drops out of scope — no manual unpersist (the case-None
        // predSum persist() is lazy and still reads them)
      }
    }

    val preds = currentPrediction(spark, testCoo, rd.relations.head, predSum.get, nSamples, opts)
    val factorDfs = entNames.map { e =>
      val m = factors(e)
      val rows = (0 until sizes(e)).map(i =>
        (i.toLong, Array.tabulate(k)(j => m(i, j))))
      e -> rows.toDF("id", "f")
    }.toMap
    Result(preds, rmseHist.toSeq, rmseHist.last, factorDfs, mode = "broadcast",
      links = betas.map { case (e, b) => e -> toArrays(b) }.toMap,
      priorMu = lastHyper.map { case (e, nw) => e -> nw.mu.toArray },
      predMoments = Some(momentsTable(testCoo, predSum.get, nSamples)),
      linkPrecisions = betas.keys.map(e =>
        e -> lambdaBetas.getOrElse(e, opts.lambdaBeta)).toMap,
      sampleRmseHistory = sampleRmseHist.toSeq,
      samplePreds =
        if (keptSamples.isEmpty) None
        else Some(keptSamples.reduce(_ unionByName _)))
  }

  // ---------- helpers ----------

  private def toArrays(m: DenseMatrix[Double]): Array[Array[Double]] = {
    val out = Array.ofDim[Array[Double]](m.rows)
    var i = 0
    while (i < m.rows) {
      val row = new Array[Double](m.cols)
      var j = 0
      while (j < m.cols) { row(j) = m(i, j); j += 1 }
      out(i) = row
      i += 1
    }
    out
  }

  /** Solve L y = b for lower-triangular L. */
  private[bdf] def lowerSolve(l: DenseMatrix[Double], b: DenseVector[Double]): DenseVector[Double] = {
    val n = b.length
    val y = DenseVector.zeros[Double](n)
    var i = 0
    while (i < n) {
      var s = b(i)
      var j = 0
      while (j < i) { s -= l(i, j) * y(j); j += 1 }
      y(i) = s / l(i, i)
      i += 1
    }
    y
  }

  /** Solve L^T x = y for lower-triangular L. */
  private[bdf] def upperSolveT(l: DenseMatrix[Double], y: DenseVector[Double]): DenseVector[Double] = {
    val n = y.length
    val x = DenseVector.zeros[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = y(i)
      var j = i + 1
      while (j < n) { s -= l(j, i) * x(j); j += 1 }
      x(i) = s / l(i, i)
      i -= 1
    }
    x
  }

  /** Conjugate Normal-Wishart posterior draw from factor rows
    * (BPMF §3.1, Eq. 14): driver-side, K x K. */
  private def sampleNW(u: DenseMatrix[Double], seed: Long, iter: Int, tag: Int): NW = {
    val n = u.rows; val k = u.cols
    val mean = DenseVector.tabulate(k)(j => breeze.linalg.sum(u(::, j)) / n)
    val s = DenseMatrix.zeros[Double](k, k)
    var i = 0
    while (i < n) {
      val d = u(i, ::).t - mean
      s += d * d.t
      i += 1
    }
    sampleNWFromStats(n, mean, s, seed, iter, tag)
  }

  /** Same draw from sufficient statistics (n, mean, scatter) — the
    * distributed path aggregates these with one treeAggregate pass. */
  private[bdf] def sampleNWFromStats(n: Long, mean: DenseVector[Double],
                                     s: DenseMatrix[Double], seed: Long,
                                     iter: Int, tag: Int): NW = {
    val k = mean.length
    val rng = new RngStream(seed, (iter.toLong << 20) ^ tag)
    val b0 = 2.0; val nu0 = k.toDouble
    val bPost = b0 + n
    val nuPost = nu0 + n
    val muPost = mean * (n.toDouble / bPost)
    val w0inv = DenseMatrix.eye[Double](k)
    val wPostInv = w0inv + s + (d2(mean) * (b0 * n / bPost))
    val wPost = breeze.linalg.inv(wPostInv)
    // Wishart(wPost, nuPost) via Bartlett
    val lw = cholesky((wPost + wPost.t) * 0.5)
    val aMat = DenseMatrix.zeros[Double](k, k)
    var r = 0
    while (r < k) {
      aMat(r, r) = math.sqrt(rng.nextChiSq(nuPost - r))
      var c = 0
      while (c < r) { aMat(r, c) = rng.nextGaussian(); c += 1 }
      r += 1
    }
    val lwa = lw * aMat
    val lambda = lwa * lwa.t
    // mu ~ N(muPost, (bPost * Lambda)^-1)
    val lLam = cholesky((lambda + lambda.t) * 0.5)
    val eps = DenseVector.tabulate(k)(_ => rng.nextGaussian())
    val mu = muPost + upperSolveT(lLam, eps) / math.sqrt(bPost)
    NW(mu, lambda)
  }

  private def d2(v: DenseVector[Double]): DenseMatrix[Double] = v * v.t

  /** Probit-link helpers (Albert & Chib 1993 data augmentation): the
    * binary observation's conditional latent is a unit-variance normal
    * around the current prediction, truncated to the observed sign —
    * sampled by inverse CDF so one counter-RNG uniform per cell keeps
    * the sweep deterministic. */
  private[bdf] object Probit {
    def phi(x: Double): Double =
      0.5 * (1.0 + breeze.numerics.erf(x / math.sqrt(2.0)))

    /** Inverse standard-normal CDF (Acklam's rational approximation,
      * |rel err| < 1.15e-9 — ample for MCMC). */
    def probitInv(p0: Double): Double = {
      val p = math.min(1.0 - 1e-15, math.max(1e-15, p0))
      val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
        -2.759285104469687e+02, 1.383577518672690e+02,
        -3.066479806614716e+01, 2.506628277459239e+00)
      val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
        -1.556989798598866e+02, 6.680131188771972e+01,
        -1.328068155288572e+01)
      val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
        -2.400758277161838e+00, -2.549732539343734e+00,
        4.374664141464968e+00, 2.938163982698783e+00)
      val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
        2.445134137142996e+00, 3.754408661907416e+00)
      val pl = 0.02425
      if (p < pl) {
        val q = math.sqrt(-2.0 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
      } else if (p <= 1.0 - pl) {
        val q = p - 0.5; val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
      } else {
        val q = math.sqrt(-2.0 * math.log(1.0 - p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
      }
    }

    /** z ~ N(m, 1) truncated to z >= 0 (positive) or z < 0, from one
      * uniform u. For |m| beyond ~8 the clamped inverse-CDF would land
      * on the wrong side of zero, so the result is pinned to the
      * truncation boundary — where the extreme-tail distribution
      * concentrates anyway (its mass sits within ~1/|m| of 0). */
    def truncatedNormal(m: Double, positive: Boolean, u: Double): Double = {
      val c = phi(-m) // P(z - m < -m) = P(z < 0)
      val p = if (positive) c + u * (1.0 - c) else u * c
      val z = m + probitInv(p)
      if (positive) math.max(z, 0.0) else math.min(z, -1e-12)
    }
  }

  /** Side-info link draw (Macau §3.2): exact conditional for beta,
    * whose posterior is matrix-normal with row precision
    * (X^T X + lambda I) and column covariance Lambda^-1 (the entity's
    * NW latent precision). Sampled via the noise-injection identity
    *
    *   beta = (X^T X + lambda I)^-1 (X^T (U~ + E1) + sqrt(lambda) E2)
    *
    * where U~ = U - mu and each row of E1 (n x K) and E2 (F x K) is an
    * independent N(0, Lambda^-1) draw, realized as L_Lambda^-T eps.
    * Small X solves on the driver with Cholesky; opts.useCgSideSolver
    * switches to the distributed CG (Cg.solveNormal) that never
    * materializes X^T X. */
  /** λβ | beta ~ Gamma(1 + F·K/2, 1 + tr(beta Λ beta^T)/2) — the
    * conjugate draw for the link precision under the matrix-normal
    * prior rows ~ N(0, λβ^-1 Λ^-1). Driver-side, O(F·K²). */
  private[bdf] def drawLambdaBeta(beta: DenseMatrix[Double],
                                  lambda: DenseMatrix[Double],
                                  seed: Long, iter: Int, tag: Int): Double = {
    val bl = beta * lambda
    var tr = 0.0
    var f = 0
    while (f < beta.rows) {
      var j = 0
      while (j < beta.cols) { tr += bl(f, j) * beta(f, j); j += 1 }
      f += 1
    }
    val rng = new RngStream(seed, (iter.toLong * 131L) ^ tag ^ 0x1b9aL)
    rng.nextGamma(1.0 + beta.rows * beta.cols / 2.0) / (1.0 + tr / 2.0)
  }

  private def sampleBeta(spark: SparkSession, u: DenseMatrix[Double],
                         xs: Array[Array[Double]], nw: NW, opts: Options,
                         lambdaBeta: Double,
                         iter: Int, tag: Int): DenseMatrix[Double] = {
    val n = u.rows; val k = u.cols; val fDim = xs(0).length
    val rng = new RngStream(opts.seed, (iter.toLong << 24) ^ tag ^ 0x5ea1L)
    val lLam = cholesky((nw.lambda + nw.lambda.t) * 0.5)
    def lamNoiseRow(): DenseVector[Double] = {
      val eps = DenseVector.tabulate(k)(_ => rng.nextGaussian())
      upperSolveT(lLam, eps) // N(0, Lambda^-1)
    }
    // centered target + injected latent noise, one N(0, Lambda^-1) row each
    val target = DenseMatrix.zeros[Double](n, k)
    var i = 0
    while (i < n) {
      val e1 = lamNoiseRow()
      var c = 0
      while (c < k) { target(i, c) = u(i, c) - nw.mu(c) + e1(c); c += 1 }
      i += 1
    }
    // prior-side noise: sqrt(lambda) E2, added to the RHS of the solve
    val sqLb = math.sqrt(lambdaBeta)
    val e2 = DenseMatrix.zeros[Double](fDim, k)
    i = 0
    while (i < fDim) {
      e2(i, ::) := (lamNoiseRow() * sqLb).t
      i += 1
    }
    if (opts.useCgSideSolver) {
      import spark.implicits._
      val xt = (0 until n).map { r =>
        (xs(r).toSeq, (0 until k).map(c => target(r, c)).toSeq)
      }.toDF("features", "target")
      Cg.solveNormal(spark, xt, fDim, k, lambdaBeta, rhsExtra = Some(e2))
    } else {
      val x = DenseMatrix.tabulate[Double](n, fDim)((r, j) => xs(r)(j))
      val xtx = x.t * x
      var j = 0
      while (j < fDim) { xtx(j, j) += lambdaBeta; j += 1 }
      val lCh = cholesky(xtx)
      val xtU = (x.t * target) += e2
      val beta = DenseMatrix.zeros[Double](fDim, k)
      var c = 0
      while (c < k) {
        val y = lowerSolve(lCh, xtU(::, c))
        beta(::, c) := upperSolveT(lCh, y)
        c += 1
      }
      beta
    }
  }

  private def predictOnce(spark: SparkSession, testCoo: DataFrame, rel: Relation,
                          factors: scala.collection.mutable.Map[String, DenseMatrix[Double]],
                          k: Int): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    val bcs = rel.modeEntities.map(e => sc.broadcast(toArrays(factors(e))))
    val kk = k
    testCoo.select(col("row_id"), col("ids")).as[(Long, Seq[Long])]
      .map { case (rowId, ids) =>
        var dot = 0.0
        var j = 0
        while (j < kk) {
          var p = 1.0
          var m = 0
          while (m < ids.length) { p *= bcs(m).value(ids(m).toInt)(j); m += 1 }
          dot += p
          j += 1
        }
        (rowId, dot)
      }.toDF("row_id", "pred")
  }

  /** The persistable uncertainty state: test cells joined to their
    * running prediction moments, with the sample count made a column
    * so the table is self-contained across a save/load hop. Shared by
    * the broadcast and distributed paths. */
  private[bdf] def momentsTable(testCoo: DataFrame, predSum: DataFrame,
                                nSamples: Int): DataFrame =
    testCoo.select(col("row_id"), col("ids"), col("v"))
      .join(predSum, "row_id")
      .select(col("row_id"), col("ids"), col("v"),
              lit(nSamples).as("n_samples"),
              col("pred_sum"), col("pred_sq_sum"))

  private def currentPrediction(spark: SparkSession, testCoo: DataFrame, rel: Relation,
                                predSum: DataFrame, nSamples: Int,
                                opts: Options): DataFrame = {
    // posterior predictive std over the kept samples (population form;
    // clamping applies to the mean only, like the reference)
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

  private def sumSquaredError(spark: SparkSession, coo: DataFrame, rel: Relation,
                              factors: scala.collection.mutable.Map[String, DenseMatrix[Double]],
                              k: Int): (Double, Long) = {
    import spark.implicits._
    val sc = spark.sparkContext
    val bcs = rel.modeEntities.map(e => sc.broadcast(toArrays(factors(e))))
    val kk = k
    val (sse, n) = coo.select(col("ids"), col("v")).as[(Seq[Long], Double)]
      .map { case (ids, v) =>
        var dot = 0.0
        var j = 0
        while (j < kk) {
          var p = 1.0
          var m = 0
          while (m < ids.length) { p *= bcs(m).value(ids(m).toInt)(j); m += 1 }
          dot += p
          j += 1
        }
        val e = v - dot
        (e * e, 1L)
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    (sse, n)
  }
}
