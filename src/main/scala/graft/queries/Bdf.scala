package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.Det._
import graft.sql.{DetSql => D}

/** BDF-semantic operators (SURVEY.md §2.B "BDF-semantic") — the
  * reference's Gibbs-factorization math (BPMF ICML'08 §3-4, Macau
  * arXiv:1509.04610 §2-3) re-expressed as relational queries over the
  * testdata's COO-shaped fact tables:
  *  A3 inverted index -> q_bdf_relation_index; A4 split -> q_bdf_split;
  *  A7 SpMV kernel -> q_bdf_spmv; A5/A7 Gram -> q_bdf_gram;
  *  A11 prediction -> q_bdf_dot_predict / q_bdf_posterior_mean /
  *  q_bdf_clamp; A12 RMSE -> q_bdf_rmse; A13 AUC -> q_bdf_auc;
  *  A9 tensor -> q_bdf_tensor_agg; A10 multi-relation -> q_bdf_multirel.
  * The full iterative Gibbs engine lives in graft.bdf. */
object Bdf {

  /** A3: per-entity observation count + mean (the inverted-index build
    * statistic), lineitem-as-COO keyed by l_partkey. */
  def qBdfRelationIndex(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n"), davg(col("l_quantity")).as("mean_qty"))
      .orderBy("l_partkey")

  /** A4: deterministic 80/20 train/test cell split via an integer
    * multiplicative hash (assignToTest! analog, reproducible across
    * engines — never engine hash()). */
  def qBdfSplit(s: SparkSession, dir: String): DataFrame = {
    val key = col("l_orderkey") * 8 + col("l_linenumber")
    Tables.lineitem(s, dir)
      .select((lcgBucket(key, 10) < 8).cast("int").as("is_train"),
              dec(col("l_quantity")).as("q"))
      .groupBy("is_train")
      .agg(count(lit(1)).as("n"), sum(col("q")).cast("double").as("sum_qty"))
      .orderBy("is_train")
  }

  /** A7 kernel: sparse matrix-vector product — lineitem COO x
    * part.retailprice vector -> per-order accumulation. */
  def qBdfSpmv(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy("l_orderkey")
      .agg(sum((dec(col("l_quantity")) * dec(col("p_retailprice"))).cast(DecT))
             .cast("double").as("y"),
           count(lit(1)).as("nnz"))
      .orderBy("l_orderkey")
  }

  /** A5/A7 kernel: Gram matrix X^T X over the first 8 embedding dims
    * (36 upper-triangular entries). */
  def qBdfGram(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .filter(col("pos") < 8)
    val a = e.select(col("vec_id"), col("pos").as("i"), col("x").as("xi"))
    val b = e.select(col("vec_id").as("vid2"), col("pos").as("j"), col("x").as("xj"))
    a.join(b, col("vec_id") === col("vid2") && col("i") <= col("j"))
      .groupBy((col("i") + 1).cast("long").as("gi"),
               (col("j") + 1).cast("long").as("gj"))
      .agg(sum(decf(col("xi")) * decf(col("xj"))).cast("double").as("g"))
      .orderBy("gi", "gj")
  }

  /** A11: prediction dot products u_i . v_j for the 20x20 leading
    * vec_id pairs. */
  def qBdfDotPredict(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .filter(col("vec_id") < 20)
    val a = e.select(col("vec_id").as("ia"), col("pos"), col("x").as("xa"))
    val b = e.select(col("vec_id").as("ib"), col("pos").as("pos2"), col("x").as("xb"))
    a.join(b, col("pos") === col("pos2"))
      .groupBy("ia", "ib")
      .agg(sum(decf(col("xa")) * decf(col("xb"))).cast("double").as("dot"))
      .orderBy("ia", "ib")
  }

  /** A11: posterior mean over repeated cell observations. */
  def qBdfPosteriorMean(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_partkey", "l_suppkey")
      .agg(count(lit(1)).as("n"), davg(col("l_quantity")).as("mean_qty"))
      .orderBy("l_partkey", "l_suppkey")

  /** A11 companion: posterior predictive UNCERTAINTY per cell — the
    * std-dev the reference surfaces alongside the mean prediction
    * (BPMF's predictive distribution has a spread, not just a point).
    * Exact decimal sums of x and x² make the variance hash-stable; the
    * remaining float ops (divide, subtract, sqrt) are correctly-rounded
    * IEEE on identical inputs in both engines. Cells with n ≥ 2 only
    * (a singleton's sample std is undefined). Same one-shuffle
    * partial-agg shape as the mean. */
  def qBdfPosteriorStd(s: SparkSession, dir: String): DataFrame = {
    val n = count(lit(1))
    val sq = sum(dec(col("l_quantity"))).cast("double")
    val sq2 = sum((dec(col("l_quantity")) * dec(col("l_quantity")))
      .cast(DecT)).cast("double")
    Tables.lineitem(s, dir)
      .groupBy("l_partkey", "l_suppkey")
      .agg(n.as("n"), (sq / n).as("mean_qty"),
           sqrt(greatest(sq2 / n - (sq / n) * (sq / n), lit(0.0)))
             .as("std_qty"))
      .filter(col("n") >= 2)
      .orderBy("l_partkey", "l_suppkey")
  }

  /** A11: clamp predictions to a valid range (macau clamp argument). */
  def qBdfClamp(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      least(greatest(col("o_totalprice"), lit(10000.0)), lit(300000.0))
        .as("clamped"),
      (col("o_totalprice") < 10000.0 || col("o_totalprice") > 300000.0)
        .cast("int").as("was_clamped"),
    ).orderBy("o_orderkey")

  /** A12: RMSE of l_quantity against a per-part mean baseline. */
  def qBdfRmse(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val m = l.groupBy(col("l_partkey").as("mk"))
      .agg(davg(col("l_quantity")).as("mean_qty"))
    val err = col("l_quantity") - col("mean_qty")
    // the per-part means table is small relative to the fact — broadcast
    // so the 600k-row (100 TB-scale: billions) side never shuffles
    l.join(broadcast(m), col("l_partkey") === col("mk"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
           sqrt(sum((err * err).cast(DecT)).cast("double") / count(lit(1)))
             .as("rmse"))
      .orderBy("l_returnflag")
  }

  /** A13: Mann-Whitney ROC-AUC of `value` scoring event_type='purchase'
    * with average-rank tie handling — computed as an exact bucketed
    * rank-sum (Prefix.withPrefix), NO global window: the sum of average
    * ranks over positives is
    *   Σ_v np_v·(n_before(v) + 1 + (n_v-1)/2) = Σ_v np_v·(2·n_before(v)+n_v+1) / 2
    * over per-distinct-value counts, all exact long arithmetic until the
    * two final double divisions (which mirror the oracle's), so the hash
    * still matches the DuckDB rank-window formulation. */
  def qBdfAuc(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("value"), (col("event_type") === "purchase").cast("int").as("pos"))
    val perValue = e.groupBy("value")
      .agg(sum(col("pos")).as("np"), count(lit(1)).as("n"))
    val pre = Prefix.withPrefix(perValue, "value", Seq("n"))
    val agg = pre.agg(
      sum(col("np")).as("n1"),
      sum(col("n")).as("nt"),
      sum(col("np") * (col("n_before") * 2 + col("n") + 1)).as("sum2"))
    agg.select(
      col("n1").as("n_pos"),
      (col("nt") - col("n1")).as("n_neg"),
      ((col("sum2").cast("double") / 2.0
          - (col("n1") * (col("n1") + 1)).cast("double") / 2.0)
        / (col("n1").cast("double") * (col("nt") - col("n1"))))
        .as("auc"))
  }

  /** A13 extension: the full ROC curve — TPR/FPR at every distinct
    * score threshold. Cumulative-from-the-top counts come from the same
    * bucketed prefix sums (Σ_{u≥v} x_u = total_x − x_before(v)) instead
    * of a global desc window; exact integers until the final divisions. */
  def qBdfRoc(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      col("value"), (col("event_type") === "purchase").cast("int").as("pos"))
    val perValue = e.groupBy("value")
      .agg(sum(col("pos")).as("np"), count(lit(1)).as("n"))
    val totals = perValue.agg(sum(col("np")).as("p"),
                              (sum(col("n")) - sum(col("np"))).as("nn"))
    val pre = Prefix.withPrefix(perValue, "value", Seq("np", "n"))
    val ctp = col("p") - col("np_before")
    val call = col("p") + col("nn") - col("n_before")
    pre.crossJoin(broadcast(totals))
      .select(col("value").as("threshold"),
              (ctp.cast("double") / col("p")).as("tpr"),
              ((call - ctp).cast("double") / col("nn")).as("fpr"))
      .orderBy(col("threshold").desc)
  }

  /** A11 (arbitrary cells): score ANY (u, v) cell through the model
    * prediction surface [[graft.bdf.Macau.predict]] — the reference's
    * predict-any-cell API, not just the held-out split. The "saved
    * model" is a deterministic fixture derived from the embeddings
    * table: two 20-entity factor tables with values quantized to
    * dyadic rationals (multiples of 1/1024, HALF_UP — identical in
    * both engines), which makes every product and partial sum EXACT in
    * double, so the zip_with/aggregate fold in predict matches the
    * oracle's SUM regardless of accumulation order. */
  /** Shared 20x20 scored grid over the dyadic-quantized factor fixture
    * (exact in double => cross-engine hash-stable). */
  private def bdfScoredCells(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val quant =
      "transform(slice(embedding, 1, 8), x -> round(CAST(x AS DOUBLE) * 1024D) / 1024D)"
    val fu = e.filter(col("vec_id") < 20)
      .select(col("vec_id").cast("long").as("id"), expr(quant).as("f"))
    val fv = e.filter(col("vec_id") >= 50 && col("vec_id") < 70)
      .select((col("vec_id") - 50).cast("long").as("id"), expr(quant).as("f"))
    val cells = fu.select(col("id").as("u"))
      .crossJoin(fv.select(col("id").as("v")))
    graft.bdf.Macau.predict(s, Map("u" -> fu, "v" -> fv), cells, Seq("u", "v"))
  }

  def qBdfPredictCells(s: SparkSession, dir: String): DataFrame =
    bdfScoredCells(s, dir).orderBy("u", "v")

  /** A11 serving face: TOP-N RECOMMENDATION — the query a deployed
    * factorization model answers all day: the 3 highest-scored items
    * per user over the candidate grid. Written as the standard
    * row_number<=k window; the TopKPerKey rule rewrites it into
    * bounded per-user heaps (map-side 3-per-user, only survivors
    * shuffle — at 100 TB the candidate grid is users x items and a
    * sort would dwarf the scoring itself). */
  def qBdfTopnRecommend(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.plans.TopKPerKey.register(s)
    val w = Window.partitionBy("u").orderBy(col("pred").desc, col("v").asc)
    bdfScoredCells(s, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy("u", "rnk")
  }

  /** A9: 3-mode tensor build — (user, event_type, hour) cells. */
  def qBdfTensorAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"),
               expr("unix_timestamp(ts) DIV 3600").as("hour_bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "event_type", "hour_bucket")

  /** A10: two relations contribute observations to one shared entity
    * id domain (collective factorization coupling). */
  def qBdfMultirel(s: SparkSession, dir: String): DataFrame = {
    val r1 = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("entity_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rel", lit("orders"))
    val r2 = Tables.events(s, dir)
      .groupBy(col("user_id").as("entity_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rel", lit("events"))
    r1.unionByName(r2)
      .groupBy("entity_id")
      .agg(count(lit(1)).as("n_rel"), sum(col("n")).as("n_obs"))
      .orderBy("entity_id")
  }

  /** A11/A12 companion: per-cell posterior CREDIBLE INTERVAL — the
    * exact empirical 10%/90% order statistics of the repeated cell
    * observations ([[qBdfPosteriorStd]]'s cells, n >= 2). Bracket
    * ranks use pure-integer ceil division ((n+9) div 10, (9n+9) div
    * 10): a float ceil(0.1*n) is an off-by-one trap at n = 20 where
    * IEEE 0.1*20 > 2. The window is partitioned by cell — ~20k small
    * groups, the fully-parallel regime (same as q_win_median_grouped),
    * never a global sort. */
  def qBdfCredible(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cell = Window.partitionBy("l_partkey", "l_suppkey")
    val ranked = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
              dec(col("l_quantity")).cast("double").as("q"))
      // value-at-rank is tie-order independent: equal q, equal value
      .withColumn("rn", row_number().over(cell.orderBy("q")))
      .withColumn("n", count(lit(1)).over(cell))
      .filter(col("n") >= 2)
    ranked
      .groupBy("l_partkey", "l_suppkey")
      .agg(first(col("n")).as("n"),
           max(when(col("rn") === expr("(n + 9) div 10"), col("q")))
             .as("lo_qty"),
           max(when(col("rn") === expr("(9 * n + 9) div 10"), col("q")))
             .as("hi_qty"))
      .orderBy("l_partkey", "l_suppkey")
  }

  /** A11/Macau §3.2: COLD-START prediction through the FULL engine —
    * the one capability a relational kernel cannot fake: entities
    * never observed in training are scored from side information
    * alone, via the link matrix the Gibbs sampler learned. The
    * relation is real testdata (embeddings' first 16 coords as a
    * (vec_id, coord) matrix, coords 17-20 as the side features);
    * vec_ids 80-99 are held out entirely and factored by
    * [[graft.bdf.Macau.coldStartFactors]] (u_new = mu + beta^T x),
    * then scored against every coord column by the shared predict
    * rule. Deterministic end-to-end (counter-based RNG, fixed seed,
    * exact-decimal sums inside Gibbs), so the driver's rows-only check
    * is backed by ColdstartQuerySpec's run-twice equality; Oracle=NO
    * because SQL cannot express the Gibbs chain (the same reason the
    * engine exists). GibbsSpec separately proves cold-start QUALITY on
    * a fixture with real side-info signal — the synthetic embeddings
    * here are noise, which exercises the machinery, not the model. */
  def qBdfColdstart(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"))
    val side = e.select(col("vec_id").as("id"),
      expr("transform(slice(embedding, 17, 4), x -> CAST(x AS DOUBLE))")
        .as("features"))
    // TRAIN ONCE per corpus state: the Gibbs chain is deterministic
    // (counter RNG, fixed seed), so the trained model — the colk
    // factor table plus the row entity's link matrix and prior mean,
    // the exact inputs cold-start scoring needs — is a content-keyed
    // artifact like the IVF index and the PQ codebooks. The serve
    // path below is pure reads + one broadcast map: the 100 TB
    // lifecycle (nightly train, always-on scoring) and a bench that
    // measures SERVING, not re-training per call.
    val key = graft.ArtifactStore.contentKey(s"$dir/embeddings.parquet",
      "bdf-coldstart-k4-b3-s3-v1")
    val path = graft.ArtifactStore.cachePath("bdf_coldstart", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      val cells = e.filter(col("vec_id") < 80)
        .select(col("vec_id").as("row"),
                posexplode(expr("slice(embedding, 1, 16)")).as(Seq("cpos", "v")))
        .select(col("row"), col("cpos").cast("long").as("colk"),
                col("v").cast("double").as("v"))
      val rd0 = graft.bdf.RelationData.fromDF(cells, Seq("row", "colk"), "v")
      val rd = rd0.copy(entities = rd0.entities.updated("row",
        rd0.entities("row").copy(side = Some(side.filter(col("id") < 80)))))
      val split = graft.bdf.Macau.assignToTest(rd, 0.1)
      val res = graft.bdf.Macau.macau(s, split.train, split.test,
        graft.bdf.Gibbs.Options(numLatent = 4, burnin = 3, samples = 3,
          alpha = 20.0, seed = 12L))
      res.factors("colk").coalesce(1).write.mode("overwrite")
        .parquet(s"$tmp/colk")
      val beta = res.links("row") // F x K row-major
      val mu = res.priorMu("row")
      import s.implicits._
      Seq((beta.length, mu.length, beta.flatten.toSeq, mu.toSeq))
        .toDF("ff", "kk", "beta_flat", "mu")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/link")
    }
    val colk = s.read.parquet(s"$path/colk")
    val lr = s.read.parquet(s"$path/link").head()
    val ff = lr.getAs[Int]("ff")
    val kk = lr.getAs[Int]("kk")
    val flat = lr.getAs[scala.collection.Seq[Double]]("beta_flat")
    val beta = Array.tabulate(ff, kk)((f, j) => flat(f * kk + j))
    val mu = lr.getAs[scala.collection.Seq[Double]]("mu").toArray
    val coldU = graft.bdf.Macau.coldStartFactorsFromLink(s, beta, mu,
      side.filter(col("id") >= 80))
    val predCells = e.filter(col("vec_id") >= 80)
      .select(col("vec_id").as("row"))
      .crossJoin(s.range(16).select(col("id").as("colk")))
    graft.bdf.Macau.predict(s, Map("colk" -> colk, "row" -> coldU),
        predCells, Seq("row", "colk"))
      .select(col("row"), col("colk"), col("pred"))
      .orderBy("row", "colk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bdf_coldstart" -> (qBdfColdstart _),
    "q_bdf_credible" -> (qBdfCredible _),
    "q_bdf_topn_recommend" -> (qBdfTopnRecommend _),
    "q_bdf_relation_index" -> (qBdfRelationIndex _),
    "q_bdf_split" -> (qBdfSplit _),
    "q_bdf_spmv" -> (qBdfSpmv _),
    "q_bdf_gram" -> (qBdfGram _),
    "q_bdf_dot_predict" -> (qBdfDotPredict _),
    "q_bdf_posterior_mean" -> (qBdfPosteriorMean _),
    "q_bdf_clamp" -> (qBdfClamp _),
    "q_bdf_rmse" -> (qBdfRmse _),
    "q_bdf_auc" -> (qBdfAuc _),
    "q_bdf_roc" -> (qBdfRoc _),
    "q_bdf_predict_cells" -> (qBdfPredictCells _),
    "q_bdf_posterior_std" -> (qBdfPosteriorStd _),
    "q_bdf_tensor_agg" -> (qBdfTensorAgg _),
    "q_bdf_multirel" -> (qBdfMultirel _),
  )

  val oracle: Map[String, String] = Map(
    "q_bdf_credible" ->
      """WITH b AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(CAST(l_quantity AS DECIMAL(18,6)) AS DOUBLE) AS q
        |  FROM lineitem),
        |r AS (
        |  SELECT l_partkey, l_suppkey, q,
        |    ROW_NUMBER() OVER (PARTITION BY l_partkey, l_suppkey
        |                       ORDER BY q) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_partkey, l_suppkey) AS n
        |  FROM b)
        |SELECT l_partkey, l_suppkey, n,
        |  MAX(CASE WHEN rn = (n + 9) // 10 THEN q END) AS lo_qty,
        |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN q END) AS hi_qty
        |FROM r WHERE n >= 2
        |GROUP BY l_partkey, l_suppkey, n
        |ORDER BY l_partkey, l_suppkey""".stripMargin,
    "q_bdf_relation_index" ->
      s"""SELECT l_partkey, COUNT(*) AS n, ${D.davg("l_quantity")} AS mean_qty
         |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,
    "q_bdf_split" ->
      s"""SELECT CAST(${D.lcgBucket("l_orderkey * 8 + l_linenumber", 10)} < 8 AS INTEGER) AS is_train,
         |  COUNT(*) AS n, ${D.dsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY 1 ORDER BY is_train""".stripMargin,
    "q_bdf_spmv" ->
      s"""SELECT l_orderkey,
         |  CAST(SUM(CAST(${D.dec("l_quantity")} * ${D.dec("p_retailprice")} AS DECIMAL(18,6))) AS DOUBLE) AS y,
         |  COUNT(*) AS nnz
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_bdf_gram" ->
      s"""SELECT i AS gi, j AS gj,
         |  CAST(SUM(${D.decf("embedding[i]")} * ${D.decf("embedding[j]")}) AS DOUBLE) AS g
         |FROM embeddings, GENERATE_SERIES(1, 8) AS a(i), GENERATE_SERIES(1, 8) AS b(j)
         |WHERE i <= j
         |GROUP BY i, j ORDER BY gi, gj""".stripMargin,
    "q_bdf_dot_predict" ->
      s"""SELECT a.vec_id AS ia, b.vec_id AS ib,
         |  CAST(SUM(${D.decf("a.embedding[i]")} * ${D.decf("b.embedding[i]")}) AS DOUBLE) AS dot
         |FROM embeddings a, embeddings b, GENERATE_SERIES(1, 64) AS g(i)
         |WHERE a.vec_id < 20 AND b.vec_id < 20
         |GROUP BY a.vec_id, b.vec_id ORDER BY ia, ib""".stripMargin,
    "q_bdf_posterior_mean" ->
      s"""SELECT l_partkey, l_suppkey, COUNT(*) AS n, ${D.davg("l_quantity")} AS mean_qty
         |FROM lineitem GROUP BY l_partkey, l_suppkey
         |ORDER BY l_partkey, l_suppkey""".stripMargin,
    "q_bdf_posterior_std" ->
      s"""SELECT l_partkey, l_suppkey, COUNT(*) AS n,
         |  ${D.davg("l_quantity")} AS mean_qty,
         |  SQRT(GREATEST(
         |    CAST(SUM(CAST(${D.dec("l_quantity")} * ${D.dec("l_quantity")} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         |    - (${D.davg("l_quantity")}) * (${D.davg("l_quantity")}), 0)) AS std_qty
         |FROM lineitem GROUP BY l_partkey, l_suppkey
         |HAVING COUNT(*) >= 2
         |ORDER BY l_partkey, l_suppkey""".stripMargin,
    "q_bdf_clamp" ->
      """SELECT o_orderkey,
        |  LEAST(GREATEST(o_totalprice, 10000.0), 300000.0) AS clamped,
        |  CAST(o_totalprice < 10000.0 OR o_totalprice > 300000.0 AS INTEGER) AS was_clamped
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_bdf_rmse" ->
      s"""WITH m AS (
         |  SELECT l_partkey AS mk, ${D.davg("l_quantity")} AS mean_qty
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT l_returnflag, COUNT(*) AS n,
         |  SQRT(CAST(SUM(CAST((l_quantity - mean_qty) * (l_quantity - mean_qty) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS rmse
         |FROM lineitem JOIN m ON l_partkey = mk
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_bdf_auc" ->
      """WITH r AS (
        |  SELECT CAST(event_type = 'purchase' AS INTEGER) AS pos,
        |    RANK() OVER (ORDER BY value) +
        |      (COUNT(*) OVER (PARTITION BY value) - 1) / 2.0 AS r_avg
        |  FROM events)
        |SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
        |  CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg,
        |  (SUM(CASE WHEN pos = 1 THEN r_avg END)
        |     - CAST(SUM(pos) AS BIGINT) * (CAST(SUM(pos) AS BIGINT) + 1) / 2.0)
        |    / (CAST(SUM(pos) AS DOUBLE) * (COUNT(*) - SUM(pos))) AS auc
        |FROM r""".stripMargin,
    "q_bdf_roc" ->
      """WITH s AS (
        |  SELECT value, CAST(event_type = 'purchase' AS INTEGER) AS pos FROM events),
        |agg AS (
        |  SELECT value, CAST(SUM(pos) AS BIGINT) AS np, COUNT(*) AS n
        |  FROM s GROUP BY value),
        |cum AS (
        |  SELECT value,
        |    SUM(np) OVER (ORDER BY value DESC ROWS UNBOUNDED PRECEDING) AS ctp,
        |    SUM(n) OVER (ORDER BY value DESC ROWS UNBOUNDED PRECEDING) AS call
        |  FROM agg),
        |tot AS (
        |  SELECT CAST(SUM(pos) AS BIGINT) AS p,
        |         CAST(COUNT(*) - SUM(pos) AS BIGINT) AS nn FROM s)
        |SELECT value AS threshold,
        |  CAST(ctp AS DOUBLE) / p AS tpr,
        |  CAST(call - ctp AS DOUBLE) / nn AS fpr
        |FROM cum, tot ORDER BY threshold DESC""".stripMargin,
    "q_bdf_predict_cells" ->
      """WITH fu AS (
        |  SELECT CAST(vec_id AS BIGINT) AS u, i,
        |    ROUND(CAST(embedding[i] AS DOUBLE) * 1024) / 1024 AS x
        |  FROM embeddings, GENERATE_SERIES(1, 8) AS gu(i)
        |  WHERE vec_id < 20),
        |fv AS (
        |  SELECT CAST(vec_id - 50 AS BIGINT) AS v, i,
        |    ROUND(CAST(embedding[i] AS DOUBLE) * 1024) / 1024 AS y
        |  FROM embeddings, GENERATE_SERIES(1, 8) AS gv(i)
        |  WHERE vec_id >= 50 AND vec_id < 70)
        |SELECT u, v, SUM(x * y) AS pred
        |FROM fu JOIN fv ON fu.i = fv.i
        |GROUP BY u, v ORDER BY u, v""".stripMargin,
    "q_bdf_topn_recommend" ->
      """WITH fu AS (
        |  SELECT CAST(vec_id AS BIGINT) AS u, i,
        |    ROUND(CAST(embedding[i] AS DOUBLE) * 1024) / 1024 AS x
        |  FROM embeddings, GENERATE_SERIES(1, 8) AS gu(i)
        |  WHERE vec_id < 20),
        |fv AS (
        |  SELECT CAST(vec_id - 50 AS BIGINT) AS v, i,
        |    ROUND(CAST(embedding[i] AS DOUBLE) * 1024) / 1024 AS y
        |  FROM embeddings, GENERATE_SERIES(1, 8) AS gv(i)
        |  WHERE vec_id >= 50 AND vec_id < 70),
        |scored AS (
        |  SELECT u, v, SUM(x * y) AS pred
        |  FROM fu JOIN fv ON fu.i = fv.i GROUP BY u, v)
        |SELECT u, v, pred, rnk FROM (
        |  SELECT u, v, pred,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY u
        |      ORDER BY pred DESC, v ASC) AS INTEGER) AS rnk
        |  FROM scored)
        |WHERE rnk <= 3 ORDER BY u, rnk""".stripMargin,
    "q_bdf_tensor_agg" ->
      s"""SELECT user_id, event_type,
         |  CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600 AS hour_bucket,
         |  COUNT(*) AS n, ${D.dsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2, 3
         |ORDER BY user_id, event_type, hour_bucket""".stripMargin,
    "q_bdf_multirel" ->
      """SELECT entity_id, COUNT(*) AS n_rel, CAST(SUM(n) AS BIGINT) AS n_obs
        |FROM (SELECT o_custkey AS entity_id, COUNT(*) AS n, 'orders' AS rel
        |      FROM orders GROUP BY o_custkey
        |      UNION ALL
        |      SELECT user_id AS entity_id, COUNT(*) AS n, 'events' AS rel
        |      FROM events GROUP BY user_id)
        |GROUP BY entity_id ORDER BY entity_id""".stripMargin,
  )
}
