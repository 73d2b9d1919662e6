package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Semantic-level corpus curation: embedding-space deduplication
  * (SemDeDup, Abbas et al. 2023, arXiv:2303.09540) and importance
  * resampling data selection (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) — the two curation passes a modern LLM
  * training-data pipeline runs AFTER lexical dedup: drop documents
  * that say the same thing in different words, then up-weight the
  * slice of the corpus that looks like the target domain.
  *
  * Both are re-expressed Spark-first on the repo's exact-arithmetic
  * discipline (graft.sql.Det): cluster assignment and pair cosines
  * ride the quantized-decimal vector kernels (bit-identical to the
  * DuckDB oracles), and DSIR's importance weights are integer ppm
  * rationals — no float log-ratio anywhere, so every row is
  * hash-comparable cross-engine. */
object Semantic {

  /** SemDeDup (arXiv:2303.09540): k-means-cluster the embedding space,
    * then WITHIN each cluster drop every vector that has a
    * lower-id neighbor with cosine >= tau — semantic near-duplicates
    * say the same thing in different words, so lexical MinHash misses
    * them, but they land in the same k-means cell with high cosine.
    *
    * Plan shape (the 100 TB story): the coarse clustering is the IVF
    * quantizer ([[Llm.ivfLearnedCentroids]] — 3 exact-decimal Lloyd
    * steps from seed vectors, zero-shuffle per-row argmin assignment
    * against the broadcast k-row centroid table), so the candidate
    * pair stage is an equi-join ON THE CELL ID — never all-pairs.
    * Per-cell population is corpus/k, and k is the production knob
    * (SemDeDup's paper setting keeps ~1k docs per cluster at any
    * corpus size, exactly the IVF nlist scaling rule recorded in
    * [[Ivf.train]]); the fixtures keep k=8 because that is what the
    * shared unrolled-Lloyd oracle CTE states. Pair cosines run on
    * ONE quantization pass per vector (graft_quant6) + one pure-long
    * dot per pair (graft_dotq12) — the fused kernel proven on
    * [[Llm.qDedupEmbedCosine]]; embeddings never ride the pair join
    * (ids + 12-long signatures only).
    *
    * Output: the KEPT vectors (vec_id, cid), i.e. each semantic
    * group's lowest-id representative plus all singletons. tau=0.35
    * sits at the fixture corpus's near-dup knee (same calibration as
    * the embed-cosine face's 0.3; the synthetic embeddings are
    * near-orthogonal, so paper-scale taus ~0.95 would be vacuous). */
  def qDedupSemantic(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.VectorOps.register(s)
    graft.expressions.VecSum6.register(s)
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val cent = Llm.ivfLearnedCentroids(e)
    // one quantization + self-norm pass per vector, materialized once:
    // the table feeds both pair sides and the final keep join (3 uses)
    val base = Llm.ivfAssign(e, cent)
      .select(col("vec_id"), col("cid"),
              expr("graft_quant6(embedding)").as("q"),
              expr("graft_dot6(embedding, embedding)").as("nrm"))
      .localCheckpoint(true)
    val a = base.select(col("vec_id").as("va"), col("cid").as("ca"),
                        col("q").as("qa"), col("nrm").as("na"))
    val b = base.select(col("vec_id").as("vb"), col("cid").as("cb"),
                        col("q").as("qb"), col("nrm").as("nb"))
    val drops = a.join(b, col("ca") === col("cb") && col("va") < col("vb"))
      .filter((expr("graft_dotq12(qa, qb)") /
                 (sqrt(col("na")) * sqrt(col("nb")))) >= 0.35)
      .select(col("vb").as("dup_id")).distinct()
    base.join(drops, col("vec_id") === col("dup_id"), "left_anti")
      .select(col("vec_id"), col("cid"))
      .orderBy("vec_id")
  }

  /** DSIR-style data selection (arXiv:2302.03169): estimate each
    * document's importance for a TARGET domain as the mean
    * target/raw probability ratio of its hashed n-gram features,
    * then resample the corpus with inclusion probability proportional
    * to that importance. Target here = the `lang='en'` slice (the
    * "quality domain" stand-in the fixtures support); features =
    * word bigrams, Laplace-(+1)-smoothed so target-absent features
    * pull the score down instead of zeroing it.
    *
    * Exactness discipline: the per-feature ratio is the integer ppm
    * rational (n_t+1)(N_r+V)·10^6 div (n_r+1)(N_t+V), accumulated in
    * DECIMAL(38,0) (the products pass 2^63 around the 100x corpus,
    * where a BIGINT would wrap silently with ANSI off); the document
    * score is sum div count — the same "integer mean instead of float
    * log-sum" trade [[Pipeline.qTextPerplexityGate]] records: the
    * arithmetic mean of ratios ranks like the log-importance for a
    * fixed-length regime and every intermediate is a cross-engine-
    * exact integer. The resample is sequential Poisson
    * ([[Curate.qSampleWeighted]], Ohlsson 1998) with the LEARNED
    * score as the weight: priority = knuth_hash(doc_id)·10^6 div
    * score_ppm, keep the bottom-100 — importance-weighted sampling
    * without replacement, deterministic in both engines.
    *
    * Plan shape: the bigram stream is generated map-side and never
    * carries text (Catalyst prunes to doc_id+tokens at the scan);
    * the two frequency tables and the ratio table are vocab-bounded
    * and BROADCAST, so the corpus-sized feature stream shuffles only
    * (doc_id, ratio-partial) pairs; the final bottom-k is a
    * TakeOrderedAndProject (per-partition top-k, k rows to the
    * driver). At 100 TB the vocab table is the hashed-feature table
    * of the DSIR paper (fixed 10^4-10^5 buckets) — strictly smaller
    * than this exact-vocab fixture face. */
  /** The DSIR importance estimator alone: every document scored
    * against the target (full table, no resample) — exposed so
    * SemanticSpec can pin the estimation property (target-language
    * docs score strictly higher on average) independently of the
    * sampling noise at the resample size. */
  private[queries] def dsirScores(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tok = docs
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(1, size(tk) - 1)," +
          " i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"))
        .as("w"))
    val raw = tok.groupBy("w").agg(count(lit(1)).as("n_r"))
    val totals = tok
      .agg(count(lit(1)).as("nr"), countDistinct(col("w")).as("v"))
      .crossJoin(tok.filter(col("lang") === "en")
        .agg(count(lit(1)).as("nt")))
    val tgt = tok.filter(col("lang") === "en")
      .groupBy(col("w").as("tw")).agg(count(lit(1)).as("n_t"))
    val ratio = raw
      .join(tgt, col("w") === col("tw"), "left")
      .crossJoin(broadcast(totals))
      .select(col("w"), expr(
        "((CAST(coalesce(n_t, 0L) AS DECIMAL(38,0)) + 1) * (nr + v)" +
          " * 1000000L) div ((CAST(n_r AS DECIMAL(38,0)) + 1) * (nt + v))")
        .as("r_ppm"))
    tok
      .join(broadcast(ratio), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feat"),
           sum(col("r_ppm")).as("sr"))
      .select(col("doc_id"), col("n_feat"),
              expr("CAST(sr div n_feat AS BIGINT)").as("score_ppm"))
  }

  def qSelectDsir(s: SparkSession, dir: String): DataFrame = {
    val sampled = dsirScores(s, dir)
      .select(col("doc_id"), col("n_feat"), col("score_ppm"),
        expr("pmod(doc_id * 2654435761, 4294967296) * 1000000 div score_ppm")
          .as("prio"))
      .orderBy(col("prio"), col("doc_id"))
      .limit(100)
    sampled
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("prio", "doc_id"))
        .cast("long"))
      .select(col("pos"), col("doc_id"), col("n_feat"), col("score_ppm"),
              col("prio"))
      .orderBy("pos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_semantic" -> (qDedupSemantic _),
    "q_select_dsir" -> (qSelectDsir _),
  )

  /** Shared DuckDB twin of the SemDeDup query: the learned-IVF Lloyd
    * CTE prefix verbatim (so the clustering can never drift from the
    * ANN faces), a4 MATERIALIZED because the pair stage references it
    * three times (the round-12 CTE-inlining lesson).
    *
    * The pair cosines use native `list_dot_product` over the
    * PRE-QUANTIZED integer-valued coordinate lists instead of the
    * GENERATE_SERIES(64) row explosion — at the 10x clone the
    * exploded form hash-aggregates 1.6B rows (420 s); this one runs
    * one vectorized 64-term dot per pair (62 s), and it is EXACT by
    * a range argument, not luck: each coordinate is an integer
    * ≤ ~3·10^6 in magnitude (the ×10^6 decimal quantization), so
    * every product ≤ ~10^13 and every 64-term partial sum ≤ ~6·10^14
    * — all integers below 2^53, each exactly representable, so the
    * double accumulation commits no rounding anywhere. The final
    * ×10^-12 decimal rescale then performs the ONE correct rounding
    * to double, identical to the engine's CAST(exact-decimal AS
    * DOUBLE). Verified bit-identical to the exploded SUM(DECIMAL)
    * form at sf0.01 and the 10x clone. */
  private lazy val semanticSql: String =
    s"""${Llm.ivfLloydCtes},
       |a4m AS MATERIALIZED (SELECT vec_id, cid FROM a4),
       |qv AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x ->
       |      CAST(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS DOUBLE)) AS q
       |  FROM embeddings),
       |per AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb,
       |    CAST(CAST(list_dot_product(qa.q, qb.q) AS BIGINT)
       |      * CAST(0.000000000001 AS DECIMAL(13,12)) AS DOUBLE) AS dot,
       |    CAST(CAST(list_dot_product(qa.q, qa.q) AS BIGINT)
       |      * CAST(0.000000000001 AS DECIMAL(13,12)) AS DOUBLE) AS na,
       |    CAST(CAST(list_dot_product(qb.q, qb.q) AS BIGINT)
       |      * CAST(0.000000000001 AS DECIMAL(13,12)) AS DOUBLE) AS nb
       |  FROM a4m a
       |  JOIN a4m b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  JOIN qv qa ON qa.vec_id = a.vec_id
       |  JOIN qv qb ON qb.vec_id = b.vec_id),
       |drops AS (
       |  SELECT DISTINCT vb FROM per
       |  WHERE dot / (SQRT(na) * SQRT(nb)) >= 0.35)
       |SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid
       |FROM a4m a
       |WHERE a.vec_id NOT IN (SELECT vb FROM drops)
       |ORDER BY a.vec_id""".stripMargin

  /** DuckDB twin of the DSIR query; HUGEINT is DuckDB's DECIMAL(38,0)
    * stand-in, `//` its positive-operand-identical integer div. The
    * bigram series bound 512 is the OracleBoundsSpec-pinned corpus
    * max token count. */
  private lazy val dsirSql: String =
    """WITH tkl AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents),
      |tok AS (
      |  SELECT doc_id, lang, tk[i] || ' ' || tk[i + 1] AS w
      |  FROM tkl, GENERATE_SERIES(1, 512) AS g(i)
      |  WHERE len(tk) >= 2 AND i <= len(tk) - 1),
      |raw AS (SELECT w, COUNT(*) AS n_r FROM tok GROUP BY w),
      |rawtot AS (SELECT COUNT(*) AS nr, COUNT(DISTINCT w) AS v FROM tok),
      |tgt AS (SELECT w, COUNT(*) AS n_t FROM tok WHERE lang = 'en' GROUP BY w),
      |tgttot AS (SELECT COUNT(*) AS nt FROM tok WHERE lang = 'en'),
      |ratio AS (
      |  SELECT raw.w,
      |    ((CAST(COALESCE(tgt.n_t, 0) AS HUGEINT) + 1) * (nr + v) * 1000000)
      |      // ((CAST(raw.n_r AS HUGEINT) + 1) * (nt + v)) AS r_ppm
      |  FROM raw LEFT JOIN tgt ON raw.w = tgt.w, rawtot, tgttot),
      |score AS (
      |  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feat,
      |    CAST(CAST(SUM(r_ppm) AS HUGEINT) // COUNT(*) AS BIGINT) AS score_ppm
      |  FROM tok t JOIN ratio ON t.w = ratio.w GROUP BY t.doc_id),
      |sampled AS (
      |  SELECT doc_id, n_feat, score_ppm,
      |    ((doc_id * 2654435761) % 4294967296) * 1000000 // score_ppm AS prio
      |  FROM score ORDER BY prio, doc_id LIMIT 100)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY prio, doc_id) AS BIGINT) AS pos,
      |  doc_id, n_feat, score_ppm, prio
      |FROM sampled ORDER BY pos""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_dedup_semantic" -> semanticSql,
    "q_select_dsir" -> dsirSql,
  )
}
