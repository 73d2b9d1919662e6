package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.{DetSql => D}

/** Round-6 curation / preparation operators: chunking for RAG-style
  * retrieval corpora, deterministic reservoir sampling, temperature-
  * scaled source mixing (the data-mixture knob every LLM training run
  * turns), int8 embedding quantization, robust (median/MAD) outlier
  * gating, gap-filling windows, unpivot, and URL parsing. All are
  * declarative DataFrame plans with exact DuckDB oracle twins; the
  * arithmetic follows the [[graft.sql.Det]] discipline (integer /
  * decimal fixed-point everywhere a sum or division could otherwise
  * accumulate order-dependent floating-point error). */
object Curate {

  /** Fixed-size token chunking (64-token chunks): the standard prep
    * step for retrieval corpora and long-document training. One narrow
    * pass per doc; the explode emits (chunk_id, count, 16-char md5) —
    * never chunk text — so at 100 TB the shuffle carries ~30 B per
    * chunk and the op parallelizes per document with no skew beyond
    * document length itself. */
  def qTextChunk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0L, (size(tk) - 1) div 64)," +
          " i -> struct(i AS chunk_id," +
          " size(slice(tk, int(i * 64 + 1), 64)) AS n_tok_chunk," +
          " substring(md5(concat_ws(' ', slice(tk, int(i * 64 + 1), 64)))," +
          "   1, 16) AS chunk_md5))")).as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
              col("c.n_tok_chunk").as("n_tok_chunk"),
              col("c.chunk_md5").as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  /** Deterministic per-group reservoir sample: 20 docs per lang, chosen
    * by a Knuth-multiplicative-hash priority (reproducible across runs
    * and engines — NOT engine rand()). The row_number()<=k plan is
    * rewritten by [[graft.plans.TopKPerKey]] into bounded per-key
    * heaps: only <=20 survivors per lang are shuffled, never the
    * corpus, so the sample costs a scan + k-row-per-key shuffle at any
    * scale. */
  def qSampleReservoir(s: SparkSession, dir: String): DataFrame = {
    graft.plans.TopKPerKey.register(s)
    val prio = (col("doc_id") * lit(2654435761L)) % lit(4294967296L)
    val w = Window.partitionBy("lang").orderBy(col("prio"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), prio.as("prio"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("rn").cast("long").as("rn"),
              col("doc_id"), col("prio"))
      .orderBy("lang", "rn")
  }

  /** Temperature-scaled source mixing (T=2, i.e. weights proportional
    * to sqrt of source size) — the standard upweighting of small
    * high-quality sources in an LLM training mixture. Weights are kept
    * in integer micro-units (floor(sqrt(n)*1e6)) so shares come from
    * exact integer division, not an order-dependent float sum. One
    * partial-agg pass + a broadcast of the single-row total: no
    * full-data shuffle at any scale. */
  def qMixTemperature(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("w", floor(sqrt(col("n").cast("double")) * 1e6).cast("long"))
    val tot = per.agg(sum(col("w")).as("total"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n"), col("w"),
              expr("w * 1000000 div total").as("share_ppm"))
      .orderBy("source")
  }

  /** Symmetric int8 quantization of embedding vectors (the storage /
    * ANN-speed knob for a 100 TB vector corpus): per-vector max-abs
    * scale, each dim mapped to sign(v)*floor(|v|*127/max). All in
    * integer fixed-point (micro-units) so Spark and the oracle agree
    * bit-for-bit. A single narrow codegen pass over the vectors —
    * no shuffle except the final order for the gate. */
  def qEmbedQuantize(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(
        "transform(embedding," +
          " x -> cast(cast(cast(x AS double) AS decimal(18,6)) * 1000000" +
          " AS bigint))").as("vi"))
      .select(col("vec_id"),
              expr("array_max(transform(vi, x -> abs(x)))").as("m"),
              col("vi"))
      .select(col("vec_id"), col("m"), expr(
        "transform(vi, x -> CASE WHEN m = 0 THEN 0L" +
          " ELSE cast(signum(x) AS bigint) * ((abs(x) * 127) div m)" +
          " END)").as("q"))
      .select(col("vec_id"), col("m"),
              expr("aggregate(q, 0L, (a, x) -> a + abs(x))").as("sum_abs_q"),
              expr("size(filter(q, x -> abs(x) = 127))").as("n_sat"))
      .orderBy("vec_id")

  /** Robust per-language length outlier gate: exact median + MAD
    * (median absolute deviation) of n_chars, flagging docs beyond
    * 3 MAD. Languages are FEW and HUGE, so a partitioned window over
    * raw docs would recreate the giant-partition regime — instead the
    * median is computed on the (lang, n_chars) HISTOGRAM (domain-
    * bounded: doc length), which shrinks the data to |langs|x|lengths|
    * rows before any window. Medians are exact bracketing values kept
    * in doubled/quadrupled integer units (med2 = 2*median,
    * mad4 = 4*MAD) so every comparison is integer; the exported
    * median/MAD are exact dyadic doubles (x/2, x/4). */
  def qOutlierMad(s: SparkSession, dir: String): DataFrame = {
    // The histogram feeds THREE consumers (median brackets, deviation
    // histogram, final gate) — materialize the post-aggregation rows
    // (|langs| x |lengths|, tiny) once so the 100 TB scan happens once,
    // not three times. localCheckpoint, not persist: blocks are
    // ContextCleaner-reclaimed (same discipline as Prefix.withPrefix).
    val h = Tables.documents(s, dir)
      .groupBy("lang", "n_chars").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val wl = Window.partitionBy("lang").orderBy("n_chars")
    val wn = Window.partitionBy("lang")
    val cum = h.select(col("lang"), col("n_chars"), col("c"),
      sum(col("c")).over(wl).as("cum"), sum(col("c")).over(wn).as("n"))
    def bracket(df: DataFrame, v: String): DataFrame =
      df.filter(col("cum") >= Prefix.idiv(col("n") + 1, lit(2L)))
        .groupBy("lang").agg(min(col(v)).as("v_lo"))
        .join(df.filter(col("cum") >= Prefix.idiv(col("n") + 2, lit(2L)))
          .groupBy("lang").agg(min(col(v)).as("v_hi"), max(col("n")).as("n")),
          "lang")
    val med = bracket(cum, "n_chars")
      .select(col("lang"), (col("v_lo") + col("v_hi")).as("med2"), col("n"))
    val hd = h.join(broadcast(med), "lang")
      .select(col("lang"), abs(lit(2) * col("n_chars") - col("med2"))
        .as("dev2"), col("c"))
      .groupBy("lang", "dev2").agg(sum(col("c")).as("c"))
    val wd = Window.partitionBy("lang").orderBy("dev2")
    val cumd = hd.select(col("lang"), col("dev2"), col("c"),
      sum(col("c")).over(wd).as("cum"), sum(col("c")).over(wn).as("n"))
    val mad = bracket(cumd, "dev2")
      .select(col("lang"), (col("v_lo") + col("v_hi")).as("mad4"))
    val gates = med.join(mad, "lang")
    h.join(broadcast(gates), "lang")
      .groupBy("lang")
      .agg(max(col("n")).as("n"),
           (max(col("med2")) / lit(2.0)).as("median_chars"),
           (max(col("mad4")) / lit(4.0)).as("mad_chars"),
           sum(when(lit(2) * abs(lit(2) * col("n_chars") - col("med2"))
             > lit(3) * col("mad4"), col("c")).otherwise(lit(0L)))
             .as("n_outliers"))
      .orderBy("lang")
  }

  /** Gap-filling navigation window: each event carries the value of the
    * user's most recent purchase at-or-before it (LAST_VALUE ... IGNORE
    * NULLS). Partitioned per user — genuinely parallel; ordering is
    * pinned to (microsecond ts, event_id) in BOTH engines so ties
    * cannot reorder across the ns-vs-us parquet precision gap. */
  def qWinFillForward(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
              unix_timestamp(col("ts")).as("ts_s"),
              last(when(col("event_type") === "purchase", col("value")),
                   ignoreNulls = true).over(w).as("last_purchase_v"))
      .orderBy("event_id")
  }

  /** Unpivot (wide -> long): part metrics melted to (metric, val) rows
    * via `stack` — a pure narrow Generate, 2 rows out per row in, no
    * shuffle. The inverse face of q_agg_pivot. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .selectExpr("p_partkey",
        "stack(2, 'retailprice', p_retailprice," +
          " 'size', cast(p_size AS double)) AS (metric, val)")
      .orderBy("p_partkey", "metric")

  /** URL parsing (the log/crawl-processing workhorse): synthesizes a
    * canonical URL per doc, then extracts host / path / query-param /
    * fragment with Spark's native parse_url expression. The oracle
    * rebuilds each component from the same ground-truth columns, so
    * this checks parse_url's semantics exactly. Narrow, codegen, no
    * shuffle. */
  def qFnUrl(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.org/docs/"),
               col("doc_id"), lit("?lang="), col("lang"),
               lit("&ref=graft#top")).as("url"))
      .select(col("doc_id"), col("url"),
              expr("parse_url(url, 'HOST')").as("host"),
              expr("parse_url(url, 'PATH')").as("path"),
              expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"),
              expr("parse_url(url, 'REF')").as("frag"))
      .orderBy("doc_id")

  /** URL-canonicalization dedup — the crawl-dedup production step that
    * runs BEFORE any content hashing: collapse page variants that
    * differ only by host case, trailing slash, tracking params, or
    * fragment. Four deterministic variants per page are synthesized
    * from doc_id (ground truth: page = doc_id div 4), then
    * canonicalized with the native parse_url expression (lowercased
    * host, slash-stripped path, only the meaningful `lang` param
    * kept — utm_* and fragments dropped). One narrow codegen pass +
    * one hash agg; the oracle REBUILDS each canonical URL from the
    * ground-truth page id, checking the parse/normalize semantics
    * exactly (same discipline as q_fn_url). */
  def qDedupUrlCanonical(s: SparkSession, dir: String): DataFrame = {
    val page = expr("doc_id div 4")
    val src = expr("CASE pmod(doc_id div 4, 3) WHEN 0 THEN 'alpha' " +
      "WHEN 1 THEN 'beta' ELSE 'gamma' END")
    val lang = expr("CASE pmod(doc_id div 4, 2) WHEN 0 THEN 'en' ELSE 'de' END")
    val url = concat(
      lit("https://"), src,
      when(pmod(col("doc_id"), lit(4)) === 2, lit(".EXAMPLE.ORG/page/"))
        .otherwise(lit(".example.org/page/")),
      page,
      when(pmod(col("doc_id"), lit(4)) === 1, lit("/")).otherwise(lit("")),
      lit("?lang="), lang,
      when(pmod(col("doc_id"), lit(4)) === 2, lit("&utm_source=feed"))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(4)) === 3, lit("#section-2"))
        .otherwise(lit("")))
    Tables.documents(s, dir)
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), concat(
        lit("https://"), lower(expr("parse_url(url, 'HOST')")),
        regexp_replace(expr("parse_url(url, 'PATH')"), "/$", ""),
        lit("?lang="), expr("parse_url(url, 'QUERY', 'lang')"))
        .as("canon"))
      .groupBy("canon")
      .agg(count(lit(1)).as("n_variants"),
           min(col("doc_id")).as("min_doc"),
           max(col("doc_id")).as("max_doc"))
      .orderBy("canon", "min_doc")
  }

  /** Time-series resampling to a regular grid: per user, EVERY hour
    * between their first and last event — observed hours carry their
    * aggregates, gap hours are zero-filled. The companion to
    * q_win_fill_forward (which fills at event times; this fills at GRID
    * times — the shape every downstream forecasting/monitoring job
    * wants). The explode is per-user bounded by the corpus's ~30-day
    * window (≤720 rows/user — measured max span 719 h at both sf0.01
    * and sf0.1), and the grid joins the PRE-AGGREGATED hourly table,
    * so the fact table shuffles once as partials. Full user domain
    * (round 7; the earlier user_id < 10 slice was oracle-output
    * sizing that the measured span bound makes unnecessary). */
  def qResampleHourly(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"),
              expr("unix_micros(ts) DIV 3600000000").as("hr"), col("value"))
    val hourly = e.groupBy("user_id", "hr")
      .agg(count(lit(1)).as("cnt"), graft.sql.Det.dsum(col("value")).as("sv"))
    val grid = e.groupBy("user_id")
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("hr"))
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
              coalesce(col("cnt"), lit(0L)).as("n"),
              coalesce(col("sv"), lit(0.0)).as("sum_value"))
      .orderBy("user_id", "hr")
  }

  /** Weighted (probability-proportional-to-size) sample — sequential
    * Poisson sampling (Ohlsson 1998): priority = u / w with u the
    * Knuth-LCG hash of doc_id (uniform on [0, 2^32), never engine
    * rand()) and w = n_chars, keep the bottom-k priorities. Heavier
    * docs draw smaller priorities, so inclusion probability is
    * ~proportional to length — the token-weighted sample an LLM data
    * ablation wants. Priorities are exact integers (hash * 1e6 div w;
    * hash < 2^32 so the product stays < 2^52, exact in both engines'
    * BIGINTs; n_chars >= 1 by generator construction). The plan is a
    * narrow scan + TakeOrderedAndProject (per-partition bounded
    * top-k, merged at the driver): only k survivors ever leave a
    * partition, so the sample costs one scan at any corpus size. The
    * final row_number window runs over the ALREADY-LIMITED k rows —
    * bounded by k, not the corpus. */
  def qSampleWeighted(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").as("w"),
        expr("pmod(doc_id * 2654435761, 4294967296) * 1000000 div n_chars")
          .as("prio"))
      .orderBy(col("prio"), col("doc_id"))
      .limit(100)
    base
      .withColumn("pos",
        row_number().over(Window.orderBy("prio", "doc_id")).cast("long"))
      .select(col("pos"), col("doc_id"), col("w"), col("prio"))
      .orderBy("pos")
  }

  /** Mixture budget solver — given target source weights and the
    * tokens actually available per source, the max corpus size B
    * (in weight-exact proportions, no source repeated/epoch'd) is
    * B = min_s(avail_s * Wtot div w_s), with per-source allocation
    * floor(B * w_s / Wtot). The planning query every mixture design
    * runs BEFORE q_mix_sources executes the blend: it names the
    * binding source (util_ppm = 1e6) and how much of every other
    * source goes unused. One partial-agg corpus pass -> a |sources|-row
    * table; the min/total fold is a broadcast of single-row
    * aggregates — no full-data shuffle at any scale. Integer-exact
    * while avail_s < 2^63/1e6 (~9.2e12 chars/source); beyond that the
    * ppm step moves to DECIMAL(38,0) like the pagerank accumulator. */
  def qMixBudget(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .groupBy("source")
      .agg(sum(col("n_chars")).as("avail"))
      .withColumn("w",
        (expr("CAST(substring(source, 4) AS INT)") % 4 + 1).cast("long"))
    val tot = per.agg(sum(col("w")).as("wtot"))
    val budget = per.crossJoin(broadcast(tot))
      .agg(min(expr("avail * wtot div w")).as("budget"),
           max(col("wtot")).as("wtot"))
    per.crossJoin(broadcast(budget))
      .select(col("source"), col("w"), col("avail"),
              expr("budget * w div wtot").as("alloc"),
              expr("(budget * w div wtot) * 1000000 div avail").as("util_ppm"),
              col("budget"))
      .orderBy("source")
  }

  /** Water-filling mixture solver — the epoch-capped companion to
    * [[qMixBudget]]: when the requested budget B (here 80% of the
    * corpus, integer `total*4 div 5`) EXCEEDS the exact-proportion
    * maximum, small sources run dry (alloc = avail, capped) and their
    * shortfall redistributes across the uncapped sources in weight
    * proportion — the allocation that solves
    * max Σ alloc s.t. alloc_s ≤ avail_s, alloc_s ∝ w_s among uncapped.
    * Exact integer algorithm: sort sources by the avail/w ratio via
    * the EXACT key avail·(12 div w) (w ∈ 1..4 all divide 12 — no
    * float ratio, no tie ambiguity), then a source is capped iff
    * avail·(Wtot−PW) < (B−PA)·w over the exclusive prefix sums PA/PW
    * (cross-multiplied — never a division), and every uncapped source
    * gets floor((B−ΣcappedAvail)·w / (Wtot−ΣcappedW)). CurateSpec
    * verifies the capped set against a brute-force water-level search.
    * The ordered window runs over the POST-AGGREGATION |sources|-row
    * table (tiny at any corpus scale); the corpus itself contributes
    * one partial-agg scan. */
  def qMixWaterfill(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .groupBy("source")
      .agg(sum(col("n_chars")).as("avail"))
      .withColumn("w",
        (expr("CAST(substring(source, 4) AS INT)") % 4 + 1).cast("long"))
    val tot = per.agg(sum(col("w")).as("wtot"),
                      expr("sum(avail) * 4 div 5").as("b"))
    val wOrd = Window.orderBy(expr("avail * (12 div w)"), col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cap = per.crossJoin(broadcast(tot))
      .withColumn("pa", coalesce(sum(col("avail")).over(wOrd), lit(0L)))
      .withColumn("pw", coalesce(sum(col("w")).over(wOrd), lit(0L)))
      .withColumn("capped",
        when(col("avail") * (col("wtot") - col("pw"))
          < (col("b") - col("pa")) * col("w"), lit(1)).otherwise(lit(0)))
    val k = cap.agg(
      coalesce(sum(col("avail") * col("capped")), lit(0L)).as("ca"),
      coalesce(sum(col("w") * col("capped")), lit(0L)).as("cw"))
    cap.crossJoin(broadcast(k))
      .select(col("source"), col("w"), col("avail"),
              when(col("capped") === 1, col("avail"))
                .otherwise(expr("(b - ca) * w div (wtot - cw)")).as("alloc"),
              col("capped"), col("b").as("budget"))
      .orderBy("source")
  }

  /** Deterministic training-order shuffle — the LAST step of the
    * curation pipeline (dedup → gate → mix → pack → SHUFFLE): a global
    * permutation of the corpus by LCG key, computed WITHOUT a global
    * sort. Knuth's multiplicative hash k = doc_id * 2654435761 mod 2^32
    * is a bijection (odd multiplier), so keys are collision-free and
    * the permutation is reproducible across engines/retries — never
    * rand(). Position = range-bucket prefix counts (the same
    * Prefix.bucketCountsWithPrefix machinery as percentile/paginate:
    * tiny triangular join on ≤256 bucket counts) + a PARTITIONED
    * in-bucket window — at scale the bucket-sequential write IS the
    * training order, no stage ever sorts the whole corpus. Only
    * (doc_id, key) pairs shuffle — the text column is never even
    * scanned (ShuffleSpec pins the volume). doc_id stays below 2^31
    * in every sf, so the products are exact in both engines' BIGINTs. */
  def qCorpusShuffle(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(s, dir)
      .select(col("doc_id"),
              pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)).as("k"))
    val (bucketed, pref) = Prefix.bucketCountsWithPrefix(keyed, col("k"), 256)
    val w = Window.partitionBy("_pb").orderBy("k")
    bucketed.join(broadcast(pref), col("_pb") === col("pb"))
      .select((col("n_before") + row_number().over(w)).as("pos"),
              col("doc_id"), col("k"))
      .orderBy("pos")
  }

  /** Deterministic fractional epoch upsampling — the multi-epoch
    * mixture knob (small high-quality sources repeated more often per
    * training epoch, à la the published LLaMA / DoReMi recipes): each
    * source gets factor sqrt(mass_max/mass_src) >= 1 where mass is
    * the source's total character count (token budget, not doc count
    * — doc counts are uniform in this corpus, so a count-based factor
    * would degenerate to the identity), and a document is emitted
    * floor(factor) times plus one more iff its Knuth-hash fraction
    * falls under the fractional part — so realized copies are exact
    * per doc and the expected source mass matches the target factor.
    * All arithmetic is integer ppm after one correctly-rounded IEEE
    * sqrt (sqrt, unlike ln/exp, is exact in both engines — same
    * discipline as [[qMixTemperature]]). Scale shape: the factor
    * table is source-cardinality-sized and broadcast; the replication
    * is a narrow sequence+explode with NO shuffle — the inherent
    * output-size multiplication is the op's purpose, not overhead. */
  def qMixEpochUpsample(s: SparkSession, dir: String): DataFrame = {
    import graft.sql.Det.lcgBucket
    val per = Tables.documents(s, dir)
      .groupBy("source").agg(sum(col("n_chars")).as("m"))
    val mx = per.agg(max(col("m")).as("m_max"))
    val fac = per.crossJoin(broadcast(mx))
      .select(col("source"),
        floor(sqrt(col("m_max").cast("double") / col("m").cast("double"))
          * 1e6).cast("long").as("f_ppm"))
    Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(broadcast(fac), "source")
      .withColumn("n_copies",
        expr("f_ppm div 1000000") +
          when(lcgBucket(col("doc_id"), 1000000) <
            col("f_ppm") % lit(1000000L), 1L).otherwise(0L))
      .select(col("source"), col("doc_id"), col("f_ppm"),
        explode(expr("sequence(1L, n_copies)")).as("copy_id"))
      .orderBy("source", "doc_id", "copy_id")
  }

  /** Per-domain document cap — the crawl-curation step that stops a
    * handful of mega-hosts from dominating the training mixture
    * (RefinedWeb/FineWeb-style "top-N documents per host"): each doc
    * is assigned its host (synthesized with a realistic hub/tail
    * SKEW — 7 hub hosts holding ~1/5 of the corpus, thousands of
    * ~32-doc tail sites), ranked within its host by (n_chars DESC,
    * doc_id ASC), and only the top 8 survive; every kept row also
    * carries the host's pre-cap population so dropped mass is
    * accountable (n_host_total - 8).
    *
    * 100 TB story: the rank<=K filter is REWRITTEN by
    * [[graft.plans.TopKPerKey]] into two bounded-heap levels — map
    * side keeps at most K rows per host BEFORE the shuffle, so a hub
    * host ships 8 rows, not its millions — exactly the skew this
    * fixture builds; a window sort would instead sort every hub
    * partition end-to-end. The per-host population table is post-agg
    * tiny and AQE picks the broadcast join. The narrow (doc_id,
    * n_chars, host) projection is deliberately scanned TWICE (caps +
    * rank) rather than checkpointed: materializing a corpus-sized
    * frame trades a cheap pruned re-scan for cluster memory/disk —
    * the wrong trade at 100 TB (only the TINY post-agg tables get the
    * checkpoint discipline elsewhere in this repo). */
  def qMixDomainCap(s: SparkSession, dir: String): DataFrame = {
    graft.plans.TopKPerKey.register(s)
    val hostExpr = expr(
      "CASE WHEN pmod(doc_id, 5) = 0 THEN concat('hub-', pmod(doc_id, 7)) " +
      "ELSE concat('site-', doc_id div 40) END")
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"), hostExpr.as("host"))
    val caps = d.groupBy("host").agg(count(lit(1)).as("n_host_total"))
    val w = Window.partitionBy("host")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    d.select(col("host"), col("doc_id"), col("n_chars"),
             row_number().over(w).as("rk"))
      .filter(col("rk") <= 8)
      .join(caps, "host")
      .select(col("host"), col("doc_id"), col("n_chars"), col("rk"),
              col("n_host_total"))
      .orderBy("host", "rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mix_domain_cap" -> (qMixDomainCap _),
    "q_mix_epoch_upsample" -> (qMixEpochUpsample _),
    "q_corpus_shuffle" -> (qCorpusShuffle _),
    "q_sample_weighted" -> (qSampleWeighted _),
    "q_mix_budget" -> (qMixBudget _),
    "q_mix_waterfill" -> (qMixWaterfill _),
    "q_dedup_url_canonical" -> (qDedupUrlCanonical _),
    "q_resample_hourly" -> (qResampleHourly _),
    "q_text_chunk" -> (qTextChunk _),
    "q_sample_reservoir" -> (qSampleReservoir _),
    "q_mix_temperature" -> (qMixTemperature _),
    "q_embed_quantize" -> (qEmbedQuantize _),
    "q_outlier_mad" -> (qOutlierMad _),
    "q_win_fill_forward" -> (qWinFillForward _),
    "q_unpivot" -> (qUnpivot _),
    "q_fn_url" -> (qFnUrl _),
  )

  val oracle: Map[String, String] = Map(
    "q_mix_domain_cap" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 5 = 0 THEN 'hub-' || (doc_id % 7)
        |         ELSE 'site-' || (doc_id // 40) END AS host
        |  FROM documents),
        |caps AS (SELECT host, COUNT(*) AS n_host_total FROM d GROUP BY host),
        |ranked AS (
        |  SELECT host, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY host
        |                       ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM d)
        |SELECT r.host, r.doc_id, r.n_chars, CAST(r.rk AS INT) AS rk,
        |  c.n_host_total
        |FROM ranked r JOIN caps c ON c.host = r.host
        |WHERE r.rk <= 8
        |ORDER BY r.host, r.rk""".stripMargin,
    "q_mix_epoch_upsample" ->
      s"""WITH per AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS m
         |  FROM documents GROUP BY source),
         |mx AS (SELECT MAX(m) AS m_max FROM per),
         |fac AS (SELECT source,
         |  CAST(FLOOR(SQRT(CAST(m_max AS DOUBLE) / CAST(m AS DOUBLE))
         |    * 1000000) AS BIGINT) AS f_ppm
         |  FROM per, mx),
         |d AS (SELECT dd.source, dd.doc_id, f.f_ppm,
         |  f.f_ppm // 1000000 +
         |  CASE WHEN ${D.lcgBucket("dd.doc_id", 1000000)} < f.f_ppm % 1000000
         |       THEN 1 ELSE 0 END AS n_copies
         |  FROM documents dd JOIN fac f ON f.source = dd.source)
         |SELECT source, doc_id, f_ppm, CAST(g.i AS BIGINT) AS copy_id
         |-- series bound 64 copies/doc (= factor sqrt(n_max/n) up to 64,
         |-- i.e. a 4096x source-size spread; the synthetic mixtures sit
         |-- near 1) — DuckDB's GENERATE_SERIES takes no lateral bound,
         |-- so fixed bound + WHERE, like the 512-token chunking oracles
         |FROM d, GENERATE_SERIES(1, 64) AS g(i)
         |WHERE g.i <= n_copies
         |ORDER BY source, doc_id, copy_id""".stripMargin,
    "q_sample_weighted" ->
      """SELECT pos, doc_id, w, prio FROM (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY prio, doc_id) AS BIGINT)
        |      AS pos,
        |    doc_id, w, prio
        |  FROM (SELECT doc_id, n_chars AS w,
        |          ((doc_id * 2654435761) % 4294967296) * 1000000 // n_chars
        |            AS prio
        |        FROM documents))
        |WHERE pos <= 100 ORDER BY pos""".stripMargin,
    "q_mix_waterfill" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(CAST(SUBSTRING(source, 4) AS INT) % 4 + 1 AS BIGINT) AS w,
        |    CAST(SUM(n_chars) AS BIGINT) AS avail
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wtot,
        |               CAST(CAST(SUM(avail) AS BIGINT) * 4 // 5 AS BIGINT)
        |                 AS b
        |        FROM per),
        |ord AS (
        |  SELECT source, w, avail,
        |    CAST(COALESCE(SUM(avail) OVER (ORDER BY avail * (12 // w), source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS pa,
        |    CAST(COALESCE(SUM(w) OVER (ORDER BY avail * (12 // w), source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS pw
        |  FROM per),
        |cap AS (
        |  SELECT o.source, o.w, o.avail,
        |    CASE WHEN o.avail * (t.wtot - o.pw) < (t.b - o.pa) * o.w
        |      THEN 1 ELSE 0 END AS capped
        |  FROM ord o, tot t),
        |k AS (SELECT CAST(COALESCE(SUM(avail * capped), 0) AS BIGINT) AS ca,
        |             CAST(COALESCE(SUM(w * capped), 0) AS BIGINT) AS cw
        |      FROM cap)
        |SELECT c.source, c.w, c.avail,
        |  CAST(CASE WHEN c.capped = 1 THEN c.avail
        |    ELSE (t.b - k.ca) * c.w // (t.wtot - k.cw) END AS BIGINT) AS alloc,
        |  c.capped, t.b AS budget
        |FROM cap c, k, tot t ORDER BY c.source""".stripMargin,
    "q_mix_budget" ->
      """WITH per AS (
        |  SELECT source,
        |    CAST(CAST(SUBSTRING(source, 4) AS INT) % 4 + 1 AS BIGINT) AS w,
        |    CAST(SUM(n_chars) AS BIGINT) AS avail
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wtot FROM per),
        |b AS (SELECT CAST(MIN(avail * wtot // w) AS BIGINT) AS budget,
        |             CAST(MAX(wtot) AS BIGINT) AS wtot
        |      FROM per, tot)
        |SELECT source, w, avail,
        |  CAST(budget * w // wtot AS BIGINT) AS alloc,
        |  CAST((budget * w // wtot) * 1000000 // avail AS BIGINT) AS util_ppm,
        |  budget
        |FROM per, b ORDER BY source""".stripMargin,
    "q_dedup_url_canonical" ->
      """WITH canon AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    CASE (doc_id // 4) % 3 WHEN 0 THEN 'alpha'
        |      WHEN 1 THEN 'beta' ELSE 'gamma' END ||
        |    '.example.org/page/' || CAST(doc_id // 4 AS VARCHAR) ||
        |    '?lang=' ||
        |    CASE (doc_id // 4) % 2 WHEN 0 THEN 'en' ELSE 'de' END AS canon
        |  FROM documents)
        |SELECT canon, COUNT(*) AS n_variants,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM canon GROUP BY canon ORDER BY canon, min_doc""".stripMargin,
    "q_corpus_shuffle" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY k ASC) AS BIGINT) AS pos,
        |  doc_id, k
        |FROM (SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS k
        |      FROM documents)
        |ORDER BY pos""".stripMargin,
    "q_resample_hourly" ->
      """WITH e AS (
        |  SELECT user_id, EPOCH_NS(ts) // 1000 // 3600000000 AS hr, value
        |  FROM events),
        |hourly AS (
        |  SELECT user_id, hr, COUNT(*) AS cnt,
        |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        |  FROM e GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM e GROUP BY 1),
        |-- series bound 8192 h (~341 days) vs the generator's measured
        |-- ~720 h max per-user span: ~11x headroom; if the corpus window
        |-- ever exceeds it, this truncates where Spark's unbounded
        |-- sequence(h0, h1) does not — widen alongside the generator
        |grid AS (
        |  SELECT user_id, h0 + i AS hr
        |  FROM span, GENERATE_SERIES(0, 8192) AS g(i)
        |  WHERE h0 + i <= h1)
        |SELECT g.user_id, g.hr, COALESCE(h.cnt, 0) AS n,
        |  COALESCE(h.sv, 0.0) AS sum_value
        |FROM grid g LEFT JOIN hourly h
        |  ON g.user_id = h.user_id AND g.hr = h.hr
        |ORDER BY g.user_id, g.hr""".stripMargin,
    "q_text_chunk" ->
      """WITH tkl AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM documents)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |  CAST(LEN(tk[i*64+1 : i*64+64]) AS INT) AS n_tok_chunk,
        |  SUBSTRING(MD5(ARRAY_TO_STRING(tk[i*64+1 : i*64+64], ' ')), 1, 16)
        |    AS chunk_md5
        |FROM tkl, GENERATE_SERIES(0, 511) AS g(i)
        |WHERE i <= (LEN(tk) - 1) // 64
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // ^ 512-chunk cap = 32k-token docs; corpus max is ~100 tokens (same
    //   headroom idiom as the 512-shingle series in the LSH oracles)
    "q_sample_reservoir" ->
      """SELECT lang, rn, doc_id, prio FROM (
        |  SELECT lang, doc_id, (doc_id * 2654435761) % 4294967296 AS prio,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    "q_mix_temperature" ->
      """WITH per AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
        |w AS (SELECT source, n,
        |  CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS w
        |  FROM per),
        |t AS (SELECT CAST(SUM(w) AS BIGINT) AS total FROM w)
        |SELECT source, n, w, w * 1000000 // total AS share_ppm
        |FROM w, t ORDER BY source""".stripMargin,
    "q_embed_quantize" ->
      """WITH u AS (
        |  SELECT vec_id,
        |    CAST(CAST(CAST(e AS DOUBLE) AS DECIMAL(18,6)) * 1000000 AS BIGINT)
        |      AS vi
        |  FROM (SELECT vec_id, UNNEST(embedding) AS e FROM embeddings)),
        |mm AS (SELECT vec_id, MAX(ABS(vi)) AS m FROM u GROUP BY vec_id),
        |q AS (
        |  SELECT u.vec_id, mm.m,
        |    CASE WHEN m = 0 THEN 0
        |    ELSE CAST(SIGN(vi) AS BIGINT) * ((ABS(vi) * 127) // m) END AS qd
        |  FROM u JOIN mm ON u.vec_id = mm.vec_id)
        |SELECT vec_id, CAST(MAX(m) AS BIGINT) AS m,
        |  CAST(SUM(ABS(qd)) AS BIGINT) AS sum_abs_q,
        |  CAST(COUNT(*) FILTER (WHERE ABS(qd) = 127) AS INT) AS n_sat
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q_outlier_mad" ->
      """WITH h AS (
        |  SELECT lang, n_chars, COUNT(*) AS c FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, n_chars, c,
        |    SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
        |    SUM(c) OVER (PARTITION BY lang) AS n
        |  FROM h),
        |med AS (
        |  SELECT lo.lang, v_lo + v_hi AS med2, lo.n FROM
        |    (SELECT lang, MIN(n_chars) AS v_lo, MAX(n) AS n FROM cum
        |     WHERE cum >= (n + 1) // 2 GROUP BY lang) lo
        |    JOIN (SELECT lang, MIN(n_chars) AS v_hi FROM cum
        |     WHERE cum >= (n + 2) // 2 GROUP BY lang) hi
        |    ON lo.lang = hi.lang),
        |hd AS (
        |  SELECT h.lang, ABS(2 * n_chars - med2) AS dev2, SUM(c) AS c
        |  FROM h JOIN med ON h.lang = med.lang GROUP BY 1, 2),
        |cumd AS (
        |  SELECT lang, dev2, c,
        |    SUM(c) OVER (PARTITION BY lang ORDER BY dev2) AS cum,
        |    SUM(c) OVER (PARTITION BY lang) AS n
        |  FROM hd),
        |mad AS (
        |  SELECT dlo.lang, d_lo + d_hi AS mad4 FROM
        |    (SELECT lang, MIN(dev2) AS d_lo FROM cumd
        |     WHERE cum >= (n + 1) // 2 GROUP BY lang) dlo
        |    JOIN (SELECT lang, MIN(dev2) AS d_hi FROM cumd
        |     WHERE cum >= (n + 2) // 2 GROUP BY lang) dhi
        |    ON dlo.lang = dhi.lang)
        |SELECT h.lang, CAST(MAX(med.n) AS BIGINT) AS n,
        |  MAX(med2) / 2.0 AS median_chars,
        |  MAX(mad4) / 4.0 AS mad_chars,
        |  CAST(SUM(CASE WHEN 2 * ABS(2 * n_chars - med2) > 3 * mad4
        |    THEN c ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM h JOIN med ON h.lang = med.lang JOIN mad ON h.lang = mad.lang
        |GROUP BY h.lang ORDER BY h.lang""".stripMargin,
    "q_win_fill_forward" ->
      """SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_s,
        |  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS)
        |    OVER (PARTITION BY user_id
        |          ORDER BY EPOCH_NS(ts) // 1000, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase_v
        |FROM events ORDER BY event_id""".stripMargin,
    "q_unpivot" ->
      """SELECT p_partkey, metric, val FROM (
        |  SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val
        |  FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part)
        |ORDER BY p_partkey, metric""".stripMargin,
    "q_fn_url" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.org/docs/' ||
        |    CAST(doc_id AS VARCHAR) ||
        |    '?lang=' || lang || '&ref=graft#top' AS url,
        |  source || '.example.org' AS host,
        |  '/docs/' || CAST(doc_id AS VARCHAR) AS path,
        |  lang AS q_lang,
        |  'top' AS frag
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
