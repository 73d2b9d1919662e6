package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.Det._
import graft.sql.{DetSql => D}

/** Aggregation operators (SURVEY.md §2.B "Aggregations").
  * Reference analog: the Gibbs sweep's per-entity sufficient statistics
  * and residual accumulations (BPMF §3.1) are group-by aggregates over
  * COO triplets; RMSE/variance evaluation uses the same shapes.
  * All measures flow through exact DECIMAL (order-independent) and are
  * exported as DOUBLE — see graft.sql.Det. */
object Aggs {

  /** TPC-H Q1 shape — the flagship minimum slice (SURVEY.md §7.2). */
  def qAggPricing(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val discPrice = (dec(col("l_extendedprice")) *
      (dec(lit(1)) - dec(col("l_discount")))).cast(DecT)
    // Exactly 6 actual decimal digits (4dp disc-price x 2dp tax); the
    // scale-6 cast is lossless. The SUMS export cents (ROUND(.., 2)
    // before the double cast): past |sum|*1e6 ~ 2^53 the two engines'
    // decimal->double conversion paths round differently in the last
    // ulp (caught by the round-8 10x sweep at sum_charge ~ 2.8e10) —
    // the cents window is exact to ~9e13. Same rule as Det.dsum.
    val charge = (discPrice * (dec(lit(1)) + dec(col("l_tax"))))
      .cast(DecT)
    l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        round(sum(discPrice), 2).cast("double").as("sum_disc_price"),
        round(sum(charge), 2).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def qAggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd_part"),
           countDistinct(col("l_suppkey")).as("nd_supp"),
           count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** GROUPING SETS ((rf,ls),(rf),()) with an explicit grouping-level id. */
  def qAggGroupingSets(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.createOrReplaceTempView("gs_lineitem")
    s.sql(s"""
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                  AS BIGINT) AS gid,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      FROM gs_lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY gid, rf, ls""")
  }

  def qAggRollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
              coalesce(col("n_name"), lit("ALL")).as("nation"),
              col("n_cust"), col("sum_bal"))
      .orderBy("region", "nation")
  }

  def qAggCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
              coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
              col("n"), col("sum_price"))
      .orderBy("priority", "status")

  /** min/max/count + manual variance from exact decimal sums (engine
    * var_pop is incremental-double => order-dependent => not hash-safe). */
  def qAggStats(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val n = count(lit(1))
    val sq = sum(dec(col("l_quantity"))).cast("double")
    val sq2 = sum((dec(col("l_quantity")) * dec(col("l_quantity")))
      .cast(DecT)).cast("double")
    l.groupBy("l_returnflag")
      .agg(min(col("l_quantity")).as("min_qty"),
           max(col("l_quantity")).as("max_qty"),
           n.as("n"),
           sq.as("sum_qty"),
           (sq2 / n - (sq / n) * (sq / n)).as("var_qty"))
      .orderBy("l_returnflag")
  }

  /** Exact MODE (most frequent value) of l_quantity per returnflag,
    * with a deterministic smallest-value tie-break encoded into one
    * BIGINT argmax key (count major, negated scaled value minor) — the
    * same tie-free composite-key trick as q_agg_argmax, because engine
    * mode()/arg_max tie behavior is unspecified. Two hash aggregations,
    * both map-side combinable. */
  def qAggMode(s: SparkSession, dir: String): DataFrame = {
    val perValue = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("n"))
    // l_quantity is 1..50 in .25 steps: q*100 is an exact small int
    val key = col("n") * lit(1000000L) +
      (lit(1000000L) - (col("l_quantity") * 100).cast("long"))
    perValue.groupBy("l_returnflag")
      .agg(max_by(col("l_quantity"), key).as("mode_qty"),
           max(col("n")).as("mode_n"))
      .orderBy("l_returnflag")
  }

  /** Pearson correlation + population covariance per group, from exact
    * decimal cross-sums (the engine corr()/covar_pop() are incremental
    * double updates — order-dependent, never hash-safe): five exact
    * sums, then identical double arithmetic on both engines. Columns
    * picked so every sum stays inside the |v|*10^6 < 2^53 exact-export
    * window (quantity <= 50, discount <= 0.1). */
  def qAggCorr(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val n = count(lit(1))
    val sx = sum(dec(col("l_quantity"))).cast("double")
    val sy = sum(dec(col("l_discount"))).cast("double")
    val sxy = sum((dec(col("l_quantity")) * dec(col("l_discount")))
      .cast(DecT)).cast("double")
    val sx2 = sum((dec(col("l_quantity")) * dec(col("l_quantity")))
      .cast(DecT)).cast("double")
    val sy2 = sum((dec(col("l_discount")) * dec(col("l_discount")))
      .cast(DecT)).cast("double")
    val cov = sxy / n - (sx / n) * (sy / n)
    val corr = cov / (sqrt(sx2 / n - (sx / n) * (sx / n))
      * sqrt(sy2 / n - (sy / n) * (sy / n)))
    l.groupBy("l_returnflag")
      .agg(n.as("n"), cov.as("covar_pop_qd"), corr.as("corr_qd"))
      .orderBy("l_returnflag")
  }

  /** HLL approximate distinct — no oracle (sketches differ per engine);
    * driver records a rows-only check. */
  def qAggApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_nd_part"))
      .orderBy("l_returnflag")

  /** argmax/argmin aggregates (max_by/min_by): per returnflag, the
    * orderkey of the latest/earliest shipment. The "by" key is an
    * exact BIGINT composite (epoch-day * 1e10 + orderkey) so ties are
    * impossible and both engines agree bit-for-bit. */
  def qAggArgmax(s: SparkSession, dir: String): DataFrame = {
    val key = expr("unix_timestamp(l_shipdate) DIV 86400") *
      lit(10000000000L) + col("l_orderkey")
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(max_by(col("l_orderkey"), key).as("last_ship_order"),
           min_by(col("l_orderkey"), key).as("first_ship_order"))
      .orderBy("l_returnflag")
  }

  /** Pivot: quantity sums per returnflag, one column per linestatus —
    * relational pivot via Spark's pivot() with enumerated values; the
    * oracle states the equivalent conditional aggregation. */
  def qAggPivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(dec(col("l_quantity"))).cast("double"))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .orderBy("l_returnflag")

  /** Bitwise + boolean fold aggregates (BIT_AND/OR/XOR, BOOL_AND/OR) —
    * all map-side combinable, one partial+final hash agg. */
  def qAggBitwise(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(expr("bit_and(l_orderkey)").as("k_and"),
           expr("bit_or(l_orderkey)").as("k_or"),
           expr("bit_xor(l_orderkey)").as("k_xor"),
           expr("bool_and(l_quantity > 0)").as("all_pos"),
           expr("bool_or(l_discount > 0.05)").as("any_disc"))
      .orderBy("l_returnflag")

  /** Fixed-domain equi-width histogram of l_extendedprice: bucket id
    * from a double floor-division (IEEE-identical on both engines, no
    * data-dependent boundaries), then one hash agg — the profiling
    * pass that scales as a single shuffle of (bucket, partials). */
  def qAggHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(floor(col("l_extendedprice") / 10000.0).as("bucket"),
              col("l_extendedprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
           sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
           min(col("l_extendedprice")).as("min_price"),
           max(col("l_extendedprice")).as("max_price"))
      .orderBy("bucket")

  /** Two-phase salted aggregation through [[graft.sql.Salt.saltedAgg]]:
    * lineitem's 3 returnflag groups are the canonical few-massive-keys
    * shape — a plain groupBy funnels ~N/3 rows into each of THREE
    * reducers no matter how many executors exist. Salting spreads each
    * key over 16 buckets first (partial count/sum per (key, salt)),
    * then combines 48 tiny partials. Oracle IS the plain aggregation. */
  def qAggSkewSalted(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    graft.sql.Salt.saltedAgg(l,
        key = col("l_returnflag"),
        salt = col("l_orderkey") * 8 + col("l_linenumber"), buckets = 16,
        partials = Seq(count(lit(1)).as("pn"),
                       sum(dec(col("l_quantity"))).as("pq")),
        combine = Seq(sum(col("pn")).as("n"),
                      sum(col("pq")).cast("double").as("sum_qty")))
      .withColumnRenamed("key", "l_returnflag")
      .orderBy("l_returnflag")
  }

  /** Exact WEIGHTED median per group: smallest l_quantity whose
    * cumulative weight (extendedprice in exact cents) reaches half the
    * group total. The groups are FEW and HUGE (3 return flags x 20k
    * rows), so no raw-row window: the domain-bounded (flag, quantity)
    * HISTOGRAM (<= 150 rows) carries the weights, and the half-point
    * scan is a tiny triangular join on that histogram — the same
    * few-huge-groups discipline as q_outlier_mad. All arithmetic is
    * integer (cents; 2*cum >= total avoids any division). */
  def qAggWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val hist = Tables.lineitem(s, dir)
      // per-row explicit ROUND before every bigint cast, mirrored in
      // the oracle — Spark's cast truncates toward zero while DuckDB's
      // rounds, so agreement must not depend on quantities staying
      // integral or prices staying at 2 dp
      .groupBy(col("l_returnflag"),
               round(col("l_quantity"), 0).cast("long").as("qty"))
      .agg(sum(round(dec(col("l_extendedprice")) * 100, 0).cast("long"))
        .as("w"))
    val tot = hist.groupBy(col("l_returnflag").as("tf"))
      .agg(sum(col("w")).as("totw"))
    val cum = hist.as("a")
      .join(hist.as("b"),
            col("a.l_returnflag") === col("b.l_returnflag") &&
              col("b.qty") <= col("a.qty"))
      .groupBy(col("a.l_returnflag").as("l_returnflag"),
               col("a.qty").as("qty"))
      .agg(sum(col("b.w")).as("cumw"))
    cum.join(tot, col("l_returnflag") === col("tf"))
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("qty")).as("wmedian_qty"),
           first(col("totw")).as("total_w_cents"))
      .orderBy("l_returnflag")
  }

  /** Pre-aggregated SKETCH rollup — the 100 TB distinct-count design:
    * one DataSketches HLL sketch per partition key (order month) built
    * where the data lives, then rolled up to the global estimate by
    * MERGING the tiny sketches — no second scan, no distinct shuffle
    * of raw keys. This is the pattern behind every "persist per-day
    * sketch tables, union at query time" production metric store: the
    * monthly sketch column here is exactly what `partitionBy(ym)`
    * would persist. HLL register updates are max-merges, so the
    * estimates are insertion-order- and partitioning-invariant —
    * deterministic output without an ordering discipline (asserted in
    * SketchSpec, with accuracy vs exact countDistinct). No oracle:
    * engine sketch implementations differ by construction. */
  def qAggHllPartitioned(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(expr("year(o_orderdate) * 100 + month(o_orderdate)").as("ym"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
           count(lit(1)).as("n_orders"))
    val total = monthly
      .agg(hll_union_agg(col("sk")).as("sk"),
           sum(col("n_orders")).as("n_orders"))
      .select(lit(0L).as("ym"),
              hll_sketch_estimate(col("sk")).as("nd_cust"), col("n_orders"))
    monthly
      .select(col("ym"), hll_sketch_estimate(col("sk")).as("nd_cust"),
              col("n_orders"))
      .unionByName(total)
      .orderBy("ym")
  }

  /** The PERSISTED half of the sketch-rollup story: the monthly HLL
    * sketch table is written ONCE as a parquet artifact (binary sketch
    * column + month key + row count — exactly what a metric store
    * materializes nightly), and the query then serves per-month AND
    * merged-global distinct estimates from the tiny sketch table alone
    * — the raw orders table is never rescanned on the serve path.
    * Same build-once/serve-many ArtifactStore lifecycle as the IVF
    * index and the BPE vocab (content-keyed, atomically published).
    * SketchSpec asserts every per-month estimate equals the inline
    * [[qAggHllPartitioned]] bit-for-bit (sketch serialization
    * round-trips losslessly) and the merged global stays within 1% —
    * the union gadget's ESTIMATE is not associativity-stable, so
    * exact equality of the merged row is not a property either path
    * can promise. */
  def qAggHllPersisted(s: SparkSession, dir: String): DataFrame = {
    val key = graft.ArtifactStore.contentKey(s"$dir/orders.parquet",
      "hll-monthly-v1")
    val path = graft.ArtifactStore.cachePath("hll_monthly", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      Tables.orders(s, dir)
        .groupBy(expr("CAST(year(o_orderdate) * 100 + month(o_orderdate)" +
          " AS BIGINT)").as("ym"))
        .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
             count(lit(1)).as("n_orders"))
        .write.mode("overwrite").parquet(s"$tmp/sketches")
    }
    val monthly = s.read.parquet(s"$path/sketches")
    val total = monthly
      .agg(hll_union_agg(col("sk")).as("sk"),
           sum(col("n_orders")).as("n_orders"))
      .select(lit(0L).as("ym"),
              hll_sketch_estimate(col("sk")).as("nd_cust"), col("n_orders"))
    monthly
      .select(col("ym"), hll_sketch_estimate(col("sk")).as("nd_cust"),
              col("n_orders"))
      .unionByName(total)
      .orderBy("ym")
  }

  /** Mergeable QUANTILE rollup — the latency-percentile twin of the
    * HLL distinct-count store: one equi-width histogram sketch per
    * order month over o_totalprice (in exact cents), persisted ONCE as
    * a tiny parquet artifact, then per-month AND merged-global
    * p50/p90/p99 served from the sketch table alone — raw orders are
    * never rescanned on the serve path. Unlike HLL, count-histogram
    * merging is LOSSLESS (integer counts over shared bin edges add
    * exactly), so the merged-global estimate is bit-identical to a
    * single global histogram with the same edges — asserted in
    * SketchSpec along with the accuracy bound (any percentile estimate
    * is within one bin width of the exact order statistic, the
    * equi-width histogram's guarantee) and serve-twice determinism.
    * All arithmetic is integer (bin = (c - min) div width; estimate =
    * binLo + offset*width div count), so output is partitioning- and
    * insertion-order-invariant. No oracle: sketch estimates are not
    * cross-engine; the substitute spec carries correctness. */
  def qAggQuantilePersisted(s: SparkSession, dir: String): DataFrame = {
    val nBins = 256L
    val key = graft.ArtifactStore.contentKey(s"$dir/orders.parquet",
      "qhist-monthly-v1")
    val path = graft.ArtifactStore.cachePath("qhist_monthly", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      val cents = Tables.orders(s, dir).select(
        expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
          .as("ym"),
        expr("CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,6)) * 100, 0)" +
          " AS BIGINT)").as("c"))
      // bin edges are fixed ONCE at build from the global domain so
      // every month's histogram shares them — the mergeability
      // precondition. (A 100 TB metric store fixes edges in the table
      // spec for the same reason.)
      val bounds = cents.agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
        .head()
      val cmin = bounds.getLong(0)
      val width = (bounds.getLong(1) - cmin) / nBins + 1
      cents
        .select(col("ym"), expr(s"(c - ${cmin}L) div ${width}L").as("bin"))
        .groupBy("ym", "bin").agg(count(lit(1)).as("cnt"))
        .select(col("ym"), col("bin"), col("cnt"),
                lit(cmin).as("cmin"), lit(width).as("width"))
        .write.mode("overwrite").parquet(s"$tmp/sketch")
    }
    val sketch = s.read.parquet(s"$path/sketch")
    val global = sketch.groupBy("bin")
      .agg(sum(col("cnt")).as("cnt"), first(col("cmin")).as("cmin"),
           first(col("width")).as("width"))
      .select(lit(0L).as("ym"), col("bin"), col("cnt"), col("cmin"),
              col("width"))
    val all = sketch.select("ym", "bin", "cnt", "cmin", "width")
      .unionByName(global)
    import org.apache.spark.sql.expressions.Window
    val cum = all
      .withColumn("cum", sum(col("cnt"))
        .over(Window.partitionBy("ym").orderBy("bin")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("ym")))
    // target rank (1-based, ceil) per percentile; the hit bin is the
    // first whose cumulative count reaches it; the estimate places the
    // rank's 0-based offset uniformly inside the bin — pure longs
    cum.withColumn("pct", explode(array(lit(50L), lit(90L), lit(99L))))
      .withColumn("target", expr("(n * pct + 99L) div 100L"))
      .filter(col("cum") >= col("target") &&
              col("cum") - col("cnt") < col("target"))
      .select(col("ym"), col("pct"), col("n").as("n_orders"),
              expr("cmin + bin * width + ((target - (cum - cnt) - 1L)" +
                " * width) div cnt").as("est_cents"))
      .orderBy("ym", "pct")
  }

  /** DATA-DEPENDENT quantile store — the KLL twin of
    * [[qAggQuantilePersisted]] for when the value domain is unknown or
    * heavy-tailed. The equi-width histogram needs a global min/max
    * pass to fix bin edges and its error is one bin WIDTH — a skewed
    * distribution packs most mass into a few bins and the tail
    * percentiles blur. KLL (Karnin-Lang-Liberty FOCS'16; the Apache
    * DataSketches implementation Spark already ships) needs NO domain
    * pass, keeps O(k log n) state, and guarantees a NORMALIZED-RANK
    * error (~1.65% at k=200) independent of the distribution: the
    * served estimate is an actual data value whose exact rank is
    * within eps of the requested one.
    *
    * Same build-once/serve-many lifecycle: one sketch per order month
    * over exact cents (a few KB each), persisted content-keyed; the
    * serve path reads the ~80-row sketch table, merges for the global
    * row (`graft_kll_merge` — sketch bytes on the wire, never values),
    * and answers p50/p90/p99 without rescanning orders. At 100 TB the
    * per-day build is a map-side-combining agg whose shuffle carries
    * O(k log n) bytes per (partition, group).
    *
    * No oracle (KLL sampling is not cross-engine); the substitute spec
    * pins the rank-error bound vs exact order statistics per month AND
    * for the merged global, plus serve-twice determinism from the
    * published artifact. */
  def qAggQuantileKll(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.KllOps.register(s)
    val key = graft.ArtifactStore.contentKey(s"$dir/orders.parquet",
      "kll-monthly-k200-v2")
    val path = graft.ArtifactStore.cachePath("kll_monthly", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      Tables.orders(s, dir)
        .select(
          expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
            .as("ym"),
          expr("CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,6)) * 100, 0)" +
            " AS BIGINT)").as("c"))
        .groupBy("ym")
        .agg(expr("graft_kll_agg(c, 200)").as("sk"),
             count(lit(1)).as("n_orders"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/sketch")
      // the MERGED-GLOBAL sketch is part of the artifact: KLL
      // compaction flips coins, so merging at serve time would give a
      // (bound-respecting but) different global estimate per serve —
      // merge ONCE here and the serve path is a pure read
      s.read.parquet(s"$tmp/sketch")
        .agg(expr("graft_kll_merge(sk)").as("sk"),
             sum(col("n_orders")).as("n_orders"))
        .select(lit(0L).as("ym"), col("sk"), col("n_orders"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/global")
    }
    val monthly = s.read.parquet(s"$path/sketch")
    monthly.select(col("ym"), col("sk"), col("n_orders"))
      .unionByName(s.read.parquet(s"$path/global"))
      .withColumn("pct", explode(array(lit(50L), lit(90L), lit(99L))))
      .select(col("ym"), col("pct"), col("n_orders"),
              expr("graft_kll_quantile(sk, CAST(pct AS DOUBLE) / 100.0)")
                .as("est_cents"))
      .orderBy("ym", "pct")
  }

  /** APPROXIMATE set-operable retention — the theta-sketch face that
    * completes the sketch matrix next to [[qAggBitmapRetention]]: the
    * bitmap's intersections are exact but demand a DENSE integer key
    * domain (dictionary-encode first at 100 TB); HLL unions are
    * lossless but have no intersection operator at all. The theta
    * sketch (Dasgupta et al.; Apache DataSketches) keeps a uniform
    * hash sample below an adaptive θ, so per-month sketches of
    * ARBITRARY keys union AND intersect with bounded relative error —
    * the cohort/retention query on raw string or sparse keys where the
    * bitmap's precondition fails. Same persisted build-once lifecycle
    * and month-pair serve as the bitmap store; state is ≤ ~8·2^12
    * bytes per month regardless of row count, and estimates are
    * partitioning-invariant (the retained hash set is a pure function
    * of the key set). Below 2^12 distinct keys/month the sketch runs
    * in exact mode — SketchSpec pins the estimates against the exact
    * bitmap face (equal there, ≤5%/≤10% bounds stated for the general
    * regime) plus serve-twice determinism. No oracle (sketches are
    * not cross-engine). */
  def qAggThetaRetention(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.ThetaOps.register(s)
    val key = graft.ArtifactStore.contentKey(s"$dir/orders.parquet",
      "theta-monthly-lgk12-v1")
    val path = graft.ArtifactStore.cachePath("theta_monthly", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      Tables.orders(s, dir)
        .select(expr(
            "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
            .as("ym"),
          col("o_custkey").as("k"))
        .groupBy("ym")
        .agg(expr(s"graft_theta_agg(k, ${graft.expressions.ThetaOps.DefaultLgK})")
               .as("sk"),
             count(lit(1)).as("n_orders"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/sketch")
    }
    val bm = s.read.parquet(s"$path/sketch")
    val nxt = expr("CASE WHEN ym % 100 = 12 THEN ym + 89 ELSE ym + 1 END")
    bm.select(col("ym"), nxt.as("nym"), col("sk"))
      .join(bm.select(col("ym").as("bym"), col("sk").as("bsk")),
            col("nym") === col("bym"))
      .select(col("ym"),
        expr("graft_theta_estimate(sk)").as("n_active_est"),
        expr("graft_theta_estimate(bsk)").as("n_active_next_est"),
        expr("graft_theta_intersect_estimate(sk, bsk)").as("n_retained_est"))
      .orderBy("ym")
  }

  /** STRATIFIED exact heavy hitters — [[qAggHeavyHitters]] per group:
    * "who dominates traffic within EACH event type", the per-stratum
    * question curation asks of per-language/per-domain slices. One
    * Misra-Gries summary PER GROUP (k=192 counters per partial per
    * group — state O(k x groups) regardless of the user domain) finds
    * a provable candidate superset within each stratum (freq >
    * n_g/193 survives; the served threshold is n_g/125); pass 2
    * recounts with the candidate UNION pushed as an IN filter into
    * the scan, keeps exact per-group candidacy via a broadcast join
    * against the exploded (group, candidate) pairs, and applies the
    * true per-group threshold — so the output is exactly
    * {(g, u) : freq_g(u) * 125 > n_g}, partitioning-invariant, under
    * the plain per-group SQL oracle. Fixture note: like the global
    * face, per-group hitters exist at sf0.001/sf0.01 and correctly
    * vanish at sf0.1+ (uniform users can't hold 1/125 of a stratum). */
  def qAggHeavyHittersGrouped(s: SparkSession, dir: String): DataFrame =
    heavyHittersGroupedOn(s, Tables.events(s, dir)
      .select(col("event_type").as("grp"), col("user_id")))

  /** Candidate-union size bound for [[heavyHittersGroupedOn]]'s pushed
    * IN filter. The union holds <= 192 x |groups| ids; the 5-group
    * events table stays tiny, but a high-cardinality group column
    * (per-domain, per-language strata) would push a 10^5-literal IN
    * into the scan — a plan Catalyst folds slowly and parquet can't
    * row-group-prune with anyway. Above the bound the recount keeps
    * the same "scan only candidate rows" shape via a broadcast
    * LEFT SEMI join (hash lookup per row, no literal list). */
  private[queries] val MaxPushedHhCandidates = 4096

  /** The grouped heavy-hitters engine over any (grp, user_id) frame:
    * per-group MG candidates, then an exact recount restricted to the
    * candidate union — pushed as a literal IN when the union is under
    * [[MaxPushedHhCandidates]], else a broadcast semi-join against the
    * distinct candidates (same rows either way; AggsSpec drives a
    * synthetic high-cardinality group column through the fallback).
    * The union's size is probed with a limit(bound+1) collect, so the
    * driver never holds more than bound+1 ids even when the true
    * union is huge. */
  private[queries] def heavyHittersGroupedOn(s: SparkSession, ev: DataFrame,
      maxPushedIn: Int = MaxPushedHhCandidates): DataFrame = {
    graft.expressions.MisraGries.register(s)
    // 2 consumers (candidate pairs + group totals): materialize once
    val pass1 = ev.groupBy("grp")
      .agg(expr("graft_misra_gries(user_id, 192)").as("cand"),
           count(lit(1)).as("n"))
      .localCheckpoint(true)
    val candPairs = pass1.select(col("grp"), explode(col("cand")).as("user_id"))
    val candUnion = candPairs.select("user_id").distinct()
    // <= bound rows back means the limit returned the WHOLE union
    val probe = candUnion.limit(maxPushedIn + 1).collect().map(_.getLong(0))
    val hits =
      if (probe.length <= maxPushedIn)
        ev.filter(col("user_id").isInCollection(probe)) // pushed to the scan
      else
        ev.join(broadcast(candUnion), Seq("user_id"), "left_semi")
    hits
      .join(broadcast(candPairs), Seq("grp", "user_id"))
      .groupBy("grp", "user_id")
      .agg(count(lit(1)).as("n_events"))
      .join(broadcast(pass1.select(col("grp"), col("n"))), Seq("grp"))
      .filter(col("n_events") * 125L > col("n"))
      .select(col("grp"), col("user_id"), col("n_events"))
      .orderBy("grp", "user_id")
  }

  /** Count-Min POINT-LOOKUP store — the frequency complement of the
    * Misra-Gries candidate pass: MG answers "who might be frequent"
    * with ≤k survivors; the CMS (Cormode-Muthukrishnan; Spark's own
    * spark-sketch via SQL `count_min_sketch`) answers "how often did
    * THIS key occur" for ANY key from a depth×width counter grid that
    * never grows with the key domain. Built per DAY and persisted
    * (content-keyed), then served by merging the daily sketches —
    * counter-wise addition with the same seeded hashes, so the merged
    * sketch is BIT-IDENTICAL to one sketch built over all events
    * (SketchSpec pins byte equality) — and probing the MG candidate
    * set against it. Estimates NEVER undercount; overcount ≤ eps·N
    * w.h.p. At 100 TB: ~28 KB of state per day at eps=1e-3, lookups
    * without rescanning events, any date range served by merging that
    * range's sketches. No oracle (sketch); the never-undercount /
    * bounded-overcount / merge-parity spec carries correctness. */
  def qAggCmsLookup(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.CmsOps.register(s)
    graft.expressions.MisraGries.register(s)
    val key = graft.ArtifactStore.contentKey(s"$dir/events.parquet",
      "cms-daily-eps1e3-c99-seed7-v2")
    val path = graft.ArtifactStore.cachePath("cms_daily", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      Tables.events(s, dir)
        .select(expr(
            "CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT)")
            .as("ymd"),
          col("user_id"))
        .groupBy("ymd")
        .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 7)").as("sk"),
             count(lit(1)).as("n"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/sketch")
      // the MG candidate list is a pure function of the same corpus
      // state — persist it WITH the sketches so the serve path never
      // rescans raw events (the whole point of the store)
      Tables.events(s, dir)
        .agg(expr("graft_misra_gries(user_id, 32)").as("cand"))
        .select(explode(col("cand")).as("user_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/cand")
    }
    val daily = s.read.parquet(s"$path/sketch")
    val merged = daily.agg(expr("graft_cms_merge(sk)").as("sk"),
                           sum(col("n")).as("n_total"))
    s.read.parquet(s"$path/cand").crossJoin(broadcast(merged))
      .select(col("user_id"),
              expr("graft_cms_estimate(sk, user_id)").as("est_freq"),
              col("n_total"))
      .orderBy("user_id")
  }

  /** EXACT heavy hitters by the two-pass bounded-state algorithm:
    * pass 1 is a [[graft.expressions.MisraGries]] summary (k=192
    * counters per partial, merged with the bound-preserving offset
    * subtraction), whose survivors are PROVABLY a superset of every
    * key with frequency > n/193; pass 2 recounts only those <=192
    * candidates — the IN-filter pushes to the parquet scan — and
    * applies the true threshold count*125 > n. Output is therefore
    * exactly {user_id : freq > n/125}, independent of partitioning,
    * which is what keeps a sketch-shaped plan under the DuckDB oracle.
    *
    * 100 TB story: `groupBy(user_id).count` shuffles one record per
    * distinct user — the domain is the problem at scale. Here the
    * shuffle carries <=k counters per map partial (a few KB total),
    * the candidate list is a driver-side constant (same tiny-action
    * shape as the quantile store's bin edges), and the recount scans
    * with a pushed 192-key IN filter and aggregates a 192-key domain.
    * State is O(k) regardless of distinct-key count.
    *
    * Fixture note: the synthetic corpus spreads events nearly evenly
    * over its users, so the 1/125-of-traffic threshold yields 9 users
    * at sf0.01 (the oracle-gate scale) and — correctly — an empty set
    * at sf0.1/10x, where no user holds 1/125 of a 10x-larger stream.
    * The semantics (fraction-of-total, the standard HH definition) are
    * what a zipf-distributed production stream needs; both engines
    * agree at every scale either way. */
  def qAggHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.MisraGries.register(s)
    val ev = Tables.events(s, dir).select(col("user_id"))
    val pass1 = ev
      .agg(expr("graft_misra_gries(user_id, 192)").as("cand"),
           count(lit(1)).as("n")).head()
    val cand = pass1.getSeq[Long](0)
    val n = pass1.getLong(1)
    ev.filter(col("user_id").isInCollection(cand))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") * 125L > lit(n))
      .orderBy("user_id")
  }

  /** Mergeable HEAVY-HITTER rollup — the frequency third of the
    * sketch-store family (HLL = distinct counts, histogram =
    * quantiles, Misra-Gries = frequencies): one k=192 MG candidate
    * summary per event DAY (the corpus spans 30 days) persisted once
    * as a tiny parquet artifact, then global heavy hitters served
    * from the sketch table + one candidate-gated recount. The serve
    * is EXACT and the oracle plain SQL because the union of daily
    * survivor lists is a lossless candidate set for the global 1/125
    * threshold: a key absent from EVERY daily sketch has per-day
    * frequency <= n_d/193 (the MG deficit bound), so its total is
    * <= N/193 < N/125 — it cannot be a global heavy hitter (Agarwal
    * et al. PODS'12 mergeable-summaries argument, instantiated as
    * partitioned sketches instead of a combine tree). Output is the
    * TIMELINE of each global heavy hitter (exact per-day counts +
    * total), the drill-down the one-pass [[qAggHeavyHitters]] face
    * doesn't give.
    *
    * 100 TB story: this is the INCREMENTAL maintenance shape — a new
    * day appends ONE <=192-entry sketch row (scanning only that
    * day's partition); serving re-merges survivor lists (days x
    * 192 longs, driver-trivial) and recounts with a pushed IN filter.
    * The one-pass face rescans all history per query; the rollup
    * never rescans closed days to build. Fixture note: same as
    * [[qAggHeavyHitters]] — ~uniform synthetic traffic yields 9
    * heavy users at sf0.01 and (correctly) none at sf0.1/10x; both
    * engines agree at every scale. */
  def qAggHeavyHittersRollup(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.MisraGries.register(s)
    val key = graft.ArtifactStore.contentKey(s"$dir/events.parquet",
      "mg-daily-k192-v1")
    val path = graft.ArtifactStore.cachePath("mg_daily", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      Tables.events(s, dir)
        .select(expr(
            "CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT)")
            .as("ymd"),
          col("user_id"))
        .groupBy("ymd")
        .agg(expr("graft_misra_gries(user_id, 192)").as("cand"),
             count(lit(1)).as("n"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/sketch")
    }
    val row = s.read.parquet(s"$path/sketch")
      .agg(expr("array_distinct(flatten(collect_list(cand)))").as("cs"),
           sum(col("n")).as("nt")).head()
    val cand = row.getSeq[Long](0)
    val nTot = row.getLong(1)
    // ONE pushed-IN scan of events feeds both the threshold test and
    // the timeline: per-(candidate, day) counts roll up to per-
    // candidate totals in a second tiny agg (<=192 users x 30 days
    // rows), so serving never reads the fact table twice
    val byDay = Tables.events(s, dir)
      .filter(col("user_id").isInCollection(cand))
      .select(col("user_id"),
        expr("CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT)")
          .as("ymd"))
      .groupBy("user_id", "ymd").agg(count(lit(1)).as("n_day"))
      // tiny (<=192 users x 30 days) but feeds two consumers —
      // materialize or the pushed-IN fact scan runs twice anyway
      .localCheckpoint(true)
    val hh = byDay.groupBy("user_id").agg(sum(col("n_day")).as("n_total"))
      .filter(col("n_total") * 125L > lit(nTot))
    byDay.join(hh.withColumnRenamed("user_id", "hid"),
        col("user_id") === col("hid"))
      .select(col("user_id"), col("ymd"), col("n_day"), col("n_total"))
      .orderBy("user_id", "ymd")
  }

  /** Month-over-month customer RETENTION from exact bitmap sketches —
    * the intersection query the HLL store cannot answer: one
    * fixed-domain bitmap per order month (bit = custkey, domain =
    * the dense customer key range read off the customer table), then
    * for every consecutive month pair the active counts AND the
    * exact retained count via bitwise AND
    * ([[graft.expressions.BitmapOps]] — the Druid/ClickHouse
    * groupBitmap pattern). HLL unions are lossless but HLL has no
    * intersection; inclusion-exclusion compounds error per pair.
    * Bitmaps keep the whole cohort matrix exact.
    *
    * 100 TB story: a month's state is domain/8 bytes REGARDLESS of
    * row count (12.5 MB at 100M customers); merge = bitwise OR, so
    * partials combine map-side and the shuffle carries one bitmap
    * per partition per month — never a row per distinct key. The
    * month-pair join runs over the ~80-row post-agg sketch table.
    * Keys outside the declared domain THROW (visible failure, not a
    * dropped bit); non-dense key spaces dictionary-encode first —
    * here custkeys are already dense, and the base/domain pre-read
    * is a two-scalar metadata pass on the dimension table. */
  /** (base, width) of the dense custkey domain, guarded: a key range
    * wider than Int.MaxValue must fail loudly here, not wrap in .toInt
    * and then surface as a misleading "key outside domain" error. */
  private def custkeyDomain(s: SparkSession, dir: String): (Long, Int) = {
    val r = Tables.customer(s, dir)
      .agg(min(col("c_custkey")), max(col("c_custkey"))).head()
    val base = r.getLong(0)
    val width = r.getLong(1) - base + 1L
    require(width >= 1L && width <= Int.MaxValue.toLong,
      s"bitmap retention: custkey range width $width exceeds the bitmap " +
        "domain limit (Int.MaxValue) — dictionary-encode keys first")
    (base, width.toInt)
  }

  def qAggBitmapRetention(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.BitmapOps.register(s)
    val (base, domain) = custkeyDomain(s, dir)
    val bm = Tables.orders(s, dir)
      .select(expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
                .as("ym"),
              (col("o_custkey") - base).as("k"))
      .groupBy("ym")
      .agg(expr(s"graft_bitmap_agg(k, $domain)").as("bmp"))
      // the ~80-row sketch table feeds BOTH sides of the month-pair
      // self-join — materialize it once or the orders scan+agg runs
      // twice (localCheckpoint: ContextCleaner-reclaimed, same
      // discipline as the graph loops)
      .localCheckpoint(true)
    retentionFromSketch(bm)
  }

  private val bitmapRetentionSql: String =
    """WITH cm AS MATERIALIZED (
      |  SELECT DISTINCT
      |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
      |    o_custkey AS k
      |  FROM orders),
      |act AS MATERIALIZED (SELECT ym, COUNT(*) AS n FROM cm GROUP BY ym),
      |ret AS (
      |  SELECT a.ym, COUNT(*) AS n_retained
      |  FROM cm a JOIN cm b ON b.k = a.k
      |   AND b.ym = CASE WHEN a.ym % 100 = 12 THEN a.ym + 89 ELSE a.ym + 1 END
      |  GROUP BY a.ym)
      |SELECT a.ym, a.n AS n_active, b.n AS n_active_next,
      |  COALESCE(r.n_retained, 0) AS n_retained
      |FROM act a
      |JOIN act b
      |  ON b.ym = CASE WHEN a.ym % 100 = 12 THEN a.ym + 89 ELSE a.ym + 1 END
      |LEFT JOIN ret r ON r.ym = a.ym
      |ORDER BY a.ym""".stripMargin

  /** The month-pair serve over a (ym, bmp) bitmap sketch table —
    * shared verbatim by the inline and persisted faces so the
    * "bit-identical twins" contract SketchSpec pins can never drift
    * in one place only. */
  private def retentionFromSketch(bm: DataFrame): DataFrame = {
    val nxt = expr("CASE WHEN ym % 100 = 12 THEN ym + 89 ELSE ym + 1 END")
    bm.select(col("ym"), nxt.as("nym"), col("bmp"))
      .join(bm.select(col("ym").as("bym"), col("bmp").as("bbmp")),
            col("nym") === col("bym"))
      .select(col("ym"),
        expr("graft_bitmap_card(bmp)").as("n_active"),
        expr("graft_bitmap_card(bbmp)").as("n_active_next"),
        expr("graft_bitmap_and_card(bmp, bbmp)").as("n_retained"))
      .orderBy("ym")
  }

  /** The PERSISTED half of the bitmap store — the exact-sketch twin
    * of [[qAggHllPersisted]]: the monthly bitmap table is written ONCE
    * as a content-keyed parquet artifact (binary bitmap column,
    * ~80 rows × domain/8 bytes) and the whole retention matrix is then
    * served from the tiny sketch table alone — orders is never
    * rescanned on the serve path, and because the sketch is EXACT the
    * served numbers are bit-identical to the inline face's
    * ([[qAggBitmapRetention]]; same oracle SQL, SketchSpec pins
    * byte-level artifact↔inline parity and serve-twice determinism).
    * The custkey domain rides in the artifact key, so a dimension
    * change invalidates the sketch instead of silently truncating. */
  def qAggBitmapPersisted(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.BitmapOps.register(s)
    val (base, domain) = custkeyDomain(s, dir)
    val key = graft.ArtifactStore.contentKey(s"$dir/orders.parquet",
      s"bitmap-monthly-d$domain-v1")
    val path = graft.ArtifactStore.cachePath("bitmap_monthly", key)
    graft.ArtifactStore.ensure(path) { tmp =>
      Tables.orders(s, dir)
        .select(expr(
            "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
            .as("ym"),
          (col("o_custkey") - base).as("k"))
        .groupBy("ym")
        .agg(expr(s"graft_bitmap_agg(k, $domain)").as("bmp"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/sketch")
    }
    retentionFromSketch(s.read.parquet(s"$path/sketch"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_bitmap_persisted" -> (qAggBitmapPersisted _),
    "q_agg_bitmap_retention" -> (qAggBitmapRetention _),
    "q_agg_heavy_hitters_rollup" -> (qAggHeavyHittersRollup _),
    "q_agg_heavy_hitters" -> (qAggHeavyHitters _),
    "q_agg_quantile_persisted" -> (qAggQuantilePersisted _),
    "q_agg_quantile_kll" -> (qAggQuantileKll _),
    "q_agg_theta_retention" -> (qAggThetaRetention _),
    "q_agg_cms_lookup" -> (qAggCmsLookup _),
    "q_agg_heavy_hitters_grouped" -> (qAggHeavyHittersGrouped _),
    "q_agg_hll_persisted" -> (qAggHllPersisted _),
    "q_agg_hll_partitioned" -> (qAggHllPartitioned _),
    "q_agg_weighted_median" -> (qAggWeightedMedian _),
    "q_agg_skew_salted" -> (qAggSkewSalted _),
    "q_agg_bitwise" -> (qAggBitwise _),
    "q_agg_histogram" -> (qAggHistogram _),
    "q_agg_argmax" -> (qAggArgmax _),
    "q_agg_corr" -> (qAggCorr _),
    "q_agg_mode" -> (qAggMode _),
    "q_agg_pivot" -> (qAggPivot _),
    "q_agg_pricing" -> (qAggPricing _),
    "q_agg_distinct" -> (qAggDistinct _),
    "q_agg_groupingsets" -> (qAggGroupingSets _),
    "q_agg_rollup" -> (qAggRollup _),
    "q_agg_cube" -> (qAggCube _),
    "q_agg_stats" -> (qAggStats _),
    "q_agg_approx_distinct" -> (qAggApproxDistinct _),
  )

  private val discPriceSql =
    s"CAST(${D.dec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,6)) - ${D.dec("l_discount")}) AS DECIMAL(18,6))"
  private val chargeSql =
    s"CAST($discPriceSql * (CAST(1 AS DECIMAL(18,6)) + ${D.dec("l_tax")}) AS DECIMAL(18,6))"

  val oracle: Map[String, String] = Map(
    "q_agg_heavy_hitters" ->
      """SELECT user_id, COUNT(*) AS n_events
        |FROM events
        |GROUP BY user_id
        |HAVING COUNT(*) * 125 > (SELECT COUNT(*) FROM events)
        |ORDER BY user_id""".stripMargin,
    // the per-stratum MG candidate union is lossless for each group's
    // threshold (per-group deficit bound), so the oracle is exact SQL
    "q_agg_heavy_hitters_grouped" ->
      """WITH g AS (SELECT event_type AS grp, user_id FROM events),
        |t AS MATERIALIZED (SELECT grp, COUNT(*) AS n FROM g GROUP BY grp)
        |SELECT g.grp, g.user_id, COUNT(*) AS n_events
        |FROM g JOIN t ON t.grp = g.grp
        |GROUP BY g.grp, g.user_id, t.n
        |HAVING COUNT(*) * 125 > t.n
        |ORDER BY g.grp, g.user_id""".stripMargin,
    // bitmap AND is exact, so ONE oracle body — the plain distinct
    // self-join the sketch replaces — serves both engine lifecycles
    // (inline and artifact), mirroring the shared retentionFromSketch
    "q_agg_bitmap_persisted" -> bitmapRetentionSql,
    "q_agg_bitmap_retention" -> bitmapRetentionSql,
    // the daily-sketch candidate union is lossless for the global
    // threshold (MG deficit bound), so the oracle is exact SQL
    "q_agg_heavy_hitters_rollup" ->
      """WITH hh AS (
        |  SELECT user_id, COUNT(*) AS n_total
        |  FROM events
        |  GROUP BY user_id
        |  HAVING COUNT(*) * 125 > (SELECT COUNT(*) FROM events))
        |SELECT e.user_id,
        |  CAST(year(e.ts) * 10000 + month(e.ts) * 100 + day(e.ts) AS BIGINT)
        |    AS ymd,
        |  COUNT(*) AS n_day, MAX(h.n_total) AS n_total
        |FROM events e JOIN hh h ON e.user_id = h.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_agg_weighted_median" ->
      """WITH hist AS (
        |  SELECT l_returnflag, CAST(ROUND(l_quantity, 0) AS BIGINT) AS qty,
        |    SUM(CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,6)) * 100, 0)
        |      AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |tot AS (
        |  SELECT l_returnflag AS tf, CAST(SUM(w) AS BIGINT) AS totw
        |  FROM hist GROUP BY 1),
        |cum AS (
        |  SELECT a.l_returnflag, a.qty, CAST(SUM(b.w) AS BIGINT) AS cumw
        |  FROM hist a JOIN hist b
        |    ON a.l_returnflag = b.l_returnflag AND b.qty <= a.qty
        |  GROUP BY 1, 2)
        |SELECT c.l_returnflag, MIN(c.qty) AS wmedian_qty,
        |  MIN(t.totw) AS total_w_cents
        |FROM cum c JOIN tot t ON c.l_returnflag = t.tf
        |WHERE c.cumw * 2 >= t.totw
        |GROUP BY c.l_returnflag
        |ORDER BY c.l_returnflag""".stripMargin,
    "q_agg_skew_salted" ->
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  ${D.dsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_bitwise" ->
      """SELECT l_returnflag,
        |  BIT_AND(l_orderkey) AS k_and,
        |  BIT_OR(l_orderkey) AS k_or,
        |  BIT_XOR(l_orderkey) AS k_xor,
        |  BOOL_AND(l_quantity > 0) AS all_pos,
        |  BOOL_OR(l_discount > 0.05) AS any_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_histogram" ->
      s"""SELECT CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT) AS bucket,
         |  COUNT(*) AS n,
         |  CAST(SUM(${D.dec("l_extendedprice")}) AS DOUBLE) AS sum_price,
         |  MIN(l_extendedprice) AS min_price,
         |  MAX(l_extendedprice) AS max_price
         |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_agg_argmax" ->
      """SELECT l_returnflag,
        |  ARG_MAX(l_orderkey, CAST(FLOOR(EPOCH(l_shipdate)) AS BIGINT) // 86400 * 10000000000 + l_orderkey) AS last_ship_order,
        |  ARG_MIN(l_orderkey, CAST(FLOOR(EPOCH(l_shipdate)) AS BIGINT) // 86400 * 10000000000 + l_orderkey) AS first_ship_order
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_pivot" ->
      s"""SELECT l_returnflag,
         |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN ${D.dec("l_quantity")} END) AS DOUBLE) AS qty_f,
         |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN ${D.dec("l_quantity")} END) AS DOUBLE) AS qty_o
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${D.dsum("l_quantity")} AS sum_qty,
         |  ${D.dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(ROUND(SUM($discPriceSql), 2) AS DOUBLE) AS sum_disc_price,
         |  CAST(ROUND(SUM($chargeSql), 2) AS DOUBLE) AS sum_charge,
         |  ${D.davg("l_quantity")} AS avg_qty,
         |  ${D.davg("l_extendedprice")} AS avg_price,
         |  ${D.davg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_part,
        |  COUNT(DISTINCT l_suppkey) AS nd_supp,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_mode" ->
      """WITH pv AS (
        |  SELECT l_returnflag, l_quantity, COUNT(*) AS n
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |SELECT l_returnflag,
        |  ARG_MAX(l_quantity, n * 1000000 + (1000000 - CAST(l_quantity * 100 AS BIGINT))) AS mode_qty,
        |  CAST(MAX(n) AS BIGINT) AS mode_n
        |FROM pv GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_agg_corr" -> {
      val sx = s"CAST(SUM(${D.dec("l_quantity")}) AS DOUBLE)"
      val sy = s"CAST(SUM(${D.dec("l_discount")}) AS DOUBLE)"
      val sxy = s"CAST(SUM(CAST(${D.dec("l_quantity")} * ${D.dec("l_discount")} AS DECIMAL(18,6))) AS DOUBLE)"
      val sx2 = s"CAST(SUM(CAST(${D.dec("l_quantity")} * ${D.dec("l_quantity")} AS DECIMAL(18,6))) AS DOUBLE)"
      val sy2 = s"CAST(SUM(CAST(${D.dec("l_discount")} * ${D.dec("l_discount")} AS DECIMAL(18,6))) AS DOUBLE)"
      val n = "COUNT(*)"
      val cov = s"$sxy / $n - ($sx / $n) * ($sy / $n)"
      val corr = s"($cov) / (SQRT($sx2 / $n - ($sx / $n) * ($sx / $n)) * SQRT($sy2 / $n - ($sy / $n) * ($sy / $n)))"
      s"""SELECT l_returnflag, COUNT(*) AS n,
         |  $cov AS covar_pop_qd,
         |  $corr AS corr_qd
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },
    "q_agg_groupingsets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, rf, ls""".stripMargin,
    "q_agg_rollup" ->
      s"""SELECT COALESCE(r_name, 'ALL') AS region,
         |       COALESCE(n_name, 'ALL') AS nation,
         |       COUNT(*) AS n_cust,
         |       ${D.dsum("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY region, nation""".stripMargin,
    "q_agg_cube" ->
      s"""SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
         |       COALESCE(o_orderstatus, 'ALL') AS status,
         |       COUNT(*) AS n,
         |       ${D.dsum("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY CUBE(o_orderpriority, o_orderstatus)
         |ORDER BY priority, status""".stripMargin,
    "q_agg_stats" ->
      s"""SELECT l_returnflag,
         |  MIN(l_quantity) AS min_qty,
         |  MAX(l_quantity) AS max_qty,
         |  COUNT(*) AS n,
         |  ${D.dsum("l_quantity")} AS sum_qty,
         |  CAST(SUM(CAST(${D.dec("l_quantity")} * ${D.dec("l_quantity")} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         |    - (${D.dsum("l_quantity")} / COUNT(*)) * (${D.dsum("l_quantity")} / COUNT(*)) AS var_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
