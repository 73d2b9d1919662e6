package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Substitute correctness for the sketch queries (no cross-engine
  * oracle exists by construction — sketch implementations differ):
  * accuracy against the exact answer, merge ≡ single-sketch identity,
  * and partitioning invariance. */
class SketchSpec extends SparkSpec {

  test("hll monthly estimates stay within 5% of exact distinct counts") {
    val dir = sf("sf0.01")
    val got = Aggs.qAggHllPartitioned(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, dir)
      .groupBy(expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
        .as("ym"))
      .agg(countDistinct(col("o_custkey")).as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactTotal = Tables.orders(spark, dir)
      .agg(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(got.keySet === exact.keySet + 0L)
    (exact + (0L -> exactTotal)).foreach { case (ym, nd) =>
      val est = got(ym)
      assert(math.abs(est - nd) <= math.max(1L, (nd * 0.05).toLong),
        s"ym=$ym estimate $est vs exact $nd drifts past 5%")
    }
  }

  test("merged monthly sketches track the single big sketch within 2%") {
    // NOT exact equality: a small single-pass sketch stays in
    // DataSketches' coupon (list/set) mode, which is exact, while
    // hll_union_agg promotes partials to dense HLL whose estimator
    // carries the usual relative error — so merged and single-pass can
    // differ by a few counts even over the identical input set. The
    // production claim is that the rollup stays inside sketch accuracy,
    // not bit-equality across representations.
    val dir = sf("sf0.01")
    val merged = Tables.orders(spark, dir)
      .groupBy(expr("year(o_orderdate) * 100 + month(o_orderdate)").as("ym"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("nd"))
      .head().getLong(0)
    val single = Tables.orders(spark, dir)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("nd"))
      .head().getLong(0)
    assert(math.abs(merged - single) <= math.max(1L, (single * 0.02).toLong),
      s"merged rollup $merged drifts past 2% of single-pass $single")
  }

  test("persisted sketch table serves the same estimates as the inline rollup") {
    val dir = sf("sf0.01")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val inline = rows(Aggs.qAggHllPartitioned(spark, dir))
    val served = rows(Aggs.qAggHllPersisted(spark, dir))
    assert(served.keySet === inline.keySet)
    // per-month sketches round-trip through parquet losslessly, so
    // every month's estimate must match the inline rollup bit-for-bit
    (inline - 0L).foreach { case (ym, v) =>
      assert(served(ym) === v, s"month $ym diverged after persistence")
    }
    // the merged-total ESTIMATE is not associativity-stable (the union
    // gadget's estimator state depends on how partial unions nest, and
    // the persisted path unions compact serialized sketches while the
    // inline path unions agg-buffer sketches) — hold it to 1%
    val (ni, _) = inline(0L)
    val (np, _) = served(0L)
    assert(math.abs(ni - np) <= math.max(1L, (ni * 0.01).toLong),
      s"merged estimate drifted: inline $ni vs persisted $np")
    // serving twice hits the published artifact deterministically
    assert(rows(Aggs.qAggHllPersisted(spark, dir)) === served)
  }

  test("quantile sketch estimates land within one bin width of exact order statistics") {
    val dir = sf("sf0.01")
    val got = Aggs.qAggQuantilePersisted(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // exact cents per month, plus the bin width the build fixed
    val cents = Tables.orders(spark, dir).select(
        expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)"),
        expr("CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,6)) * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val width = (cents.map(_._2).max - cents.map(_._2).min) / 256 + 1
    def exact(vs: Array[Long], pct: Long): Long = {
      val sorted = vs.sorted
      sorted(((vs.length * pct + 99) / 100 - 1).toInt)
    }
    val byYm = cents.groupBy(_._1).view.mapValues(_.map(_._2)).toMap +
      (0L -> cents.map(_._2))
    assert(got.keySet.map(_._1) === byYm.keySet)
    got.foreach { case ((ym, pct), est) =>
      val ex = exact(byYm(ym), pct)
      assert(math.abs(est - ex) <= width,
        s"ym=$ym p$pct estimate $est vs exact $ex exceeds bin width $width")
    }
  }

  test("quantile merge is lossless: merged-global equals a direct global histogram") {
    // unlike HLL, integer count histograms over SHARED bin edges merge
    // exactly — the global row must be BIT-IDENTICAL to an estimate
    // from one histogram built over all months at once
    val dir = sf("sf0.01")
    val got = Aggs.qAggQuantilePersisted(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    val cents = Tables.orders(spark, dir).select(
        expr("CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,6)) * 100, 0) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val cmin = cents.min
    val width = (cents.max - cmin) / 256 + 1
    val hist = cents.groupBy(c => (c - cmin) / width).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val n = cents.length.toLong
    Seq(50L, 90L, 99L).foreach { pct =>
      val target = (n * pct + 99) / 100
      var cum = 0L
      val (bin, cnt) = hist.find { case (_, c) => cum += c; cum >= target }.get
      val est = cmin + bin * width + ((target - (cum - cnt) - 1) * width) / cnt
      assert(got(pct) === est,
        s"merged p$pct ${got(pct)} != direct global histogram $est")
    }
    // serving twice hits the published artifact deterministically
    val again = Aggs.qAggQuantilePersisted(spark, dir).collect()
      .filter(_.getLong(0) == 0L).map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(again === got)
  }

  test("kll quantile estimates respect the normalized-rank error bound per month and merged") {
    val dir = sf("sf0.01")
    val got = Aggs.qAggQuantileKll(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val cents = Tables.orders(spark, dir).select(
        expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)"),
        expr("CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,6)) * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byYm = cents.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap +
      (0L -> cents.map(_._2).sorted)
    assert(got.keySet.map(_._1) === byYm.keySet,
      "kll store must serve every month plus the merged-global row 0")
    // KLL k=200 single-sided normalized rank error is ~1.65% at 99%
    // confidence; the merged row stacks two levels of compaction, so
    // hold every estimate to a generous 2x bound — the point is the
    // DISTRIBUTION-INDEPENDENT rank guarantee, not the constant
    val eps = 2 * org.apache.datasketches.kll.KllSketch
      .getNormalizedRankError(200, false)
    got.foreach { case ((ym, pct), est) =>
      val sorted = byYm(ym)
      val n = sorted.length
      // exact normalized rank of the served value (INCLUSIVE: the
      // fraction of values <= est)
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - pct / 100.0) <= eps + 1.0 / n,
        s"ym=$ym p$pct: served value $est has exact rank $rank, " +
          s"off by more than eps=$eps")
      // the estimate must be an actual data value, not an interpolation
      assert(java.util.Arrays.binarySearch(sorted, est) >= 0,
        s"ym=$ym p$pct: $est is not a value from the data")
    }
    // serve-twice determinism: the second call reads the same artifact
    val again = Aggs.qAggQuantileKll(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(again === got, "kll store served differently twice")
  }

  test("theta retention tracks the exact bitmap face and serves deterministically") {
    val dir = sf("sf0.01")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    val est = rows(Aggs.qAggThetaRetention(spark, dir)).toMap
    val exact = rows(Aggs.qAggBitmapRetention(spark, dir)).toMap
    assert(est.keySet === exact.keySet,
      "theta store must serve the same month pairs as the exact face")
    assert(exact.values.exists(_._3 > 0L), "no retention anywhere — vacuous")
    // at sf0.01 every month holds < 2^12 distinct custkeys, so the
    // sketches run in exact mode — but state the bounds the sketch
    // GUARANTEES (5% marginals, 10% intersection) so the assertion
    // survives scales that push into estimation mode
    def ok(e: Long, x: Long, tol: Double): Boolean =
      math.abs(e - x) <= math.max(1L, (x * tol).toLong)
    exact.foreach { case (ym, (a, b, rtd)) =>
      val (ea, eb, er) = est(ym)
      assert(ok(ea, a, 0.05) && ok(eb, b, 0.05),
        s"ym=$ym actives ($ea, $eb) drift past 5% of exact ($a, $b)")
      assert(ok(er, rtd, 0.10),
        s"ym=$ym retained estimate $er drifts past 10% of exact $rtd")
    }
    // serve-twice determinism from the published artifact
    assert(rows(Aggs.qAggThetaRetention(spark, dir)).toMap === est)
  }

  test("cms lookup never undercounts, overcount bounded, daily merge == one global sketch") {
    val dir = sf("sf0.01")
    val got = Aggs.qAggCmsLookup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "MG produced no probe candidates — vacuous")
    val exact = Tables.events(spark, dir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (u, est, n) =>
      val ex = exact.getOrElse(u, 0L)
      assert(est >= ex, s"user $u estimate $est UNDER exact $ex — impossible for CMS")
      assert(est <= ex + math.max(1L, (2 * 0.001 * n).toLong),
        s"user $u estimate $est overcounts exact $ex past 2*eps*N")
    }
    // merge parity is EXACT: counter grids add with the same seeded
    // hashes, so the merged-daily sketch is byte-identical to one
    // sketch built over all events in a single pass
    graft.expressions.CmsOps.register(spark)
    val mergedBytes = spark.read.parquet(
        graft.ArtifactStore.cachePath("cms_daily",
          graft.ArtifactStore.contentKey(s"$dir/events.parquet",
            "cms-daily-eps1e3-c99-seed7-v2")) + "/sketch")
      .agg(expr("graft_cms_merge(sk)")).head().getAs[Array[Byte]](0)
    val globalBytes = Tables.events(spark, dir)
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 7)"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(mergedBytes, globalBytes),
      "merged daily sketches differ from the single global sketch")
    // serve-twice determinism
    assert(Aggs.qAggCmsLookup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq === got.toSeq)
  }

  test("sketch output is invariant to input partitioning") {
    val dir = sf("sf0.001")
    val a = Aggs.qAggHllPartitioned(spark, dir).collect().map(_.toString).toSeq
    val b = {
      val o = Tables.orders(spark, dir).repartition(13)
      val monthly = o
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
        .orderBy("ym").collect().map(_.toString).toSeq
    }
    assert(a === b)
  }

  test("heavy-hitter rollup serves the exact global timeline from daily sketches") {
    val dir = sf("sf0.01")
    val got = Aggs.qAggHeavyHittersRollup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "no heavy hitters at sf0.01 — spec is vacuous")
    val ev = Tables.events(spark, dir).select(col("user_id"),
      expr("CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT)")
        .as("ymd"))
    val nTot = ev.count()
    val hh = ev.groupBy("user_id").agg(count(lit(1)).as("n_total"))
      .filter(col("n_total") * 125L > lit(nTot))
    val want = ev.join(hh.withColumnRenamed("user_id", "hid"),
        col("user_id") === col("hid"))
      .groupBy("user_id", "ymd")
      .agg(count(lit(1)).as("n_day"), max(col("n_total")).as("n_total"))
      .orderBy("user_id", "ymd").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
  }

  test("bitmap sketch: retention non-vacuous, partitioning-invariant, out-of-domain throws") {
    graft.expressions.BitmapOps.register(spark)
    val dir = sf("sf0.01")
    val got = Aggs.qAggBitmapRetention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length > 10, s"too few month pairs: ${got.length}")
    // non-vacuous: retention is a real intersection somewhere — neither
    // empty nor the whole active set
    assert(got.exists(r => r._4 > 0 && r._4 < r._2),
      "retention never strictly between 0 and n_active — fixture degenerate")
    // AND-card is bounded by both operands everywhere
    got.foreach { case (ym, a, b, ret) =>
      assert(ret <= math.min(a, b), s"month $ym: retained $ret > min($a, $b)")
    }
    // the bitmap BYTES are partitioning-invariant (OR is commutative,
    // associative, idempotent) — the merge-order independence HLL only
    // gives approximately
    val o = graft.Tables.orders(spark, dir)
      .select(expr(
          "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
          .as("ym"),
        col("o_custkey").as("k"))
    def bytesOf(parts: Int) = o.repartition(parts)
      .groupBy("ym").agg(expr("graft_bitmap_agg(k, 20000)").as("b"))
      .orderBy("ym").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    assert(bytesOf(1).toSeq === bytesOf(13).toSeq,
      "bitmap bytes differ across partitionings")
    // an out-of-domain key fails loudly, never drops a bit
    val thrown = intercept[Throwable] {
      spark.sql(
        "SELECT graft_bitmap_agg(k, 4) FROM (SELECT 9L AS k)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(thrown).exists(_.contains("outside domain")),
      s"wrong failure: ${messages(thrown).mkString(" | ")}")
  }

  test("persisted bitmap store serves bit-identical numbers to the inline face, twice") {
    val dir = sf("sf0.01")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val inline = rows(Aggs.qAggBitmapRetention(spark, dir))
    val served = rows(Aggs.qAggBitmapPersisted(spark, dir))
    assert(served === inline,
      "artifact-served retention diverged from the inline sketch")
    assert(rows(Aggs.qAggBitmapPersisted(spark, dir)) === served,
      "serve-twice determinism broken")
  }

  test("daily MG survivor union contains every exact global heavy hitter") {
    graft.expressions.MisraGries.register(spark)
    val dir = sf("sf0.01")
    val ev = Tables.events(spark, dir).select(col("user_id"),
      expr("CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT)")
        .as("ymd"))
    val daily = ev.groupBy("ymd")
      .agg(expr("graft_misra_gries(user_id, 192)").as("cand"))
    val candUnion = daily
      .agg(expr("array_distinct(flatten(collect_list(cand)))"))
      .head().getSeq[Long](0).toSet
    assert(daily.count() > 1, "single-day corpus — merge property untested")
    val nTot = ev.count()
    val exactHH = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") * 125L > lit(nTot))
      .collect().map(_.getLong(0)).toSet
    assert(exactHH.nonEmpty)
    assert(exactHH.subsetOf(candUnion),
      s"lossless-candidate violation: ${exactHH -- candUnion} missing from sketch union")
  }

  test("grouped HH: broadcast semi-join fallback == pushed-IN path == exact, on high-cardinality groups") {
    val s = spark
    import s.implicits._
    // 40 strata x 1001 users each: one dominant (200 events) + 800
    // singletons -> candidate union far above a forced tiny push bound
    val rows = (0 until 40).flatMap { g =>
      val dom = g * 100000L
      Seq.fill(200)((s"g$g", dom)) ++ (1 to 800).map(i => (s"g$g", dom + i))
    }
    val ev = rows.toDF("grp", "user_id").repartition(16).localCheckpoint(true)
    def collectRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val pushed = collectRows(Aggs.heavyHittersGroupedOn(s, ev, maxPushedIn = 1000000))
    val fbDf = Aggs.heavyHittersGroupedOn(s, ev, maxPushedIn = 8)
    val fb = collectRows(fbDf)
    assert(pushed === fb, "fallback shape changed the result")
    val exact = collectRows(
      ev.groupBy("grp", "user_id").agg(count(lit(1)).as("n_events"))
        .join(ev.groupBy("grp").agg(count(lit(1)).as("n")), Seq("grp"))
        .filter(col("n_events") * 125L > col("n"))
        .select("grp", "user_id", "n_events").orderBy("grp", "user_id"))
    assert(fb === exact, "grouped HH diverged from brute force")
    assert(exact.size === 40, s"fixture should yield one hitter per stratum: ${exact.size}")
    // the over-bound path must actually BE the semi-join, not a giant IN
    val p = fbDf.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"fallback did not plan a semi-join:\n$p")
  }
}
