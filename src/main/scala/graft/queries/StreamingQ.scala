package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sql.Det._
import graft.sql.{DetSql => D}

/** Streaming operators (SURVEY.md §2.B "Streaming"), registered as
  * their batch equivalents — Structured Streaming's tumbling/sliding/
  * session windows produce identical results on bounded input, which is
  * what the DuckDB oracle checks. True streaming semantics (MemoryStream
  * incremental execution, watermark late-data drop) are asserted in
  * graft.streaming.StreamingSpec. */
object StreamingQ {

  def qStreamTumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("ws"),
              col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type")

  /** 1h windows sliding every 30min — each event lands in exactly 2. */
  def qStreamSliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("ws"),
              col("event_type"), col("n"), col("sum_value"))
      .orderBy("ws", "event_type")

  /** Per-user session windows with a 30-minute gap, on second-truncated
    * timestamps (ns-precision trap, SURVEY.md §7.4.2). Spark's
    * session_window merges an event at EXACTLY prev + gap into the
    * running session (the window [ts, ts+gap] is closed on the right),
    * so the oracle's gaps-and-islands split is `diff > 1800`, strictly
    * — `>=` diverges on events landing exactly on the boundary (first
    * seen at sf0.1: one 1800-second pair in 100k events). */
  def qStreamSession(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("value"),
              timestamp_seconds(unix_timestamp(col("ts"))).as("tss"))
      .groupBy(session_window(col("tss"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
              unix_timestamp(col("session_window.start")).as("session_start"),
              col("n"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** SKETCHES IN STREAMING — per-hour approximate distinct users via
    * DataSketches HLL: the windowed face of the sketch-store family
    * (the batch rollup is `q_agg_hll_partitioned`). Why a sketch and
    * not `approx_count_distinct` or exact distinct in the stream:
    * HLL register state is a few KB per window REGARDLESS of user
    * cardinality and merges associatively, so incremental micro-batch
    * execution produces BIT-IDENTICAL results to one batch pass —
    * StreamingSpec proves stream ≡ batch across multi-batch arrivals,
    * the merge property an exact distinct-set state couldn't afford at
    * 100 TB (per-window distinct sets are exactly what blows streaming
    * state stores). Rows-only check (sketch estimates aren't
    * cross-engine); accuracy vs exact countDistinct pinned ≤5% in the
    * spec. */
  def qStreamApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("nd_users"),
           count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"),
              col("nd_users"), col("n"))
      .orderBy("ws")

  /** SKETCHES IN STREAMING, frequency face — per-hour Count-Min
    * sketch of the user stream probed at the Misra-Gries candidate
    * set: "how often did each suspected heavy user hit, per hour",
    * the windowed twin of the `q_agg_cms_lookup` store. Why CMS in
    * the stream: counter state is ~28 KB per window REGARDLESS of
    * user cardinality, and merging is counter-wise addition with the
    * same seeded hashes, so incremental micro-batch execution is
    * BIT-IDENTICAL to one batch pass — StreamingSpec proves per-window
    * sketch-byte parity across forced multi-batch arrivals (an exact
    * per-window count map is exactly the state that blows a 100 TB
    * stream's store). Estimates never undercount; overcount ≤ eps·n
    * per window w.h.p. Rows-only check (sketch); parity + accuracy
    * pinned in StreamingSpec. */
  def qStreamApproxFrequency(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.CmsOps.register(s)
    graft.expressions.MisraGries.register(s)
    val ev = Tables.events(s, dir)
    val sk = ev.groupBy(window(col("ts"), "1 hour"))
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 7)").as("sk"),
           count(lit(1)).as("n"))
    val cand = ev.agg(expr("graft_misra_gries(user_id, 32)").as("cand"))
      .select(explode(col("cand")).as("user_id"))
    sk.crossJoin(broadcast(cand))
      .select(unix_timestamp(col("window.start")).as("ws"), col("user_id"),
              expr("graft_cms_estimate(sk, user_id)").as("est_freq"),
              col("n"))
      .orderBy("ws", "user_id")
  }

  /** SKETCHES IN STREAMING, set-op face — hour-over-hour user
    * retention from per-window THETA sketches: each tumbling hour
    * keeps one ≤ 8·2^12-byte sketch of its user set, and consecutive
    * hours INTERSECT ("how many of last hour's users came back"),
    * the estimate HLL structurally cannot give (no intersection
    * operator) and an exact per-window user set cannot afford in a
    * 100 TB stream's state store. The windowed twin of the batch
    * `q_agg_theta_retention` store. Why theta streams soundly: the
    * retained set is "hashes < θ" — a pure function of the window's
    * key SET — so incremental micro-batch unions are byte-identical
    * to one batch pass (StreamingSpec proves it across 3 forced
    * micro-batches), and below 2^12 distinct users per window the
    * estimates ARE exact. The window-to-next join runs OUTSIDE the
    * streaming aggregation on the tiny per-window sketch table.
    * Rows-only check (sketch estimates aren't cross-engine); parity +
    * exact-mode equality pinned in StreamingSpec. */
  def qStreamThetaRetention(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.ThetaOps.register(s)
    val sk = Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr(s"graft_theta_agg(user_id, ${graft.expressions.ThetaOps.DefaultLgK})")
             .as("sk"),
           count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("sk"),
              col("n"))
    val nxt = sk.select((col("ws") - 3600L).as("pws"), col("sk").as("nsk"))
    sk.join(nxt, col("ws") === col("pws"))
      .select(col("ws"),
        expr("graft_theta_estimate(sk)").as("n_users_est"),
        expr("graft_theta_estimate(nsk)").as("n_next_est"),
        expr("graft_theta_intersect_estimate(sk, nsk)").as("n_retained_est"))
      .orderBy("ws")
  }

  /** SKETCHES IN STREAMING, quantile face — per-hour KLL sketch of the
    * value stream served as p50/p90/p99: the latency-percentile query
    * every streaming monitor runs, completing the windowed sketch
    * matrix (distinct=HLL, frequency=CMS, set-ops=theta, and now
    * quantiles=KLL; the batch store twin is `q_agg_quantile_kll`).
    * Why KLL in the stream: per-window state is O(k log n) bytes
    * REGARDLESS of event volume (an exact per-window value list is
    * precisely what blows a 100 TB stream's state store), merges
    * associatively, and carries the distribution-independent
    * normalized-rank guarantee (~1.65% at k=200) — so the served p99
    * is a true data value whose exact rank is within eps of 0.99 no
    * matter how heavy-tailed the values. Values are exact integer
    * cents per the Det discipline. Determinism note (the reason this
    * is rows-only): KLL compaction flips coins, so byte-parity across
    * arbitrary merge orders is NOT a KLL property — but below the
    * level-0 capacity the sketch is in EXACT mode and the served
    * quantiles are exact order statistics; every fixture window sits
    * under that bound (max 175 events/hour at sf0.1 < k=200), and
    * StreamingSpec pins multi-batch ≡ batch VALUE parity there plus
    * the rank-error bound that holds at any volume. */
  def qStreamQuantileKll(s: SparkSession, dir: String): DataFrame = {
    graft.expressions.KllOps.register(s)
    Tables.events(s, dir)
      .select(col("ts"),
              expr("CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)")
                .as("cents"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr("graft_kll_agg(cents, 200)").as("sk"),
           count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"),
              expr("graft_kll_quantile(sk, 0.5D)").as("p50_cents"),
              expr("graft_kll_quantile(sk, 0.9D)").as("p90_cents"),
              expr("graft_kll_quantile(sk, 0.99D)").as("p99_cents"),
              col("n"))
      .orderBy("ws")
  }

  /** WINDOWED per-type OLS trend — "is value drifting within this
    * hour, per event type": the streaming face of
    * [[Windows.qWinLinreg]]. Why this streams soundly with NO special
    * machinery: the five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    * are plain sums — associative, merge-order-invariant, a few
    * integers of state per (window, type) — so incremental
    * micro-batch execution is exactly one windowed aggregation with
    * partial merge, and the slope is derived AFTER aggregation from
    * exact integers (same ppm rational + toward-zero division as the
    * batch face; x rebased to seconds-within-window so Σx² stays
    * small). The state story is the whole point at 100 TB: a
    * regression per window costs 5 longs of store state, not the
    * window's events. */
  def qStreamLinreg(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.events(s, dir).select(
      col("event_type"), col("ts"),
      (unix_timestamp(col("ts")) % 3600L).as("x"),
      expr("CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)").as("y"))
    pts.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("x").cast("decimal(38,0)")).as("sx"),
           sum(col("y").cast("decimal(38,0)")).as("sy"),
           sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
           sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      .select(unix_timestamp(col("window.start")).as("ws"),
              col("event_type"), col("n"), col("sx"), col("sy"),
              col("sxy"), col("sxx"))
      .withColumn("den", expr("n * sxx - sx * sx"))
      .withColumn("slope_ppm", expr(
        "CASE WHEN den = 0 THEN NULL ELSE " +
          "CAST((n * sxy - sx * sy) * 1000000L div den AS BIGINT) END"))
      .select(col("ws"), col("event_type"), col("n"), col("slope_ppm"))
      .orderBy("ws", "event_type")
  }

  /** Stateful dedup shape: duplicated input collapses back to one row
    * per event_id (streaming: dropDuplicatesWithinWatermark). */
  def qStreamDedup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select("event_id", "event_type", "value")
    e.unionByName(e)
      .dropDuplicates("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("event_type")
  }

  /** Watermark semantics, batch-shaped: keep only events no older than
    * 10 minutes before the max event time, then per-minute counts.
    * (The streaming-observable late-drop behavior is asserted in
    * StreamingSpec with a MemoryStream — no SQL oracle.) */
  def qStreamLateWatermark(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(unix_micros(col("ts")).as("tsu"))
    val mx = e.agg(max(col("tsu")).as("mx"))
    e.crossJoin(mx)
      .filter(col("tsu") >= col("mx") - lit(600000000L))
      .groupBy(expr("tsu DIV 60000000").as("minute_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("minute_bucket")
  }

  /** Stream-stream interval join shape: each purchase matched to the
    * same user's views from the preceding 10 minutes — in streaming,
    * two watermarked streams joined on key + time-range (state bounded
    * by the watermark); here the batch equivalent the oracle can check.
    * Streaming parity is asserted in StreamingSpec with two
    * MemoryStreams. */
  def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), unix_micros(col("ts")).as("vts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"),
              unix_micros(col("ts")).as("pts"))
    purchases.join(views,
        col("pu") === col("vu") &&
        col("vts") < col("pts") && col("vts") >= col("pts") - lit(600000000L))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n_views"), max(col("vts")).as("last_view_tsu"))
      .orderBy("pid")
  }

  /** LEFT OUTER interval join — the attribution face [[qStreamJoin]]
    * can't give: EVERY purchase appears, view-less ones with
    * n_views = 0 and last_view_tsu = -1. In Structured Streaming this
    * is the semantics that needs watermarks on BOTH sides: an
    * unmatched purchase can only emit its NULL row once the view-side
    * watermark proves no in-interval view can still arrive
    * (StreamingSpec pins that emission order on a MemoryStream).
    * Batch face = plain left join + count of the MATCHED column, so
    * the oracle is exact SQL; the interval bound keeps stream state
    * finite (10 minutes per user), the property that makes the join
    * runnable forever at 100 TB/day. */
  def qStreamJoinOuter(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), unix_micros(col("ts")).as("vts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"),
              unix_micros(col("ts")).as("pts"))
    purchases.join(views,
        col("pu") === col("vu") &&
        col("vts") < col("pts") && col("vts") >= col("pts") - lit(600000000L),
        "left")
      .groupBy(col("pid"))
      .agg(count(col("vu")).as("n_views"),
           coalesce(max(col("vts")), lit(-1L)).as("last_view_tsu"))
      .orderBy("pid")
  }

  /** Funnel conversion over the event stream: per user, first `view`
    * then first `purchase` strictly after it; one summary row with
    * viewer count, converted count, and the exact summed conversion
    * delay. The batch face of a sessionized funnel (the stateful
    * streaming analog lives in graft.streaming.StatefulSessions). */
  def qStreamFunnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tsu"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t1"))
    val p = e.filter(col("event_type") === "purchase")
      .join(v.select(col("user_id").as("vu"), col("t1")),
            col("user_id") === col("vu") && col("tsu") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("tsu")).as("t2"))
    v.join(p.select(col("user_id").as("pu"), col("t2")),
           col("user_id") === col("pu"), "left")
      .agg(count(lit(1)).as("n_viewers"),
           count(col("t2")).as("n_converted"),
           coalesce(sum(col("t2") - col("t1")), lit(0L)).as("sum_delay_us"))
  }

  /** Retention cohorts: users bucketed by first-seen hour; for each
    * (cohort_hour, hour_offset), the number of users active then —
    * the companion report to the funnel, all integer arithmetic. */
  def qStreamRetention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"),
              expr("unix_micros(ts) DIV 3600000000").as("hr"))
    val first = e.groupBy(col("user_id")).agg(min(col("hr")).as("cohort"))
    val act = e.distinct()
    act.join(first, "user_id")
      .groupBy(col("cohort"), (col("hr") - col("cohort")).as("offset_h"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort", "offset_h")
  }

  /** Capped sessionization: sessions split on a 30-minute gap OR when
    * the session would exceed a 30-minute total duration — the telemetry
    * variant no window function can express (whether an event opens a
    * new session depends recursively on which session the PREVIOUS
    * event landed in, which the cap makes assignment-dependent). The
    * genuinely-sequential fold runs as a SECONDARY SORT — repartition
    * by user, sortWithinPartitions (user, ts, id), then ONE streaming
    * mapPartitions pass holding a single open session in memory — so a
    * 10M-event power user costs O(1) executor memory, where a
    * groupByKey.flatMapGroups would materialize their whole history
    * (the streaming analog is flatMapGroupsWithState). The oracle is a
    * DuckDB WITH RECURSIVE over each user's event sequence. All
    * outputs are integers (epoch seconds, counts, exact value
    * centi-units), so the fold is hash-stable by construction. */
  def qStreamSessionCapped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sorted = Tables.events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("tss"),
              col("event_id"),
              // explicit ROUND before the bigint cast: Spark's
              // decimal->bigint truncates toward zero while DuckDB's
              // rounds, so without it agreement would silently depend
              // on `value` carrying <= 2 decimal places. Both engines'
              // ROUND on exact decimals is half-away-from-zero.
              round(dec(col("value")) * 100, 0).cast("long").as("v100"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "tss", "event_id")
      .as[(Long, Long, Long, Long)]
    sorted.mapPartitions { rows =>
      new Iterator[(Long, Long, Long, Long)] {
        // one finished session waiting to be emitted + one open session
        private var ready: Option[(Long, Long, Long, Long)] = None
        private var open: Option[(Long, Long, Long, Long)] = None
        private var prev = 0L
        private def advance(): Unit = {
          while (ready.isEmpty && rows.hasNext) {
            val (uid, tss, _, v) = rows.next()
            open match {
              case Some((cu, st, n, sm))
                  if cu == uid && tss - prev <= 1800 && tss - st <= 1800 =>
                open = Some((cu, st, n + 1, sm + v)); prev = tss
              case Some(done) =>
                ready = Some(done)
                open = Some((uid, tss, 1L, v)); prev = tss
              case None =>
                open = Some((uid, tss, 1L, v)); prev = tss
            }
          }
          if (ready.isEmpty && !rows.hasNext && open.isDefined) {
            ready = open; open = None
          }
        }
        override def hasNext: Boolean = { advance(); ready.isDefined }
        override def next(): (Long, Long, Long, Long) = {
          advance(); val r = ready.get; ready = None; r
        }
      }
    }.toDF("user_id", "session_start", "n", "sum_v100")
      .orderBy("user_id", "session_start")
  }

  /** The static enrichment dimension for [[qStreamEnrich]] — in a real
    * deployment a slowly-changing reference table the stream joins
    * against on every micro-batch. */
  def enrichDim(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("view", 1L), ("click", 2L), ("signup", 3L),
        ("purchase", 5L), ("error", 0L)).toDF("event_type", "weight")
  }

  /** Stream-static enrichment join: the event stream joined to a small
    * static dimension (event_type -> weight), then hourly weighted
    * sums. In streaming this is the canonical broadcast enrichment —
    * the static side is broadcast to every task, the stream side never
    * shuffles for the join, and state is only the windowed agg.
    * Streaming parity (readStream + same join) is asserted in
    * StreamingSpec; weighted sums are exact decimals per the Det
    * discipline. */
  def qStreamEnrich(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .join(broadcast(enrichDim(s)), "event_type")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(dec(col("value")) * col("weight")).cast("double")
             .as("wsum_value"))
      .select(unix_timestamp(col("window.start")).as("ws"),
              col("event_type"), col("n"), col("wsum_value"))
      .orderBy("ws", "event_type")

  /** Windowed TOP-K: the 3 most frequent event types per hourly window
    * (ties broken by type name) — the "trending items per window"
    * streaming dashboard shape. Written as the standard
    * row_number<=k window+filter, which the registered TopKPerKey rule
    * rewrites into bounded per-window heaps: only <=3 survivors per
    * hour shuffle after the windowed partial agg, never a sort of all
    * (window, type) pairs. In streaming the same plan runs after a
    * watermarked windowed aggregation per micro-batch. */
  def qStreamTopk(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.plans.TopKPerKey.register(s)
    val hourly = Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"),
              col("event_type"), col("n"))
    val w = Window.partitionBy("ws")
      .orderBy(col("n").desc, col("event_type").asc)
    hourly.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .orderBy("ws", "rnk")
  }

  /** CDC upsert compaction — the "current state" view every
    * change-stream consumer materializes: latest event per user_id
    * (last-writer-wins on (ts, event_id); event_id breaks exact-ts
    * ties so the winner is total-ordered and engine-exact). The plan
    * is a map-side partial MAX over a struct whose leading fields are
    * the ordering key — at 100 TB only one candidate row per user per
    * input partition reaches the shuffle, vs a per-key window sort
    * that would shuffle EVERY row to sort it (the payload fields ride
    * behind the unique (tsu, event_id) prefix, so they never decide a
    * comparison). Streaming face: the same last-writer-wins state in
    * mapGroupsWithState, asserted against this batch plan in
    * StreamingSpec. */
  def qStreamCdcUpsert(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"),
              struct(unix_micros(col("ts")).as("tsu"), col("event_id"),
                     col("event_type"), col("value")).as("st"))
      .groupBy("user_id")
      .agg(max(col("st")).as("last"))
      .select(col("user_id"), col("last.tsu").as("last_tsu"),
              col("last.event_id").as("last_event_id"),
              col("last.event_type").as("last_type"),
              col("last.value").as("last_value"))
      .orderBy("user_id")

  /** CDC upsert + DELETE resolution: same last-writer-wins compaction
    * as [[qStreamCdcUpsert]], with 'error' events acting as tombstones
    * — a key whose LATEST change is a tombstone has been deleted and
    * must not appear in the resolved state table (stale tombstones
    * overwritten by newer rows keep the key alive). Same map-side
    * max-struct plan + one post-agg filter, so delete resolution costs
    * nothing extra on the wire; streaming twin asserted in
    * StreamingSpec (state removed on tombstone). */
  def qStreamCdcResolved(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"),
              struct(unix_micros(col("ts")).as("tsu"), col("event_id"),
                     col("event_type"), col("value")).as("st"))
      .groupBy("user_id")
      .agg(max(col("st")).as("last"))
      .filter(col("last.event_type") =!= "error")
      .select(col("user_id"), col("last.tsu").as("last_tsu"),
              col("last.event_id").as("last_event_id"),
              col("last.event_type").as("last_type"),
              col("last.value").as("last_value"))
      .orderBy("user_id")

  /** CDC -> SCD TYPE-2 HISTORY — the third face of the changelog
    * family: where upsert keeps only the latest state and resolved
    * additionally honors tombstones, SCD2 keeps EVERY version with its
    * validity interval [valid_from, valid_to) — the
    * dimension-with-history table every warehouse joins facts against
    * "as of" a point in time. valid_to is the NEXT change's event time
    * for the same key (lead over the (tsu, event_id) total order —
    * exact-ts ties are broken by event_id exactly like the upsert
    * face), NULL while current. The per-key window shuffles each row
    * once, keyed by user — unavoidable and right: SCD2 materializes
    * every version by definition, and the partitionBy distributes
    * keys; no global sort anywhere. */
  def qStreamCdcScd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("tsu").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
              col("event_id"), col("event_type"), col("value"))
      .select(col("user_id"), col("event_id"), col("event_type"),
              col("value"), col("tsu").as("valid_from_us"),
              lead(col("tsu"), 1).over(w).as("valid_to_us"))
      .withColumn("is_current", col("valid_to_us").isNull)
      .orderBy("user_id", "valid_from_us", "event_id")
  }

  /** Streaming AS-OF enrichment, batch face: each purchase enriched
    * with the same user's latest strictly-prior view — delegates to
    * the merge_asof backward plan (one per-user window pass; see
    * [[Joins.qJoinAsof]]) because on bounded input the streaming and
    * batch faces are CONTRACTED to agree row-for-row. The streaming
    * implementation is [[graft.streaming.AsofEnrich]]: watermark-
    * finalized temporal-nearest state (a purchase is emitted only
    * once the watermark passes it, so a late prior view landing in a
    * later micro-batch still wins; below-watermark views compact to
    * one long per key). StreamingSpec pins multi-batch ≡ batch parity
    * on exactly that late-arrival fixture, plus the bounded-state
    * compaction. The oracle is the batch twin's correlated subquery. */
  def qStreamAsof(s: SparkSession, dir: String): DataFrame =
    Joins.qJoinAsof(s, dir)

  /** Stream-stream AS-OF JOIN, batch face: each purchase joined to
    * the latest strictly-prior view's ROW — id and timestamp, the
    * matched-payload contract that separates a temporal JOIN from the
    * enrichment face ([[qStreamAsof]], which carries only the max
    * timestamp). One per-user window pass: argmax via
    * max(struct(tsu, event_id)) over the prior-view frame — the
    * (tsu, id) total order is the tie-break contract, mirrored in the
    * streaming state machine and the oracle's ORDER BY ts DESC, id
    * DESC LIMIT 1. The streaming implementation is
    * [[graft.streaming.AsofJoin]]: purchases and views as two
    * SEPARATE watermarked streams, co-partitioned by user through
    * flatMapGroupsWithState at the min of the two watermarks;
    * StreamingSpec pins multi-batch ≡ batch parity on both-side-late
    * fixtures and that a lagging view stream holds back purchase
    * finalization. */
  def qStreamAsofJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tsu"))
    val w = Window.partitionBy("user_id").orderBy("tsu")
      .rangeBetween(Window.unboundedPreceding, -1)
    e.withColumn("pv",
        max(when(col("event_type") === "view",
                 struct(col("tsu"), col("event_id")))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tsu"),
              col("pv.event_id").as("view_id"),
              col("pv.tsu").as("view_tsu"))
      .orderBy("event_id")
  }

  /** The CDC→lakehouse chain's commit boundary — event-time µs of
    * 2024-01-16T00:00:00Z, mid-corpus of the 2024-01 events feed.
    * CONTRACT constant: the oracle splits the feed at the same
    * instant. */
  private[queries] val CdcCommitBoundaryUs = 1705363200000000L
  private val cdcLakehouseVersion = "cdc-lakehouse-2commit-v1"

  /** The last-writer-wins state of a change feed — ONE spelling of
    * the argmax shared by the upsert face, both lakehouse commits and
    * the snapshot resolver, so none can drift on the (tsu, event_id)
    * total order. */
  private def lwwState(df: DataFrame): DataFrame =
    df.select(col("user_id"),
        struct(unix_micros(col("ts")).as("tsu"), col("event_id"),
               col("event_type"), col("value")).as("st"))
      .groupBy("user_id")
      .agg(max(col("st")).as("last"))
      .select(col("user_id"), col("last.tsu").as("last_tsu"),
              col("last.event_id").as("last_event_id"),
              col("last.event_type").as("last_type"),
              col("last.value").as("last_value"))

  /** The CDC→VERSIONED-TABLE artifact: two upsert commits of the
    * events change feed into one logical table. Commit 1 = the
    * resolved state after the first half of the feed; commit 2 = ONLY
    * the keys whose state changed in the second half (exactly what a
    * streaming foreachBatch upsert writer commits — O(changed keys),
    * never a state rewrite). The artifact carries its own manifest
    * per the round-17 item-3 discipline. */
  private[queries] def cdcLakehousePath(s: SparkSession, dir: String): String =
    graft.ArtifactStore.ensure(graft.ArtifactStore.cachePath("cdc_lakehouse",
      graft.ArtifactStore.contentKey(s"$dir/events.parquet",
        cdcLakehouseVersion))) { tmp =>
      val ev = Tables.events(s, dir)
      val st1 = lwwState(ev.filter(unix_micros(col("ts")) < CdcCommitBoundaryUs))
        .localCheckpoint(true)
      st1.coalesce(1).write.mode("overwrite").parquet(s"$tmp/c1")
      // a key's state changed iff its overall argmax differs from its
      // pre-boundary argmax — (tsu, event_id) is unique, so comparing
      // the winning event_id suffices
      val delta = lwwState(ev)
        .join(st1.select(col("user_id"),
                         col("last_event_id").as("prev_event_id")),
              Seq("user_id"), "left")
        .filter(col("prev_event_id").isNull ||
                col("last_event_id") =!= col("prev_event_id"))
        .drop("prev_event_id")
      delta.coalesce(1).write.mode("overwrite").parquet(s"$tmp/c2")
      Layout.writeArtifactManifest(tmp)
    }

  /** STREAMING CDC → VERSIONED TABLE ROUND TRIP (round-17 verdict
    * item 6) — the end-to-end a production pipeline actually runs,
    * pinning the exactly-once handoff between the two green families:
    * a CDC upsert feed committed into a snapshot chain
    * ([[cdcLakehousePath]]: commit 1 = first-half state, commit 2 =
    * the second half's changed keys only), then served BACK from the
    * table — snapshot 1 (commit 1), snapshot 2 (commits 1+2 resolved
    * last-writer-wins per key), and the INCREMENTAL read (commit 2
    * alone, what a downstream consumer processes without re-scanning
    * state). File sets resolve from the artifact's persisted
    * manifest; the reader-side resolve is the same max-struct argmax
    * as every CDC face — at 100 TB this is Delta/Iceberg MERGE
    * semantics with the merge-on-read resolve in the reader.
    *
    * The ORACLE recomputes all three versions from the raw feed
    * (v1 = last state of pre-boundary events; v2 = last state of all
    * events; v3/delta = post-boundary-active users' final state), so
    * the hash gate proves no row was lost, duplicated or stale-served
    * across the stream→table→reader handoff. The true streaming twin
    * (MemoryStream batches split at the same boundary, foreachBatch
    * Update-mode commits) is pinned equal to this batch face in
    * StreamingSpec. */
  def qStreamCdcLakehouse(s: SparkSession, dir: String): DataFrame = {
    val root = cdcLakehousePath(s, dir)
    def commit(sub: String): DataFrame =
      s.read.parquet(Layout.manifestEntries(root)
        .filter(_._1.startsWith(sub + "/"))
        .map { case (rel, _) => s"$root/$rel" }: _*)
    val c1 = commit("c1")
    val c2 = commit("c2")
    // snapshot 2 = last-writer-wins across commits: same argmax
    // struct order as the feed-level resolve (commit 2's rows always
    // carry newer (tsu, event_id) for their keys by construction)
    val v2 = c1.unionByName(c2)
      .groupBy("user_id")
      .agg(max(struct(col("last_tsu"), col("last_event_id"),
                      col("last_type"), col("last_value"))).as("st"))
      .select(col("user_id"), col("st.last_type").as("last_type"),
              col("st.last_value").as("last_value"))
    def roll(df: DataFrame, version: Long): DataFrame =
      df.groupBy(col("last_type"))
        .agg(count(lit(1)).as("n_users"), dsum(col("last_value")).as("sum_value"))
        .select(lit(version).as("version"), col("last_type"),
                col("n_users"), col("sum_value"))
    roll(c1.select(col("user_id"), col("last_type"), col("last_value")), 1L)
      .unionByName(roll(v2, 2L))
      .unionByName(roll(c2.select(col("user_id"), col("last_type"),
                                  col("last_value")), 3L))
      .orderBy("version", "last_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_cdc_lakehouse" -> (qStreamCdcLakehouse _),
    "q_stream_asof" -> (qStreamAsof _),
    "q_stream_asof_join" -> (qStreamAsofJoin _),
    "q_stream_cdc_scd2" -> (qStreamCdcScd2 _),
    "q_stream_cdc_resolved" -> (qStreamCdcResolved _),
    "q_stream_cdc_upsert" -> (qStreamCdcUpsert _),
    "q_stream_topk" -> (qStreamTopk _),
    "q_stream_session_capped" -> (qStreamSessionCapped _),
    "q_stream_enrich" -> (qStreamEnrich _),
    "q_stream_retention" -> (qStreamRetention _),
    "q_stream_funnel" -> (qStreamFunnel _),
    "q_stream_tumbling" -> (qStreamTumbling _),
    "q_stream_linreg" -> (qStreamLinreg _),
    "q_stream_sliding" -> (qStreamSliding _),
    "q_stream_session" -> (qStreamSession _),
    "q_stream_dedup" -> (qStreamDedup _),
    "q_stream_approx_distinct" -> (qStreamApproxDistinct _),
    "q_stream_approx_frequency" -> (qStreamApproxFrequency _),
    "q_stream_quantile_kll" -> (qStreamQuantileKll _),
    "q_stream_theta_retention" -> (qStreamThetaRetention _),
    "q_stream_late_watermark" -> (qStreamLateWatermark _),
    "q_stream_join" -> (qStreamJoin _),
    "q_stream_join_outer" -> (qStreamJoinOuter _),
  )

  private val esSql = "CAST(FLOOR(EPOCH(ts)) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    // the as-of batch twin's oracle, verbatim from q_join_asof — the
    // two entries are contracted to the same rows; the streaming face
    // (AsofEnrich) is pinned against this batch plan in StreamingSpec
    "q_stream_asof" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS tsu,
        |  (SELECT MAX(epoch_us(v.ts)) FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND epoch_us(v.ts) < epoch_us(p.ts)) AS prior_view_tsu
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    // the textbook correlated argmax: matched row picked by
    // (ts DESC, id DESC) — the same (tsu, id) total order as the
    // engine's max(struct) and the streaming state machine's ord
    "q_stream_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS tsu,
        |  (SELECT v.event_id FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND epoch_us(v.ts) < epoch_us(p.ts)
        |   ORDER BY epoch_us(v.ts) DESC, v.event_id DESC
        |   LIMIT 1) AS view_id,
        |  (SELECT MAX(epoch_us(v.ts)) FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND epoch_us(v.ts) < epoch_us(p.ts)) AS view_tsu
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    // round 11: the batch face is pure integer arithmetic (epoch-µs
    // max, integer lookback, positive-value floor division), so it IS
    // oracle-checkable — only the streaming-observable late-row DROP
    // stays MemoryStream-only (StreamingSpec)
    "q_stream_late_watermark" ->
      """WITH e AS (SELECT epoch_us(ts) AS tsu FROM events),
        |mx AS (SELECT MAX(tsu) AS mx FROM e)
        |SELECT tsu // 60000000 AS minute_bucket, COUNT(*) AS n
        |FROM e, mx
        |WHERE tsu >= mx - 600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_cdc_resolved" ->
      """SELECT user_id, epoch_us(ts) AS last_tsu, event_id AS last_event_id,
        |  event_type AS last_type, value AS last_value
        |FROM (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    "q_stream_cdc_scd2" ->
      """SELECT user_id, event_id, event_type, value,
        |  epoch_us(ts) AS valid_from_us,
        |  LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS valid_to_us,
        |  LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) IS NULL AS is_current
        |FROM events
        |ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    "q_stream_cdc_upsert" ->
      """SELECT user_id, epoch_us(ts) AS last_tsu, event_id AS last_event_id,
        |  event_type AS last_type, value AS last_value
        |FROM (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // the three versions recomputed from the RAW feed: v1 = state of
    // the pre-boundary prefix, v2 = state of the whole feed, v3 = the
    // post-boundary-active keys' final state (exactly the commit-2
    // delta: a key changes iff it has any event at/after the boundary)
    "q_stream_cdc_lakehouse" ->
      s"""WITH last_all AS (
         |  SELECT user_id, event_type AS last_type, value AS last_value
         |  FROM (
         |    SELECT user_id, event_type, value,
         |      ROW_NUMBER() OVER (PARTITION BY user_id
         |        ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM events)
         |  WHERE rn = 1),
         |last_pre AS (
         |  SELECT user_id, event_type AS last_type, value AS last_value
         |  FROM (
         |    SELECT user_id, event_type, value,
         |      ROW_NUMBER() OVER (PARTITION BY user_id
         |        ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM events WHERE epoch_us(ts) < ${CdcCommitBoundaryUs})
         |  WHERE rn = 1),
         |changed AS (
         |  SELECT DISTINCT user_id FROM events
         |  WHERE epoch_us(ts) >= ${CdcCommitBoundaryUs})
         |SELECT CAST(1 AS BIGINT) AS version, last_type,
         |  CAST(COUNT(*) AS BIGINT) AS n_users,
         |  ${D.dsum("last_value")} AS sum_value
         |FROM last_pre GROUP BY 2
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), last_type, CAST(COUNT(*) AS BIGINT),
         |  ${D.dsum("last_value")}
         |FROM last_all GROUP BY 2
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), last_type, CAST(COUNT(*) AS BIGINT),
         |  ${D.dsum("last_value")}
         |FROM last_all JOIN changed USING (user_id) GROUP BY 2
         |ORDER BY version, last_type""".stripMargin,
    "q_stream_topk" ->
      s"""WITH hourly AS (
         |  SELECT ($esSql // 3600) * 3600 AS ws, event_type,
         |    COUNT(*) AS n
         |  FROM events GROUP BY 1, 2)
         |SELECT ws, event_type, n, rnk FROM (
         |  SELECT ws, event_type, n,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY ws
         |      ORDER BY n DESC, event_type ASC) AS INTEGER) AS rnk
         |  FROM hourly)
         |WHERE rnk <= 3 ORDER BY ws, rnk""".stripMargin,
    "q_stream_session_capped" ->
      s"""WITH RECURSIVE seq AS (
         |  SELECT user_id, $esSql AS tss, event_id,
         |    CAST(ROUND(CAST(value AS DECIMAL(18,6)) * 100, 0) AS BIGINT) AS v100,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY $esSql, event_id) AS rn
         |  FROM events),
         |r AS (
         |  SELECT user_id, rn, tss, v100, tss AS sess_start
         |  FROM seq WHERE rn = 1
         |  UNION ALL
         |  SELECT s.user_id, s.rn, s.tss, s.v100,
         |    CASE WHEN s.tss - r.tss > 1800 OR s.tss - r.sess_start > 1800
         |         THEN s.tss ELSE r.sess_start END
         |  FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
         |SELECT user_id, sess_start AS session_start, COUNT(*) AS n,
         |  CAST(SUM(v100) AS BIGINT) AS sum_v100
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_enrich" ->
      s"""WITH dim(event_type, weight) AS (VALUES
         |  ('view', 1), ('click', 2), ('signup', 3),
         |  ('purchase', 5), ('error', 0))
         |SELECT ($esSql // 3600) * 3600 AS ws, e.event_type,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,6)) * weight) AS DOUBLE)
         |    AS wsum_value
         |FROM events e JOIN dim ON e.event_type = dim.event_type
         |GROUP BY 1, 2 ORDER BY ws, e.event_type""".stripMargin,
    "q_stream_linreg" ->
      """WITH pts AS (
        |  SELECT event_type, ts,
        |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) % 3600 AS x,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT) AS y,
        |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600 * 3600 AS ws
        |  FROM events),
        |ag AS (
        |  SELECT ws, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx,
        |    SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM pts GROUP BY ws, event_type)
        |SELECT ws, event_type, n,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |       ELSE CAST((n * sxy - sx * sy) * 1000000
        |         // (n * sxx - sx * sx) AS BIGINT) END AS slope_ppm
        |FROM ag ORDER BY ws, event_type""".stripMargin,
    "q_stream_tumbling" ->
      s"""SELECT ($esSql // 3600) * 3600 AS ws, event_type,
         |  COUNT(*) AS n, ${D.dsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "q_stream_sliding" ->
      s"""SELECT ws, event_type, COUNT(*) AS n, ${D.dsum("value")} AS sum_value
         |FROM (
         |  SELECT ($esSql // 1800) * 1800 AS ws, event_type, value FROM events
         |  UNION ALL
         |  SELECT ($esSql // 1800) * 1800 - 1800 AS ws, event_type, value FROM events)
         |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,
    "q_stream_session" ->
      s"""WITH t AS (
         |  SELECT user_id, value, $esSql AS tss, event_id FROM events),
         |flagged AS (
         |  SELECT user_id, value, tss,
         |    CASE WHEN LAG(tss) OVER w IS NULL
         |              OR tss - LAG(tss) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
         |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)),
         |sess AS (
         |  SELECT user_id, value, tss,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tss
         |                     ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM flagged)
         |SELECT user_id, MIN(tss) AS session_start,
         |  COUNT(*) AS n, ${D.dsum("value")} AS sum_value
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,
    "q_stream_dedup" ->
      s"""SELECT event_type, COUNT(*) AS n, ${D.dsum("value")} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_stream_retention" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id,
        |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600 AS hr
        |  FROM events),
        |first AS (
        |  SELECT user_id, MIN(hr) AS cohort FROM e GROUP BY user_id)
        |SELECT f.cohort, e.hr - f.cohort AS offset_h,
        |  COUNT(*) AS n_active
        |FROM e JOIN first f ON e.user_id = f.user_id
        |GROUP BY f.cohort, e.hr - f.cohort
        |ORDER BY cohort, offset_h""".stripMargin,
    "q_stream_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |   AND epoch_us(e.ts) > v.t1
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT COUNT(*) AS n_viewers,
        |  COUNT(p.t2) AS n_converted,
        |  CAST(COALESCE(SUM(p.t2 - v.t1), 0) AS BIGINT) AS sum_delay_us
        |FROM v LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "q_stream_join" ->
      """SELECT p.event_id AS pid, COUNT(*) AS n_views,
        |  MAX(epoch_us(v.ts)) AS last_view_tsu
        |FROM events p JOIN events v
        |  ON p.user_id = v.user_id
        | AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND epoch_us(v.ts) < epoch_us(p.ts)
        | AND epoch_us(v.ts) >= epoch_us(p.ts) - 600000000
        |GROUP BY p.event_id ORDER BY pid""".stripMargin,
    "q_stream_join_outer" ->
      """SELECT p.event_id AS pid, COUNT(v.user_id) AS n_views,
        |  COALESCE(MAX(epoch_us(v.ts)), -1) AS last_view_tsu
        |FROM events p LEFT JOIN events v
        |  ON p.user_id = v.user_id
        | AND v.event_type = 'view'
        | AND epoch_us(v.ts) < epoch_us(p.ts)
        | AND epoch_us(v.ts) >= epoch_us(p.ts) - 600000000
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY pid""".stripMargin,
  )
}
