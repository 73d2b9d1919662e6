package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** True Structured Streaming semantics (SURVEY.md §5.5): batch ≡ stream
  * for tumbling windows, and watermark late-row dropping — the
  * streaming-only observable behind q_stream_late_watermark. */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("tumbling window: stream result equals batch result") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      (1L, ts(0), "a", 1.0), (2L, ts(5), "a", 2.0), (3L, ts(12), "b", 3.0),
      (4L, ts(61), "a", 4.0), (5L, ts(65), "b", 5.0))

    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    mem.addData(rows: _*)
    val streamed = mem.toDF.toDF("event_id", "ts", "event_type", "value")
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
    val q = streamed.writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Complete).start()
    q.processAllAvailable()
    q.stop()

    val batch = rows.toDF("event_id", "ts", "event_type", "value")
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
    val got = s.table("tumbling_out")
      .select($"window.start", $"event_type", $"n", $"s")
      .collect().toSet
    val exp = batch.select($"window.start", $"event_type", $"n", $"s")
      .collect().toSet
    assert(got === exp)
  }

  test("windowed HLL distinct: multi-batch stream equals one batch pass, tracks exact <=5%") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // 3 windows x overlapping users; split across THREE addData calls
    // so incremental execution must MERGE register state across
    // micro-batches — the property that makes a sketch streamable
    val rows = (0 until 90).map { i =>
      (i.toLong, ts(i), (i % 23 + (i / 30) * 7).toLong)
    }
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val streamed = mem.toDF.toDF("event_id", "ts", "user_id")
      .groupBy(window($"ts", "30 minutes"))
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("nd"),
           count(lit(1)).as("n"))
    val q = streamed.writeStream.format("memory").queryName("hll_stream_out")
      .outputMode(OutputMode.Complete).start()
    rows.grouped(30).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = s.table("hll_stream_out")
      .select($"window.start", $"nd", $"n").collect().toSet
    val batch = rows.toDF("event_id", "ts", "user_id")
      .groupBy(window($"ts", "30 minutes"))
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("nd"),
           count(lit(1)).as("n"))
      .select($"window.start", $"nd", $"n").collect().toSet
    assert(got === batch,
      "incremental HLL merge diverged from the single batch pass")
    // the registered query's estimates stay within sketch accuracy
    val est = graft.queries.StreamingQ
      .qStreamApproxDistinct(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.events(spark, sf("sf0.001"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("nd"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (ws, nd) =>
      assert(math.abs(est(ws) - nd) <= math.max(1L, (nd * 0.05).toLong),
        s"window $ws estimate ${est(ws)} drifts past 5% of exact $nd")
    }
  }

  test("windowed CMS frequency: multi-batch sketch bytes == one batch pass; estimates exact on sparse fixture") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // 3 windows, one dominant user (7) + a rotating tail; split across
    // three addData calls so incremental execution must counter-merge
    // CMS state across micro-batches
    val rows = (0 until 90).map { i =>
      (i.toLong, ts(i), if (i % 3 == 0) 7L else (i % 23).toLong)
    }
    val mem = MemoryStream[(Long, Timestamp, Long)]
    def cmsAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window($"ts", "30 minutes"))
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 7)").as("sk"),
           count(lit(1)).as("n"))
    val q = cmsAgg(mem.toDF.toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("cms_stream_out")
      .outputMode(OutputMode.Complete).start()
    rows.grouped(30).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    def bytesByWindow(df: org.apache.spark.sql.DataFrame) =
      df.select($"window.start", $"sk", $"n").collect()
        .map(r => r.getTimestamp(0) -> ((r.getAs[Array[Byte]](1), r.getLong(2))))
        .toMap
    val got = bytesByWindow(s.table("cms_stream_out"))
    val batch = bytesByWindow(cmsAgg(rows.toDF("event_id", "ts", "user_id")))
    assert(got.keySet === batch.keySet)
    assert(got.size === 3, s"fixture should span 3 windows: ${got.keySet}")
    got.foreach { case (w, (sk, n)) =>
      assert(n === batch(w)._2)
      assert(java.util.Arrays.equals(sk, batch(w)._1),
        s"window $w: incremental CMS merge not byte-identical to batch")
    }
    // the registered query: estimates never undercount the exact
    // per-window candidate counts, overcount bounded by eps*n
    graft.expressions.CmsOps.register(spark)
    graft.expressions.MisraGries.register(spark)
    val dir = sf("sf0.001")
    val est = graft.queries.StreamingQ.qStreamApproxFrequency(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(est.nonEmpty, "no candidate rows — fixture claim broken")
    val exact = graft.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .select(unix_timestamp(col("window.start")).as("ws"),
              col("user_id"), col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    est.foreach { case ((ws, u), (e, n)) =>
      val ex = exact.getOrElse((ws, u), 0L)
      assert(e >= ex, s"CMS undercounted ($ws, $u): $e < $ex")
      assert(e <= ex + math.max(1L, (n * 0.001).toLong),
        s"CMS overcount past eps*n at ($ws, $u): $e vs $ex (n=$n)")
    }
  }

  test("windowed KLL quantiles: multi-batch stream equals batch in exact mode; rank error bounded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    graft.expressions.KllOps.register(spark)
    // 3 windows x 30 skewed values; split across three addData calls so
    // incremental execution must merge KLL state across micro-batches.
    // 30 < k=200 keeps every window in exact mode, where quantile
    // VALUES are deterministic even though sketch BYTES need not be.
    val rows = (0 until 90).map { i =>
      (i.toLong, ts(i), ((i % 17) * (i % 17) * 100L + i))
    }
    val mem = MemoryStream[(Long, Timestamp, Long)]
    def kllAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window($"ts", "30 minutes"))
      .agg(expr("graft_kll_agg(v, 200)").as("sk"), count(lit(1)).as("n"))
      .select($"window.start".as("w"),
              expr("graft_kll_quantile(sk, 0.5D)").as("p50"),
              expr("graft_kll_quantile(sk, 0.9D)").as("p90"),
              expr("graft_kll_quantile(sk, 0.99D)").as("p99"), $"n")
    val q = kllAgg(mem.toDF.toDF("event_id", "ts", "v"))
      .writeStream.format("memory").queryName("kll_stream_out")
      .outputMode(OutputMode.Complete).start()
    rows.grouped(30).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val got = s.table("kll_stream_out").collect()
      .map(r => r.getTimestamp(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val batch = kllAgg(rows.toDF("event_id", "ts", "v")).collect()
      .map(r => r.getTimestamp(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === batch.keySet)
    assert(got.size === 3, s"fixture should span 3 windows: ${got.keySet}")
    assert(got === batch,
      "exact-mode incremental KLL quantiles diverged from the batch pass")

    // the registered query: every fixture window sits under the k=200
    // exact-mode bound (max 175 events/hour), so each served quantile
    // must BE the exact INCLUSIVE order statistic — the smallest data
    // value whose normalized rank >= the requested rank. (Past exact
    // mode the guarantee relaxes to the ±1.65% rank window; the
    // fixture pins the exact face, which subsumes it.)
    val dir = sf("sf0.001")
    val served = graft.queries.StreamingQ.qStreamQuantileKll(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(served.nonEmpty)
    val values = graft.Tables.events(spark, dir)
      .select(unix_timestamp(window(col("ts"), "1 hour")("start")).as("ws"),
              expr("CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT)")
                .as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ws, xs) => ws -> xs.map(_._2).sorted }
    served.foreach { case (ws, (p50, p90, p99, n)) =>
      val sorted = values(ws)
      assert(n === sorted.length.toLong)
      assert(n <= 200L, s"window $ws left KLL exact mode — re-derive the pin")
      Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99).foreach { case (rank, v) =>
        val want = sorted(math.max(0, math.ceil(rank * sorted.length).toInt - 1))
        assert(v === want,
          s"window $ws: p$rank=$v != exact inclusive order statistic $want")
      }
    }
  }

  test("streaming ANN serve: per-micro-batch serving against the saved index equals one batch pass") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    graft.expressions.VectorOps.register(spark)
    graft.expressions.VecSum6.register(spark)
    graft.plans.TopKPerKey.register(spark)
    val dir = sf("sf0.001")
    val p = graft.queries.Ivf.ensureStandingFull(spark, dir)
    val delta = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 10 === 9)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    assert(delta.size >= 3, "need enough arriving queries for 3 batches")
    val mem = MemoryStream[(Long, Array[Float])]
    val served = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Long)]()
    val q = mem.toDF.toDF("qid", "qemb")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // stateless serving: each arriving query is answered entirely
        // within its micro-batch, against the SAME loaded index
        served ++= graft.queries.Ivf.serveBatch(spark, p, batch)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        ()
      }
      .start()
    delta.grouped(math.max(1, (delta.size + 2) / 3)).foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val batchRes = graft.queries.Ivf.qStreamAnnServe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(batchRes.nonEmpty)
    assert(served.sortBy(x => (x._1, x._4)).toSeq ===
             batchRes.sortBy(x => (x._1, x._4)).toSeq,
      "micro-batch serving diverged from the one-shot batch pass")
  }

  test("watermark drops rows older than 10 minutes behind max event time") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val agg = mem.toDF.toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"n")
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append).start()

    mem.addData((1L, ts(0), 1.0), (2L, ts(2), 1.0)) // window [10:00,10:10): 2 rows
    q.processAllAvailable()
    mem.addData((3L, ts(60), 1.0))                  // watermark -> 10:50, finalizes it
    q.processAllAvailable()
    mem.addData((4L, ts(3), 9.9))                   // LATE: behind watermark -> dropped
    q.processAllAvailable()
    mem.addData((5L, ts(120), 1.0))                 // push watermark past 11:10
    q.processAllAvailable()
    q.stop()

    val out = s.table("late_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(out("2024-01-01 10:00:00.0") === 2L,
      s"late row must not be counted; got $out")
  }

  test("flatMapGroupsWithState closes sessions on event-time timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[StatefulSessions.Event]
    val q = StatefulSessions
      .sessionize(mem.toDS(), gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()

    // user 1: two events 5 min apart (one session); user 2: one event
    mem.addData(StatefulSessions.Event(1L, ts(0), 1.0),
                StatefulSessions.Event(1L, ts(5), 2.0),
                StatefulSessions.Event(2L, ts(10), 7.0))
    q.processAllAvailable()
    // advance the watermark far past every timeout
    mem.addData(StatefulSessions.Event(9L, ts(600), 0.0))
    q.processAllAvailable()
    mem.addData(StatefulSessions.Event(9L, ts(1200), 0.0))
    q.processAllAvailable()
    q.stop()

    val out = s.table("sessions_out").as[StatefulSessions.SessionClosed]
      .collect().map(r => r.userId -> ((r.n, r.sum))).toMap
    assert(out(1L) === ((2L, 3.0)), s"user 1 session wrong: $out")
    assert(out(2L) === ((1L, 7.0)), s"user 2 session wrong: $out")
  }

  test("streaming as-of enrichment: late prior view wins, purchases finalize by watermark, matches the batch face") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[AsofEnrich.Ev]
    val q = AsofEnrich.enrich(mem.toDS(), delay = "10 minutes")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(AsofEnrich.outputMode).start()

    // batch 1: user 1's purchase arrives BEFORE the view that precedes
    // it in event time; user 2 is in-order
    mem.addData(AsofEnrich.Ev(1L, ts(20), 100L, "purchase"),
                AsofEnrich.Ev(1L, ts(3), 101L, "view"),
                AsofEnrich.Ev(2L, ts(2), 200L, "view"),
                AsofEnrich.Ev(2L, ts(8), 201L, "purchase"))
    q.processAllAvailable() // watermark after: 10:10
    // batch 2: user 1's TRUE prior view (10:15 < 10:20) arrives a
    // whole micro-batch late but inside the watermark — an impl that
    // answered on arrival would already have emitted prior=10:03;
    // the 10:25 view is not prior and must not win
    mem.addData(AsofEnrich.Ev(1L, ts(15), 102L, "view"),
                AsofEnrich.Ev(1L, ts(25), 103L, "view"))
    q.processAllAvailable() // watermark after: 10:15
    // batch 3: an even later prior view (10:19) is STILL legal (the
    // watermark is 10:15 < 10:20, the purchase is not yet finalized)
    // and must win; user 2's 10:04 view is behind the watermark ->
    // dropped by Spark before the state fn (and user 2's purchase was
    // already finalized when the watermark passed 10:08); the far
    // sentinel purchase advances the watermark past 10:20
    mem.addData(AsofEnrich.Ev(1L, ts(19), 104L, "view"),
                AsofEnrich.Ev(2L, ts(4), 202L, "view"),
                AsofEnrich.Ev(9L, ts(120), 900L, "purchase"))
    q.processAllAvailable()
    mem.addData(AsofEnrich.Ev(9L, ts(240), 901L, "purchase"))
    q.processAllAvailable() // no-data/timeout batches finalize u1
    q.stop()

    def us(minute: Int): Long = ts(minute).getTime * 1000L
    val got = s.table("asof_out").as[AsofEnrich.Enriched].collect()
      .map(e => e.eventId -> ((e.userId, e.tsu, e.priorViewTsu))).toMap
    assert(got(100L) === ((1L, us(20), Some(us(19)))),
      s"the latest in-watermark prior view (10:19) must win: $got")
    assert(got(201L) === ((2L, us(8), Some(us(2)))), s"u2 wrong: $got")
    // sentinel 900 (12:00) finalizes once sentinel 901 pushes the
    // watermark to 13:50, with no prior view; 901 itself stays OPEN
    // (the watermark never passes 14:00) and must not be emitted —
    // Append emitted exactly one row per finalized purchase
    assert(got(900L) === ((9L, us(120), None)), s"sentinel wrong: $got")
    assert(got.keySet === Set(100L, 201L, 900L), s"unexpected emissions: $got")

    // batch-face parity on the surviving rows (everything except the
    // watermark-dropped 10:04 view), restricted to finalized
    // purchases: the same (event_id, user_id, tsu, prior) triples
    val surviving = Seq(
      (100L, 1L, ts(20), "purchase"), (101L, 1L, ts(3), "view"),
      (200L, 2L, ts(2), "view"), (201L, 2L, ts(8), "purchase"),
      (102L, 1L, ts(15), "view"), (103L, 1L, ts(25), "view"),
      (104L, 1L, ts(19), "view"),
      (900L, 9L, ts(120), "purchase"), (901L, 9L, ts(240), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsu")
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val batch = surviving
      .select($"event_id", $"user_id", $"event_type",
              unix_micros($"ts").as("tsu"))
      .withColumn("prior_view_tsu",
        max(when($"event_type" === "view", $"tsu")).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"tsu", $"prior_view_tsu")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    got.foreach { case (id, row) =>
      assert(batch(id) === row,
        s"stream/batch divergence on finalized purchase $id")
    }
  }

  test("two-stream as-of join: lagging view stream holds back finalization; both-side lateness matches the batch face") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val pMem = MemoryStream[AsofJoin.Purchase]
    val vMem = MemoryStream[AsofJoin.View]
    val q = AsofJoin.join(pMem.toDS(), vMem.toDS(), delay = "10 minutes")
      .writeStream.format("memory").queryName("asofjoin_out")
      .outputMode(AsofJoin.outputMode).start()

    // batch 1: the PURCHASE stream races far ahead (its own watermark
    // candidate passes 10:20), but the view stream has produced
    // nothing — the operator watermark is the MIN of the two, so the
    // purchase must NOT finalize yet (a prior view may still arrive
    // on the lagging stream)
    pMem.addData(AsofJoin.Purchase(1L, ts(20), 100L),
                 AsofJoin.Purchase(1L, ts(40), 105L))
    q.processAllAvailable()
    assert(s.table("asofjoin_out").count() === 0L,
      "purchase finalized while the view stream's watermark lagged")
    // batch 2: the view stream catches up — u1's true prior view
    // (10:15) arrives a whole trigger late, plus a same-microsecond
    // tie pair (10:15, id 97) that the (tsu, id) order must break
    // toward the larger id, and a not-prior view at 10:25
    vMem.addData(AsofJoin.View(1L, ts(15), 96L),
                 AsofJoin.View(1L, ts(15), 97L),
                 AsofJoin.View(1L, ts(25), 98L),
                 AsofJoin.View(2L, ts(2), 200L))
    q.processAllAvailable() // min watermark still behind 10:20
    // batch 3: BOTH sides advance their watermarks past every open
    // purchase (sentinel rows at 12:00+), finalizing u1
    pMem.addData(AsofJoin.Purchase(9L, ts(120), 900L))
    vMem.addData(AsofJoin.View(9L, ts(120), 901L))
    q.processAllAvailable()
    pMem.addData(AsofJoin.Purchase(9L, ts(240), 902L))
    vMem.addData(AsofJoin.View(9L, ts(240), 903L))
    q.processAllAvailable()
    q.stop()

    def us(minute: Int): Long = ts(minute).getTime * 1000L
    val got = s.table("asofjoin_out").as[AsofJoin.Joined].collect()
      .map(e => e.eventId -> ((e.userId, e.tsu, e.viewId, e.viewTsu)))
      .toMap
    // the late-arriving 10:15 tie pair: id 97 wins (tsu DESC, id DESC)
    assert(got(100L) === ((1L, us(20), Some(97L), Some(us(15)))),
      s"late prior view / tie-break wrong: $got")
    // the 10:40 purchase sees 10:25 as its latest prior view
    assert(got(105L) === ((1L, us(40), Some(98L), Some(us(25)))),
      s"second purchase wrong: $got")
    // sentinel purchase at 12:00 finalizes with its co-timed view NOT
    // matching (strictly prior required)
    assert(got(900L) === ((9L, us(120), None, None)), s"sentinel: $got")
    assert(got.keySet === Set(100L, 105L, 900L),
      s"unexpected emissions: $got")

    // batch-face parity on all surviving rows, finalized purchases only
    val events = Seq(
      (100L, 1L, ts(20), "purchase"), (105L, 1L, ts(40), "purchase"),
      (96L, 1L, ts(15), "view"), (97L, 1L, ts(15), "view"),
      (98L, 1L, ts(25), "view"), (200L, 2L, ts(2), "view"),
      (900L, 9L, ts(120), "purchase"), (901L, 9L, ts(120), "view"),
      (902L, 9L, ts(240), "purchase"), (903L, 9L, ts(240), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsu")
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val batch = events
      .select($"event_id", $"user_id", $"event_type",
              unix_micros($"ts").as("tsu"))
      .withColumn("pv", max(when($"event_type" === "view",
                                 struct($"tsu", $"event_id"))).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"tsu",
              $"pv.event_id".as("view_id"), $"pv.tsu".as("view_tsu"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    got.foreach { case (id, row) =>
      assert(batch(id) === row,
        s"stream/batch divergence on finalized purchase $id")
    }
  }

  test("two-stream as-of join: randomized bounded-disorder streams match the batch face (3 seeds)") {
    // randomized parity: events arrive with BOUNDED disorder (arrival
    // jitter strictly below the 10-minute watermark delay), which
    // PROVES no row can be watermark-dropped — any earlier-arrived
    // event k satisfies t_k <= t_i + 9 < t_i + 10, so the watermark
    // when i lands is at most t_i - 1. Under that invariant the
    // stream must reproduce the batch argmax EXACTLY on every
    // finalized purchase, for any batch slicing — far stronger than
    // one hand-built fixture.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    for (seed <- Seq(11L, 42L, 97L)) {
      val rnd = new scala.util.Random(seed)
      val events = (0 until 48).map { i =>
        val user = 1L + rnd.nextInt(4)
        val t = rnd.nextInt(240)
        val isView = rnd.nextInt(10) < 7
        (100L + i, user, t, isView)
      }
      val tMax = events.map(_._3).max
      // arrival order = event time + jitter in [0, 9] minutes
      val arrival = events.sortBy { case (id, _, t, _) =>
        (t + rnd.nextInt(10), id)
      }
      // 5 contiguous arrival chunks; sentinels on BOTH streams at the
      // end advance the min watermark past every real purchase
      val cuts = Seq.fill(4)(rnd.nextInt(arrival.size)).sorted
      val chunks = (Seq(0) ++ cuts ++ Seq(arrival.size)).sliding(2).toSeq
        .map { case Seq(a, b) => arrival.slice(a, b) }
      val pMem = MemoryStream[AsofJoin.Purchase]
      val vMem = MemoryStream[AsofJoin.View]
      val qname = s"asofjoin_prop_$seed"
      val q = AsofJoin.join(pMem.toDS(), vMem.toDS(), delay = "10 minutes")
        .writeStream.format("memory").queryName(qname)
        .outputMode(AsofJoin.outputMode).start()
      chunks.foreach { ch =>
        val vs = ch.filter(_._4).map(e => AsofJoin.View(e._2, ts(e._3), e._1))
        val ps = ch.filterNot(_._4)
          .map(e => AsofJoin.Purchase(e._2, ts(e._3), e._1))
        if (vs.nonEmpty) vMem.addData(vs: _*)
        if (ps.nonEmpty) pMem.addData(ps: _*)
        q.processAllAvailable()
      }
      pMem.addData(AsofJoin.Purchase(9L, ts(tMax + 30), 9000L))
      vMem.addData(AsofJoin.View(9L, ts(tMax + 30), 9001L))
      q.processAllAvailable()
      pMem.addData(AsofJoin.Purchase(9L, ts(tMax + 60), 9002L))
      vMem.addData(AsofJoin.View(9L, ts(tMax + 60), 9003L))
      q.processAllAvailable()
      q.stop()

      val got = s.table(qname).as[AsofJoin.Joined].collect()
        .filter(_.eventId < 9000L)
        .map(e => e.eventId -> ((e.userId, e.tsu, e.viewId, e.viewTsu)))
        .toMap
      // driver-side batch reference: latest strictly-prior view by
      // (tsu, id), over ALL real events (nothing was droppable)
      def us(minute: Int): Long = ts(minute).getTime * 1000L
      val views = events.filter(_._4)
      val want = events.filterNot(_._4).map { case (id, u, t, _) =>
        val cand = views.filter(v => v._2 == u && us(v._3) < us(t))
        val best = cand.sortBy(v => (us(v._3), v._1)).lastOption
        id -> ((u, us(t), best.map(_._1), best.map(v => us(v._3))))
      }.toMap
      assert(got.keySet === want.keySet,
        s"seed $seed: finalized set mismatch (got ${got.keySet.size} vs ${want.keySet.size})")
      got.foreach { case (id, row) =>
        assert(want(id) === row, s"seed $seed: purchase $id diverged")
      }
    }
  }

  test("readStream -> window agg -> parquet file sink with checkpoint") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val agg = mem.toDF.toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"n")
    val q = agg.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    mem.addData((1L, ts(0), 1.0), (2L, ts(2), 1.0), (3L, ts(11), 1.0))
    q.processAllAvailable()
    mem.addData((4L, ts(120), 1.0)) // watermark past both windows
    q.processAllAvailable()
    q.stop()
    val rows = s.read.parquet(outDir).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(rows("2024-01-01 10:00:00.0") === 2L, s"sink content wrong: $rows")
    assert(rows("2024-01-01 10:10:00.0") === 1L, s"sink content wrong: $rows")
  }

  test("stream-stream interval join matches the batch equivalent") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // views 3 and 7 minutes before the purchase at t=15 match (10-min
    // lookback); an 11-minute-old view and another user's view don't
    val views = Seq((1L, ts(12), 10L), (1L, ts(8), 11L),
                    (1L, ts(4), 12L), (2L, ts(13), 13L))
    val purchases = Seq((1L, ts(15), 100L), (2L, ts(40), 101L))

    val vMem = MemoryStream[(Long, Timestamp, Long)]
    val pMem = MemoryStream[(Long, Timestamp, Long)]
    vMem.addData(views: _*)
    pMem.addData(purchases: _*)
    val v = vMem.toDF.toDF("vu", "vts", "vid").withWatermark("vts", "10 minutes")
    val p = pMem.toDF.toDF("pu", "pts", "pid").withWatermark("pts", "10 minutes")
    val joined = p.join(v,
      $"pu" === $"vu" && $"vts" < $"pts" &&
        $"vts" >= $"pts" - expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjoin_out")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    q.stop()

    val got = s.table("ssjoin_out").select($"pid", $"vid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = purchases.toDF("pu", "pts", "pid")
      .join(views.toDF("vu", "vts", "vid"),
        $"pu" === $"vu" && $"vts" < $"pts" &&
          $"vts" >= $"pts" - expr("INTERVAL 10 MINUTES"))
      .select($"pid", $"vid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exp)
    assert(got === Set((100L, 10L), (100L, 11L)), s"unexpected pairs: $got")
  }

  test("LEFT OUTER stream-stream join emits the null row only after the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val vMem = MemoryStream[(Long, Timestamp, Long)]
    val pMem = MemoryStream[(Long, Timestamp, Long)]
    val v = vMem.toDF.toDF("vu", "vts", "vid").withWatermark("vts", "10 minutes")
    val p = pMem.toDF.toDF("pu", "pts", "pid").withWatermark("pts", "10 minutes")
    val joined = p.join(v,
      $"pu" === $"vu" && $"vts" < $"pts" &&
        $"vts" >= $"pts" - expr("INTERVAL 10 MINUTES"), "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssjoin_outer_out")
      .outputMode(OutputMode.Append).start()
    try {
      // purchase 100 has an in-interval view; purchase 101 has none
      vMem.addData((1L, ts(12), 10L))
      pMem.addData((1L, ts(15), 100L), (2L, ts(16), 101L))
      q.processAllAvailable()
      def snap() = s.table("ssjoin_outer_out").select($"pid", $"vid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val first = snap()
      assert(first === Set((100L, 10L)),
        s"matched row must emit immediately, unmatched must be HELD: $first")
      // advance both watermarks far past purchase 101's interval: only
      // now can the engine prove no matching view is still in flight
      vMem.addData((3L, ts(60), 11L))
      pMem.addData((3L, ts(60), 102L))
      q.processAllAvailable()
      assert(snap().contains((101L, -1L)),
        s"unmatched purchase never emitted its outer row: ${snap()}")
    } finally q.stop()
  }

  test("CDC upsert: streamed last-writer-wins state matches the batch face") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[CdcUpsert.Change]
    val q = CdcUpsert.latestState(mem.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode(CdcUpsert.outputMode).start()

    // user 1: three versions across two micro-batches, LAST arrives
    // out of order (older ts than the second) and must NOT win;
    // user 2: exact-ts tie broken by event_id
    mem.addData(CdcUpsert.Change(1L, ts(0), 10L, "view", 1.0),
                CdcUpsert.Change(2L, ts(5), 20L, "view", 5.0),
                CdcUpsert.Change(2L, ts(5), 21L, "click", 6.0))
    q.processAllAvailable()
    mem.addData(CdcUpsert.Change(1L, ts(30), 12L, "purchase", 9.0),
                CdcUpsert.Change(1L, ts(10), 11L, "click", 2.0)) // stale
    q.processAllAvailable()
    q.stop()

    // memory sink in Update mode appends each emitted change — the
    // CURRENT state per key is the row with the max (tsUs, eventId)
    val cur = s.table("cdc_out").as[CdcUpsert.Latest].collect()
      .groupBy(_.userId)
      .map { case (u, rows) => u -> rows.maxBy(r => (r.tsUs, r.eventId)) }
    assert(cur(1L).eventId === 12L, s"stale row overwrote newer state: $cur")
    assert(cur(1L).eventType === "purchase")
    assert(cur(2L).eventId === 21L, s"exact-ts tie must break by event_id: $cur")

    // batch face agrees: same winner via the max-struct plan
    val batch = Seq(
      (1L, ts(0), 10L, "view", 1.0), (2L, ts(5), 20L, "view", 5.0),
      (2L, ts(5), 21L, "click", 6.0), (1L, ts(30), 12L, "purchase", 9.0),
      (1L, ts(10), 11L, "click", 2.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .select($"user_id", struct(unix_micros($"ts").as("tsu"), $"event_id",
              $"event_type", $"value").as("st"))
      .groupBy($"user_id").agg(max($"st").as("last"))
      .select($"user_id", $"last.event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch === Map(1L -> 12L, 2L -> 21L))
  }

  test("streaming SCD2 closes versions exactly like the batch lead() face") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[CdcUpsert.Change]
    val q = CdcUpsert.scd2State(mem.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode(OutputMode.Append()).start()

    // user 1: three versions — one chain closes INSIDE a micro-batch
    // (ts 0 -> 10 in batch 2's replay order), one across batches;
    // user 2: single version stays open (never emitted)
    mem.addData(CdcUpsert.Change(1L, ts(0), 10L, "view", 1.0),
                CdcUpsert.Change(2L, ts(5), 20L, "view", 5.0))
    q.processAllAvailable()
    mem.addData(CdcUpsert.Change(1L, ts(10), 11L, "click", 2.0),
                CdcUpsert.Change(1L, ts(30), 12L, "purchase", 9.0))
    q.processAllAvailable()
    q.stop()

    val closed = s.table("scd2_out").as[CdcUpsert.Scd2].collect()
      .sortBy(v => (v.userId, v.validFromUs))
    // batch face over the same rows: the closed slice is every version
    // with a non-null valid_to
    val batch = Seq(
      (1L, ts(0), 10L, "view", 1.0), (2L, ts(5), 20L, "view", 5.0),
      (1L, ts(10), 11L, "click", 2.0), (1L, ts(30), 12L, "purchase", 9.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    batch.createOrReplaceTempView("scd2_batch_rows")
    val want = s.sql(
      """SELECT user_id AS userId, event_id AS eventId,
        |  event_type AS eventType, value,
        |  unix_micros(ts) AS validFromUs,
        |  LEAD(unix_micros(ts)) OVER (PARTITION BY user_id
        |    ORDER BY unix_micros(ts), event_id) AS validToUs
        |FROM scd2_batch_rows""".stripMargin)
      .filter($"validToUs".isNotNull)
      .as[CdcUpsert.Scd2].collect().sortBy(v => (v.userId, v.validFromUs))
    assert(closed.toSeq === want.toSeq,
      s"streamed closed versions diverge from the batch lead() face")
    assert(closed.length === 2 && closed.forall(_.userId == 1L),
      "user 2's open version must not be emitted in append mode")
  }

  test("CDC tombstones delete keys and block stale resurrection") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[CdcUpsert.Change]
    val q = CdcUpsert.resolvedState(mem.toDS())
      .writeStream.format("memory").queryName("cdc_del_out")
      .outputMode(CdcUpsert.outputMode).start()

    mem.addData(CdcUpsert.Change(1L, ts(0), 10L, "view", 1.0),
                CdcUpsert.Change(2L, ts(0), 20L, "view", 2.0))
    q.processAllAvailable()
    // user 1 deleted; then a STALE pre-delete update arrives late and
    // must NOT resurrect the key
    mem.addData(CdcUpsert.Change(1L, ts(20), 12L, "error", 0.0))
    q.processAllAvailable()
    mem.addData(CdcUpsert.Change(1L, ts(10), 11L, "click", 9.0))
    q.processAllAvailable()
    q.stop()

    val cur = s.table("cdc_del_out").as[CdcUpsert.Resolved].collect()
      .groupBy(_.userId)
      .map { case (u, rows) => u -> rows.maxBy(r => (r.tsUs, r.eventId)) }
    assert(cur(1L).deleted, s"stale update resurrected a deleted key: $cur")
    assert(cur(1L).eventId === 12L)
    assert(!cur(2L).deleted && cur(2L).eventId === 20L)
  }

  test("CDC upsert resolves sub-millisecond arrivals at microsecond precision") {
    // two versions of one key inside the SAME millisecond: the later
    // MICROsecond must win even though its eventId is smaller. A
    // millisecond-resolution comparison would tie them and fall back
    // to the eventId tiebreak, picking 99 — diverging from the batch
    // face (unix_micros max-struct) and the DuckDB oracle.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def tsMicro(us: Int): Timestamp = {
      val t = Timestamp.valueOf("2024-01-01 10:00:00")
      t.setNanos(us * 1000)
      t
    }
    val rows = Seq(CdcUpsert.Change(1L, tsMicro(123), 99L, "view", 1.0),
                   CdcUpsert.Change(1L, tsMicro(999), 1L, "click", 2.0))
    val mem = MemoryStream[CdcUpsert.Change]
    val q = CdcUpsert.latestState(mem.toDS())
      .writeStream.format("memory").queryName("cdc_us_out")
      .outputMode(CdcUpsert.outputMode).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val cur = s.table("cdc_us_out").as[CdcUpsert.Latest].collect()
      .groupBy(_.userId)
      .map { case (u, rs) => u -> rs.maxBy(r => (r.tsUs, r.eventId)) }
    assert(cur(1L).eventId === 1L,
      s"sub-ms arrival resolved at ms precision (eventId tiebreak won): $cur")

    // batch face agrees at the same precision
    val batch = rows.map(c => (c.userId, c.ts, c.eventId))
      .toDF("user_id", "ts", "event_id")
      .select($"user_id", struct(unix_micros($"ts").as("tsu"), $"event_id").as("st"))
      .groupBy($"user_id").agg(max($"st").as("last"))
      .select($"user_id", $"last.event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch === Map(1L -> 1L))
    assert(cur(1L).tsUs % 1000 === 999L, s"tsUs lost microseconds: ${cur(1L)}")
  }

  test("CDC state expires by watermark+retention; late stale rows die by watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[CdcUpsert.Change]
    // 10-minute lateness, 20-minute retention: keys 1 and 2 time out
    // once the watermark passes their last change + 20 min
    val q = CdcUpsert.latestState(mem.toDS(), delay = "10 minutes",
                                  retentionMs = 20 * 60 * 1000L)
      .writeStream.format("memory").queryName("cdc_ttl_out")
      .outputMode(CdcUpsert.outputMode).start()

    def stateRows(): Long = q.recentProgress.reverse
      .find(p => p != null && p.stateOperators.nonEmpty)
      .map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)

    mem.addData(CdcUpsert.Change(1L, ts(0), 10L, "view", 1.0),
                CdcUpsert.Change(2L, ts(1), 20L, "view", 2.0))
    q.processAllAvailable()
    assert(stateRows() === 2L, s"expected 2 live keys, got ${stateRows()}")

    // advance the watermark to ts(590): far past ts(0)+20min and
    // ts(1)+20min, so both idle keys must leave state; key 9's own
    // timeout (ts(600)+20min) is still ahead of the watermark
    mem.addData(CdcUpsert.Change(9L, ts(600), 90L, "view", 0.0))
    q.processAllAvailable()
    // one more data batch so timeout processing definitely ran after
    // the watermark update (no-data batches usually cover this)
    mem.addData(CdcUpsert.Change(9L, ts(601), 91L, "view", 0.0))
    q.processAllAvailable()
    assert(stateRows() === 1L,
      s"idle keys past retention must leave state, got ${stateRows()}")

    // a LATE stale row for the expired key (event time far behind the
    // watermark) is dropped by the watermark, NOT re-admitted as a
    // fresh key — no resurrection race
    mem.addData(CdcUpsert.Change(1L, ts(5), 99L, "click", 9.9))
    q.processAllAvailable()
    q.stop()
    assert(stateRows() === 1L,
      s"late stale row re-created expired key state: ${stateRows()}")
    val key1Emits = s.table("cdc_ttl_out").as[CdcUpsert.Latest].collect()
      .filter(_.userId == 1L).map(_.eventId).toSet
    assert(key1Emits === Set(10L),
      s"late stale row for an expired key must not emit: $key1Emits")
  }

  test("SCD2 history partitions each key's timeline and agrees with the upsert face") {
    val dir = sf("sf0.001")
    val scd = graft.queries.StreamingQ.qStreamCdcScd2(spark, dir).collect()
    // exactly one current row per key, intervals chain with no gap:
    // each version's valid_to equals the next version's valid_from
    val byKey = scd.groupBy(_.getLong(0))
    byKey.foreach { case (k, rows) =>
      val cur = rows.filter(_.getBoolean(6))
      assert(cur.length == 1, s"user $k has ${cur.length} current rows")
      val sorted = rows.sortBy(r => (r.getLong(4), r.getLong(1)))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(5) && a.getLong(5) == b.getLong(4),
            s"user $k: interval chain broken at ${a.getLong(4)}")
        case _ =>
      }
      assert(sorted.last.isNullAt(5), s"user $k: last version not open-ended")
    }
    // the is_current slice IS the upsert face's state table
    val upsert = graft.queries.StreamingQ.qStreamCdcUpsert(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val currents = scd.filter(_.getBoolean(6))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(currents === upsert,
      "SCD2 current rows diverge from the upsert compaction")
  }

  test("CDC state runs on the RocksDB state store with identical results") {
    // the scalable production provider: state lives off-heap/on-disk in
    // RocksDB instead of the HDFS-backed in-memory map — the difference
    // between O(heap) and O(disk) live keys at 100 TB. Same stateful
    // logic must produce identical results under either provider.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[CdcUpsert.Change]
      val q = CdcUpsert.latestState(mem.toDS())
        .writeStream.format("memory").queryName("cdc_rocks")
        .outputMode(CdcUpsert.outputMode).start()
      mem.addData(CdcUpsert.Change(1L, ts(0), 10L, "view", 1.0),
                  CdcUpsert.Change(2L, ts(5), 20L, "view", 5.0))
      q.processAllAvailable()
      mem.addData(CdcUpsert.Change(1L, ts(30), 12L, "purchase", 9.0),
                  CdcUpsert.Change(1L, ts(10), 11L, "click", 2.0))
      q.processAllAvailable()
      // the provider actually engaged (not a silent fallback): RocksDB
      // publishes its own custom state metrics
      val ops = q.lastProgress.stateOperators
      assert(ops.nonEmpty)
      val metricKeys = ops.head.customMetrics.keySet()
      assert(metricKeys.toString.toLowerCase.contains("rocksdb"),
        s"state store is not RocksDB-backed: $metricKeys")
      q.stop()
      val cur = s.table("cdc_rocks").as[CdcUpsert.Latest].collect()
        .groupBy(_.userId)
        .map { case (u, rows) => u -> rows.maxBy(r => (r.tsUs, r.eventId)) }
      assert(cur(1L).eventId === 12L && cur(2L).eventId === 20L,
        s"RocksDB-backed state diverged: $cur")
    } finally {
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    }
  }

  test("stateful dedup collapses duplicate event ids in-stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val dedup = mem.toDF.toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy()
      .agg(count(lit(1)).as("n"))
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Complete).start()
    mem.addData((1L, ts(0), 1.0), (1L, ts(0), 1.0), (2L, ts(1), 2.0),
                (2L, ts(2), 2.0), (3L, ts(3), 3.0))
    q.processAllAvailable()
    q.stop()
    assert(s.table("dedup_out").head().getLong(0) === 3L)
  }

  test("foreachBatch sink: micro-batches land as idempotent parquet partitions") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_febatch").toString
    val mem = MemoryStream[(Long, Timestamp, Double)]
    // the standard custom-sink bridge: each micro-batch is a normal
    // DataFrame; writing it into a batch-id-keyed partition makes a
    // replayed batch overwrite itself (exactly-once on top of the
    // at-least-once contract)
    val q = mem.toDF.toDF("event_id", "ts", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/batch_id=$id")
        ()
      }
      .outputMode(OutputMode.Append).start()
    mem.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0))
    q.processAllAvailable()
    mem.addData((3L, ts(2), 3.0))
    q.processAllAvailable()
    q.stop()

    val back = s.read.parquet(s"$dir/batch_id=*")
    assert(back.count() == 3, "foreachBatch lost rows")
    assert(back.select(sum($"value")).head().getDouble(0) == 6.0)
    // at least two distinct micro-batch dirs were written
    val dirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("batch_id="))
    assert(dirs >= 2, s"expected >=2 batch partitions, found $dirs")
  }

  test("checkpoint restart: windowed state survives a stop and a new query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("rec_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rec_ckpt").toString
    val mem = MemoryStream[(Long, Timestamp, Double)]
    def start() = mem.toDF.toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"n")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    // phase 1: accumulate per-window state, emit nothing (watermark low)
    val q1 = start()
    mem.addData((1L, ts(0), 1.0), (2L, ts(2), 1.0), (3L, ts(11), 1.0))
    q1.processAllAvailable()
    q1.stop()
    // phase 2: a NEW query on the same checkpoint — the advancing
    // watermark must close the phase-1 windows with their FULL counts
    // (state recovered), exactly once (offsets recovered)
    val q2 = start()
    mem.addData((4L, ts(120), 1.0))
    q2.processAllAvailable()
    q2.stop()

    val rows = s.read.parquet(outDir).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(rows.size == 2, s"expected exactly the two closed windows: $rows")
    assert(rows("2024-01-01 10:00:00.0") === 2L, s"phase-1 state lost: $rows")
    assert(rows("2024-01-01 10:10:00.0") === 1L, s"phase-1 state lost: $rows")
  }

  test("file source lifecycle: checkpointed stream resumes mid-input, exactly once") {
    // the ONE streaming face MemoryStream cannot exercise: a REAL file
    // source discovering files across a stop/resume — processed-file
    // tracking and sink offsets both live in the checkpoint, so the
    // restarted query must neither re-count phase-1 files nor miss the
    // file that arrived while the query was down
    val s = spark
    import s.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("fs_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("fs_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("fs_ckpt").toString
    def land(rows: (Long, Timestamp, Double)*): Unit =
      rows.toSeq.toDF("event_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(inDir)
    land((0L, ts(0), 0.0)) // seed file also fixes the schema
    def start() = s.readStream
      .schema(s.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", "1") // several micro-batches per run
      .parquet(inDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"n")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()

    // phase 1: two more files land while the query runs, then the
    // query dies with all windows still open (watermark low)
    val q1 = start()
    land((1L, ts(2), 1.0), (2L, ts(4), 1.0))
    land((3L, ts(11), 1.0))
    q1.processAllAvailable()
    q1.stop()
    // a file arrives while NO query is running
    land((4L, ts(25), 1.0))
    // phase 2: resume from the checkpoint — must pick up the offline
    // file, close the phase-1 windows with their FULL counts, and not
    // re-count any phase-1 file
    val q2 = start()
    land((5L, ts(120), 1.0)) // pushes the watermark past every window
    q2.processAllAvailable()
    q2.stop()

    val rows = s.read.parquet(outDir).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    assert(rows.size === 3, s"expected exactly three closed windows: $rows")
    assert(rows("2024-01-01 10:00:00.0") === 3L,
      s"phase-1 state lost or double-counted on resume: $rows")
    assert(rows("2024-01-01 10:10:00.0") === 1L, s"window 10:10 wrong: $rows")
    assert(rows("2024-01-01 10:20:00.0") === 1L,
      s"file landed while the query was down was missed: $rows")
  }

  test("stream-static enrichment join: stream result equals batch result") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = graft.queries.StreamingQ.enrichDim(s)
    val rows = Seq(
      (1L, ts(0), "view", 1.0), (2L, ts(5), "click", 2.0),
      (3L, ts(12), "purchase", 3.0), (4L, ts(61), "view", 4.0),
      (5L, ts(65), "error", 5.0))

    def enrich(df: org.apache.spark.sql.DataFrame) =
      df.join(broadcast(dim), "event_type")
        .groupBy(window($"ts", "10 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value" * $"weight").as("ws"))

    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    mem.addData(rows: _*)
    val q = enrich(mem.toDF.toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Complete).start()
    q.processAllAvailable()
    q.stop()

    val got = s.table("enrich_out")
      .select($"window.start", $"event_type", $"n", $"ws").collect().toSet
    val exp = enrich(rows.toDF("event_id", "ts", "event_type", "value"))
      .select($"window.start", $"event_type", $"n", $"ws").collect().toSet
    assert(got === exp)
  }

  test("windowed top-k: streamed windowed counts rank like the batch face") {
    // q_stream_topk's streaming lifecycle: the watermarked windowed agg
    // runs in the stream; the per-window top-3 ranks each micro-batch's
    // complete-mode state. Parity = ranking the streamed agg equals
    // ranking the batch agg on the same rows.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Seq(
      (1L, ts(0), "view"), (2L, ts(1), "view"), (3L, ts(2), "click"),
      (4L, ts(3), "click"), (5L, ts(4), "click"), (6L, ts(5), "purchase"),
      (7L, ts(6), "error"), (8L, ts(61), "view"), (9L, ts(62), "signup"))

    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData(rows: _*)
    val q = mem.toDF.toDF("event_id", "ts", "event_type")
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("topk_in")
      .outputMode(OutputMode.Complete).start()
    q.processAllAvailable()
    q.stop()

    def top3(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"ws").orderBy($"n".desc, $"event_type".asc)
      df.select($"window.start".as("ws"), $"event_type", $"n")
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"ws", $"event_type", $"n", $"rnk")
    }
    val got = top3(s.table("topk_in")).collect().toSet
    val exp = top3(rows.toDF("event_id", "ts", "event_type")
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))).collect().toSet
    assert(got === exp)
    // the first 10-min window holds 4 distinct types (view, click,
    // purchase, error) — the cut must keep exactly 3 of them
    val firstWinRows = got.toSeq
      .filter(_.getAs[java.sql.Timestamp]("ws") === ts(0))
    assert(firstWinRows.size === 3,
      s"first window kept ${firstWinRows.size} of 4 types, expected 3")
    // and best-first: click (n=3) must rank 1
    val r1 = firstWinRows.find(_.getAs[Int]("rnk") == 1).get
    assert(r1.getAs[String]("event_type") === "click")
  }

  test("windowed theta sketch: multi-batch union bytes == one batch pass; retention exact in exact mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    graft.expressions.ThetaOps.register(s)
    // 3 windows with controlled overlap; split across three addData
    // calls so incremental execution must theta-union partial state
    // across micro-batches — the set-operable streaming property
    val rows = (0 until 90).map { i =>
      (i.toLong, ts(i), (i % 17 + (i / 30) * 5).toLong)
    }
    val mem = MemoryStream[(Long, Timestamp, Long)]
    def thAgg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window($"ts", "30 minutes"))
      .agg(expr("graft_theta_agg(user_id, 12)").as("sk"),
           count(lit(1)).as("n"))
    val q = thAgg(mem.toDF.toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("theta_stream_out")
      .outputMode(OutputMode.Complete).start()
    rows.grouped(30).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    def byWindow(df: org.apache.spark.sql.DataFrame) =
      df.select($"window.start", $"sk", $"n").collect()
        .map(r => r.getTimestamp(0) -> ((r.getAs[Array[Byte]](1), r.getLong(2))))
        .toMap
    val got = byWindow(s.table("theta_stream_out"))
    val batch = byWindow(thAgg(rows.toDF("event_id", "ts", "user_id")))
    assert(got.keySet === batch.keySet)
    assert(got.size === 3, s"fixture should span 3 windows: ${got.keySet}")
    got.foreach { case (w, (sk, n)) =>
      assert(n === batch(w)._2)
      assert(java.util.Arrays.equals(sk, batch(w)._1),
        s"window $w: incremental theta union not byte-identical to batch")
    }
    // registered query: per-window user cardinalities are far below
    // 2^12, so the sketch is in EXACT mode — retention estimates must
    // EQUAL the exact hour-over-hour distinct intersections
    val dir = sf("sf0.001")
    val est = graft.queries.StreamingQ.qStreamThetaRetention(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(est.nonEmpty, "no consecutive-hour windows at sf0.001")
    val users = graft.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(collect_set(col("user_id")).as("us"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("us"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    est.foreach { case (ws, (cur, nxt, ret)) =>
      val exCur = users(ws)
      val exNxt = users(ws + 3600L)
      assert(cur === exCur.size.toLong, s"window $ws cardinality drifted")
      assert(nxt === exNxt.size.toLong, s"window ${ws + 3600} cardinality drifted")
      assert(ret === (exCur & exNxt).size.toLong,
        s"window $ws retention estimate not exact in exact mode")
    }
  }

  test("CDC feed -> versioned table -> reader: streaming commits serve the same snapshots as the batch face") {
    // the q_stream_cdc_lakehouse handoff pin: the SAME chain the batch
    // face builds (commit 1 = first-half state, commit 2 = changed
    // keys), but driven by the REAL stream — CdcUpsert.latestState in
    // Update mode, each micro-batch's emitted changes committed as
    // parquet files by foreachBatch (exactly a streaming upsert
    // writer). Reading the chain back must reproduce the batch truth:
    // snapshot 1 == batch state of the prefix, snapshot 2 (commits
    // resolved last-writer-wins) == batch state of the whole feed.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_lake").toString
    val committed = scala.collection.mutable.ArrayBuffer.empty[String]
    val mem = MemoryStream[CdcUpsert.Change]
    val q = CdcUpsert.latestState(mem.toDS())
      .writeStream
      .outputMode(CdcUpsert.outputMode)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CdcUpsert.Latest],
                       id: Long) =>
        // a watermark-advance micro-batch can be empty — a real writer
        // skips the commit (an empty commit is not a snapshot)
        if (!b.isEmpty) {
          val path = s"$dir/c$id"
          b.coalesce(1).write.mode("overwrite").parquet(path)
          committed += path: Unit
        }
      }.start()
    // first half of the feed: u1 has two versions (argmax inside the
    // commit), u2 an exact-ts tie broken by event_id
    mem.addData(CdcUpsert.Change(1L, ts(0), 10L, "view", 1.0),
                CdcUpsert.Change(1L, ts(2), 11L, "click", 2.0),
                CdcUpsert.Change(2L, ts(5), 20L, "view", 5.0),
                CdcUpsert.Change(2L, ts(5), 21L, "click", 6.0))
    q.processAllAvailable()
    val commit1 = committed.toSeq
    // second half: u1 changes, u3 is new, and u2 receives a STALE row
    // (older ts than its current state) — the state must not move, and
    // the stream re-emits u2's unchanged state into commit 2: an
    // upsert commit is idempotent under last-writer-wins resolve, so
    // the snapshot contract is unaffected
    mem.addData(CdcUpsert.Change(1L, ts(30), 12L, "purchase", 9.0),
                CdcUpsert.Change(3L, ts(40), 30L, "signup", 7.0),
                CdcUpsert.Change(2L, ts(1), 22L, "view", 0.5))
    q.processAllAvailable()
    q.stop()
    val commit2 = committed.toSeq
    assert(commit1.nonEmpty && commit2.size > commit1.size,
      s"expected two non-empty commits, got $commit2")

    // reader-side merge-on-read resolve, identical to the face's
    def resolve(paths: Seq[String]): Map[Long, (Long, String, Double)] =
      s.read.parquet(paths: _*)
        .groupBy($"userId")
        .agg(max(struct($"tsUs", $"eventId", $"eventType", $"value")).as("st"))
        .select($"userId", $"st.eventId", $"st.eventType", $"st.value")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3)))
        .toMap
    val snap1 = resolve(commit1)
    val snap2 = resolve(commit2)
    // batch truth for the prefix and the full feed
    assert(snap1 === Map(1L -> (11L, "click", 2.0),
                         2L -> (21L, "click", 6.0)),
      s"snapshot 1 diverged from the batch prefix state: $snap1")
    assert(snap2 === Map(1L -> (12L, "purchase", 9.0),
                         2L -> (21L, "click", 6.0),
                         3L -> (30L, "signup", 7.0)),
      s"snapshot 2 diverged from the batch full state (stale row moved state?): $snap2")
    // the incremental consumer (commit 2 alone) sees every touched
    // key's CURRENT state — never the stale arrival
    val delta = resolve(commit2.diff(commit1))
    assert(delta.keySet.contains(1L) && delta.keySet.contains(3L),
      s"commit 2 lost a changed key: $delta")
    assert(delta(1L) === (12L, "purchase", 9.0) &&
           delta(3L) === (30L, "signup", 7.0) &&
           delta.get(2L).forall(_ == (21L, "click", 6.0)),
      s"commit 2 carries a stale state: $delta")
  }
}
