package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming AS-OF enrichment — the temporal-nearest state face the
  * CDC family (keyed last-writer-wins) does not cover: each streaming
  * PURCHASE is enriched with the same user's latest strictly-prior
  * VIEW, under a watermark, with out-of-order arrival in BOTH
  * directions (a purchase may arrive before the view that precedes it
  * in event time, and vice versa). Batch twin: queries/Joins.qJoinAsof
  * (the merge_asof backward face) — StreamingSpec pins multi-batch ≡
  * batch parity on late-arrival fixtures; the registered
  * `q_stream_asof` entry runs the batch twin against the DuckDB
  * correlated-subquery oracle.
  *
  * Correctness argument (the part a naive "look up current state on
  * arrival" gets wrong): a purchase at event time `tp` can only be
  * FINALIZED once the watermark has passed `tp` — until then a view
  * with `tv < tp` may still legally arrive (any arrival must satisfy
  * `ts >= watermark`, so once `watermark >= tp` every future view has
  * `tv >= tp`, i.e. is not strictly prior, and the answer is stable).
  * Emitting on arrival instead would silently mis-enrich every
  * purchase whose prior view crosses a micro-batch boundary late —
  * the exact fixture StreamingSpec drives.
  *
  * State is BOUNDED, the property that makes the face runnable on a
  * 100 TB stream: views at or below the watermark can never tell
  * apart two still-open purchases (both have `tp > watermark`), so
  * only their MAXIMUM matters — they compact to ONE long per key
  * (`compactedViewTsu`); only above-watermark views and not-yet-
  * finalized purchases are held individually, and the watermark
  * finalizes/compacts them away every time it advances. Per-key state
  * is O(events inside the lateness window), independent of stream
  * length. An idle key's residue (the single compacted long) expires
  * `retentionMs` after its last activity via EventTimeTimeout, like
  * [[CdcUpsert]].
  *
  * Reference note: SURVEY.md §0 citation taxonomy — the as-of
  * semantics follow pandas merge_asof(direction='backward') and the
  * batch face's DuckDB oracle; the watermark finalization contract is
  * Structured Streaming's standard lateness rule. */
object AsofEnrich {

  /** One stream row: a view or a purchase (eventType selects). */
  final case class Ev(userId: Long, ts: Timestamp, eventId: Long,
                      eventType: String)

  /** One finalized enrichment — schema-identical to the batch face's
    * (event_id, user_id, tsu, prior_view_tsu) row. priorViewTsu is
    * None for a purchase with no prior view. */
  final case class Enriched(eventId: Long, userId: Long, tsu: Long,
                            priorViewTsu: Option[Long])

  /** Per-key buffered state. `compactedViewTsu` = max view tsu already
    * at/below some past watermark (Long.MinValue = none); `views` =
    * individual view tsus still above the watermark; `purchases` =
    * (tsu, eventId) of purchases awaiting finalization. */
  final case class Buf(compactedViewTsu: Long, views: List[Long],
                       purchases: List[(Long, Long)])

  /** Microsecond event time (getTime floors to ms; getNanos carries
    * the sub-second component) — same resolution as the batch face's
    * unix_micros. */
  private def tsUs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** Enrich a purchase stream with latest-prior-view, Append mode.
    * Rows later than `delay` behind max event time are dropped by the
    * watermark; a finalized purchase is emitted exactly once. */
  def enrich(events: Dataset[Ev],
             delay: String = "10 minutes",
             retentionMs: Long = 30 * 60 * 1000L): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Ev],
               state: GroupState[Buf]): Iterator[Enriched] = {
      val prev = state.getOption.getOrElse(Buf(Long.MinValue, Nil, Nil))
      var views = prev.views
      var purchases = prev.purchases
      rows.foreach { e =>
        val t = tsUs(e.ts)
        if (e.eventType == "view") views ::= t
        else if (e.eventType == "purchase") purchases ::= (t, e.eventId)
      }
      // watermark in ms; compare in us. getCurrentWatermarkMs is 0
      // before the first batch completes — Long.MinValue semantics
      // (nothing finalizable) hold because no tsu is <= 0 * 1000 in
      // the fixtures and testdata (all post-1970).
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (done, open) = purchases.partition(_._1 <= wmUs)
      val out = done.sortBy(p => (p._1, p._2)).map { case (tp, id) =>
        // all views with tv < tp have arrived (future ones are >= wm
        // >= tp); candidates = compacted max + individual views
        val cand = (prev.compactedViewTsu :: views).filter(_ < tp)
        Enriched(id, userId, tp, cand.maxOption.filter(_ != Long.MinValue))
      }
      // views at/below the watermark collapse to their max: every
      // still-open purchase has tp > wm, so only the max can win
      val (oldViews, newViews) = views.partition(_ <= wmUs)
      val compacted = (prev.compactedViewTsu :: oldViews).max
      // a timeout that fired with NOTHING pending at entry was the
      // retention timer — the compacted residue has outlived its
      // usefulness window and must be GC'd (a finalize-timer always
      // finds pending purchases/views at entry, so it never lands
      // here and can't evict a view a near-future purchase still
      // needs within retention)
      val retentionExpiry = state.hasTimedOut &&
        prev.purchases.isEmpty && prev.views.isEmpty
      if (retentionExpiry ||
          (open.isEmpty && newViews.isEmpty && compacted == Long.MinValue)) {
        state.remove()
      } else {
        state.update(Buf(compacted, newViews, open))
        if (open.nonEmpty || newViews.nonEmpty)
          // re-invoke as soon as the watermark can finalize the next
          // pending row (timeout fires when wm passes the timestamp)
          state.setTimeoutTimestamp(
            (open.map(_._1) ++ newViews).min / 1000L + 1L)
        else
          // only the compacted residue left: expire it after retention
          state.setTimeoutTimestamp(wmUs / 1000L + retentionMs)
      }
      out.iterator
    }

    events
      .withWatermark("ts", delay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Finalized rows are emitted once and never revised: Append. */
  val outputMode: OutputMode = OutputMode.Append
}
