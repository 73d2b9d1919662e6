package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-stream AS-OF JOIN — purchases and views as TWO genuinely
  * separate watermarked streams, each purchase joined to the same
  * user's latest strictly-prior view's ROW (id + timestamp), not just
  * an aggregate of it. This is the temporal-join face next to
  * [[AsofEnrich]] (one self-enriching stream, max-timestamp payload)
  * and the interval stream-stream join (`q_stream_join`, which Spark's
  * built-in join covers because its condition is a range predicate —
  * the AS-OF "latest prior" condition is an argmax, which no built-in
  * stream-stream join expresses; hence flatMapGroupsWithState).
  *
  * Two-stream watermark contract: each input carries its OWN
  * `withWatermark`, and Spark's stateful operator runs at the MINIMUM
  * of the two (the default `multipleWatermarkPolicy = min`) — which is
  * exactly the correctness requirement: a purchase may only finalize
  * when no prior view can arrive on EITHER stream, so a lagging view
  * stream must hold back purchase finalization (StreamingSpec drives
  * that case: the purchase side races ahead, results wait for the
  * view side's watermark).
  *
  * Finalization rule (same argument as AsofEnrich): a purchase at
  * event time `tp` is emitted once the operator watermark passes
  * `tp` — until then a view with `tv < tp` may still legally arrive on
  * the view stream. Emitted exactly once, Append mode. The converse
  * lateness rule is enforced too: a purchase ARRIVING at/below the
  * watermark is dropped (the view state it would join against is
  * already argmax-compacted, so any answer would be best-effort, not
  * batch-equal — beyond-lateness rows get no result, exactly like
  * Spark's built-in stream-stream joins).
  *
  * State is BOUNDED per key — the 100 TB property: views at or below
  * the watermark can never be told apart by any still-open purchase
  * (all have `tp > watermark`), so only the argmax survives — they
  * compact to ONE (tsu, viewId) PAIR per key; above-watermark views
  * and open purchases are held individually and drain as the
  * watermark advances. Per-key state is O(events inside the lateness
  * window); an idle key's compacted residue expires after
  * `retentionMs` via EventTimeTimeout.
  *
  * Reference note: SURVEY.md §0 citation taxonomy — as-of semantics
  * per pandas merge_asof(direction='backward') with the matched-row
  * payload of a join; watermark finalization is Structured
  * Streaming's standard lateness rule. */
object AsofJoin {

  /** View-stream row. */
  final case class View(userId: Long, ts: Timestamp, eventId: Long)

  /** Purchase-stream row. */
  final case class Purchase(userId: Long, ts: Timestamp, eventId: Long)

  /** Internal co-partitioned union row (isView tags the source). */
  final case class Tagged(userId: Long, ts: Timestamp, eventId: Long,
                          isView: Boolean)

  /** One finalized join row — the batch face's (event_id, user_id,
    * tsu, view_id, view_tsu) row; both view fields None when no prior
    * view exists. */
  final case class Joined(eventId: Long, userId: Long, tsu: Long,
                          viewId: Option[Long], viewTsu: Option[Long])

  /** Per-key state. (compactTsu, compactId) = argmax (tsu, id) view
    * already at/below some past watermark (compactTsu = Long.MinValue
    * when none); `views` = (tsu, id) still above the watermark;
    * `purchases` = (tsu, id) awaiting finalization. */
  final case class Buf(compactTsu: Long, compactId: Long,
                       views: List[(Long, Long)],
                       purchases: List[(Long, Long)])

  private def tsUs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** (tsu, id) total order — the tie-break two same-microsecond views
    * resolve by (largest id wins), mirrored in the batch face's
    * max(struct(tsu, event_id)) and the oracle's ORDER BY ts DESC,
    * id DESC LIMIT 1. */
  private def ord(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    if (a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)) a else b

  private def update(retentionMs: Long)(
      userId: Long, rows: Iterator[Tagged],
      state: GroupState[Buf]): Iterator[Joined] = {
    val prev = state.getOption.getOrElse(
      Buf(Long.MinValue, Long.MinValue, Nil, Nil))
    var views = prev.views
    var purchases = prev.purchases
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    rows.foreach { e =>
      val t = tsUs(e.ts)
      // Spark does NOT drop below-watermark input for
      // flatMapGroupsWithState — the operator owns the lateness rule.
      // A purchase arriving with tp <= watermark would finalize
      // immediately against the already-compacted view state (views
      // with tv < tp that lost the argmax compaction are gone), so its
      // answer could silently differ from batch semantics: DROP it,
      // mirroring the finalization contract's lateness rule (a row
      // later than the allowed delay gets no result — round-17 advice
      // item). A below-watermark VIEW is safe to keep: every still-open
      // purchase has tp > wm >= tv, so folding it into the compacted
      // argmax only refines matches the same way an on-time view would.
      if (e.isView) views ::= (t, e.eventId)
      else if (t > wmUs) purchases ::= (t, e.eventId)
    }
    val (done, open) = purchases.partition(_._1 <= wmUs)
    val out = done.sortBy(identity).map { case (tp, id) =>
      val cand = ((prev.compactTsu, prev.compactId) :: views)
        .filter(_._1 < tp)
      if (cand.isEmpty) Joined(id, userId, tp, None, None)
      else {
        val (vt, vid) = cand.reduce(ord)
        if (vt == Long.MinValue) Joined(id, userId, tp, None, None)
        else Joined(id, userId, tp, Some(vid), Some(vt))
      }
    }
    // views at/below the watermark collapse to their ARGMAX pair:
    // every still-open purchase has tp > wm, so only that pair can win
    val (oldViews, newViews) = views.partition(_._1 <= wmUs)
    val (cTsu, cId) =
      ((prev.compactTsu, prev.compactId) :: oldViews).reduce(ord)
    // a timeout with nothing pending at entry is the retention timer
    // (a finalize-timer always finds pending rows at entry)
    val retentionExpiry = state.hasTimedOut &&
      prev.purchases.isEmpty && prev.views.isEmpty
    if (retentionExpiry ||
        (open.isEmpty && newViews.isEmpty && cTsu == Long.MinValue)) {
      state.remove()
    } else {
      state.update(Buf(cTsu, cId, newViews, open))
      if (open.nonEmpty || newViews.nonEmpty)
        state.setTimeoutTimestamp(
          (open.map(_._1) ++ newViews.map(_._1)).min / 1000L + 1L)
      else
        state.setTimeoutTimestamp(wmUs / 1000L + retentionMs)
    }
    out.iterator
  }

  /** Join the purchase stream against the view stream as-of-backward.
    * Each side gets its own watermark; the stateful operator runs at
    * their min. Append mode; each finalized purchase emits once. */
  def join(purchases: Dataset[Purchase], views: Dataset[View],
           delay: String = "10 minutes",
           retentionMs: Long = 30 * 60 * 1000L): Dataset[Joined] = {
    val spark = purchases.sparkSession
    import spark.implicits._
    val p = purchases
      .map(e => Tagged(e.userId, e.ts, e.eventId, isView = false))
      .withWatermark("ts", delay)
    val v = views
      .map(e => Tagged(e.userId, e.ts, e.eventId, isView = true))
      .withWatermark("ts", delay)
    p.unionByName(v)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(retentionMs))
  }

  /** Finalized rows are emitted once and never revised: Append. */
  val outputMode: OutputMode = OutputMode.Append
}
