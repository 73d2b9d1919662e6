package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC upsert compaction — the stateful face of
  * queries/StreamingQ.qStreamCdcUpsert: per-key last-writer-wins state
  * (winner = max (ts, eventId), the same total order as the batch
  * plan's max-struct aggregate), emitted in Update mode whenever a
  * key's current state changes. State is ONE row per live key and
  * expires `retentionMs` of event time after the key's last change
  * (EventTimeTimeout driven by the `delay` watermark), so memory is
  * O(recently-changed keys), not O(all keys ever seen). Expiry cannot
  * resurrect or corrupt a key: a row behind the watermark is dropped
  * by the watermark BEFORE the state function runs, and any accepted
  * row has ts >= watermark > expired_ts + retention, i.e. it would
  * have won the (ts, eventId) race against the expired state anyway. */
object CdcUpsert {

  final case class Change(userId: Long, ts: Timestamp, eventId: Long,
                          eventType: String, value: Double)

  /** `tsUs` is event time in MICROseconds since the epoch — the same
    * resolution as the batch face's unix_micros and the DuckDB oracle,
    * so sub-millisecond arrivals resolve identically in both faces
    * (a millisecond comparison would tie them and fall through to the
    * eventId tiebreak, diverging from batch). */
  final case class Latest(userId: Long, tsUs: Long, eventId: Long,
                          eventType: String, value: Double)

  /** Event time at microsecond precision: getTime is floor-to-ms (so
    * /1000 is the epoch second) and getNanos carries the full
    * sub-second component. */
  private def tsUs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** Compact a change stream to latest-state-per-key. Out-of-order
    * arrivals within and across micro-batches resolve identically to
    * the batch face: (tsUs, eventId) is a unique total order, so a
    * stale row can never overwrite a newer one. Rows later than
    * `delay` behind the max seen event time are dropped by the
    * watermark (the standard lateness contract); per-key state is
    * GC'd once the watermark passes last-change + `retentionMs`. */
  def latestState(changes: Dataset[Change],
                  delay: String = "10 minutes",
                  retentionMs: Long = 30 * 60 * 1000L): Dataset[Latest] = {
    val spark = changes.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Change],
               state: GroupState[Latest]): Iterator[Latest] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var cur = state.getOption.orNull
        rows.foreach { c =>
          val t = tsUs(c.ts)
          if (cur == null || t > cur.tsUs ||
              (t == cur.tsUs && c.eventId > cur.eventId))
            cur = Latest(userId, t, c.eventId, c.eventType, c.value)
        }
        state.update(cur)
        // cur.tsUs >= every arriving row's ts >= watermark, so the
        // timeout is always strictly ahead of the current watermark
        state.setTimeoutTimestamp(cur.tsUs / 1000 + retentionMs)
        Iterator.single(cur)
      }
    }

    changes
      .withWatermark("ts", delay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** OutputMode for sinks of [[latestState]]: per-key state rows are
    * re-emitted on change, which is Update-mode semantics. */
  val outputMode: OutputMode = OutputMode.Update

  /** A CLOSED SCD2 version: its validity ended at `validToUs` when the
    * key's next version arrived. */
  final case class Scd2(userId: Long, eventId: Long, eventType: String,
                        value: Double, validFromUs: Long, validToUs: Long)

  /** Streaming SCD TYPE-2 — the stateful face of
    * queries/StreamingQ.qStreamCdcScd2: per key, the OPEN version
    * lives in state; when a newer change arrives (same (tsUs, eventId)
    * total order as every CDC face), the open version is CLOSED with
    * valid_to = the newcomer's event time and EMITTED — append-mode
    * output, because a closed interval is immutable. The open
    * (is_current) version is exactly the upsert state and stays in the
    * store until superseded; a production sink reads currents from the
    * state snapshot, history from the append stream. Rows at or behind
    * the open version's (tsUs, eventId) are dropped — the same
    * stale-row rule as [[latestState]]; a batch recomputation (the
    * oracle-checked window face) is the repair path for
    * beyond-watermark stragglers, the standard lambda compromise.
    * State is one open version per live key, GC'd by the same
    * EventTimeTimeout discipline. */
  def scd2State(changes: Dataset[Change],
                delay: String = "10 minutes",
                retentionMs: Long = 30 * 60 * 1000L): Dataset[Scd2] = {
    val spark = changes.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Change],
               state: GroupState[Latest]): Iterator[Scd2] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val closed = scala.collection.mutable.ArrayBuffer.empty[Scd2]
        var cur = state.getOption.orNull
        // in-batch arrivals replay in event-time order so intra-batch
        // version chains close exactly like the batch face's lead()
        rows.toSeq.sortBy(c => (tsUs(c.ts), c.eventId)).foreach { c =>
          val t = tsUs(c.ts)
          if (cur == null) {
            cur = Latest(userId, t, c.eventId, c.eventType, c.value)
          } else if (t > cur.tsUs ||
                     (t == cur.tsUs && c.eventId > cur.eventId)) {
            closed += Scd2(userId, cur.eventId, cur.eventType, cur.value,
                           cur.tsUs, t)
            cur = Latest(userId, t, c.eventId, c.eventType, c.value)
          }
        }
        state.update(cur)
        state.setTimeoutTimestamp(cur.tsUs / 1000 + retentionMs)
        closed.iterator
      }
    }

    changes
      .withWatermark("ts", delay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** `deleted` marks a key whose latest change is a tombstone — the
    * downstream MERGE turns it into a DELETE instead of an UPSERT. */
  final case class Resolved(userId: Long, tsUs: Long, eventId: Long,
                            eventType: String, value: Double, deleted: Boolean)

  /** [[latestState]] with DELETE semantics: events whose type equals
    * `tombstoneType` delete the key when they are its latest change.
    * The winning tombstone STAYS in state until the watermark passes
    * its event time + `retentionMs` — while a stale pre-delete update
    * can still arrive (i.e. while it is within the watermark), the
    * tombstone is present to win the (tsUs, eventId) race against it,
    * matching the batch plan. Once the watermark passes, the tombstone
    * is GC'd (the standard CDC retention compromise): any row accepted
    * after that is newer than the tombstone by the watermark bound, so
    * re-creating the key is a genuine new version, not resurrection. */
  def resolvedState(changes: Dataset[Change],
                    tombstoneType: String = "error",
                    delay: String = "10 minutes",
                    retentionMs: Long = 30 * 60 * 1000L): Dataset[Resolved] = {
    val spark = changes.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Change],
               state: GroupState[Latest]): Iterator[Resolved] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var cur = state.getOption.orNull
        rows.foreach { c =>
          val t = tsUs(c.ts)
          if (cur == null || t > cur.tsUs ||
              (t == cur.tsUs && c.eventId > cur.eventId))
            cur = Latest(userId, t, c.eventId, c.eventType, c.value)
        }
        state.update(cur)
        state.setTimeoutTimestamp(cur.tsUs / 1000 + retentionMs)
        Iterator.single(
          Resolved(userId, cur.tsUs, cur.eventId, cur.eventType, cur.value,
                   cur.eventType == tombstoneType))
      }
    }

    changes
      .withWatermark("ts", delay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
