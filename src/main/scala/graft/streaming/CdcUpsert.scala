package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC upsert compaction — the stateful face of
  * queries/StreamingQ.qStreamCdcUpsert: per-key last-writer-wins state
  * (winner = max (ts, eventId), the same total order as the batch
  * plan's max-struct aggregate), emitted in Update mode whenever a
  * key's current state changes. State is ONE row per live key —
  * bounded, no event history — so memory stays O(distinct keys) at any
  * scale, and a downstream idempotent sink (foreachBatch MERGE) gets
  * exactly the "current state" table CDC consumers materialize. */
object CdcUpsert {

  final case class Change(userId: Long, ts: Timestamp, eventId: Long,
                          eventType: String, value: Double)
  final case class Latest(userId: Long, tsMs: Long, eventId: Long,
                          eventType: String, value: Double)

  /** Compact a change stream to latest-state-per-key. Out-of-order
    * arrivals within and across micro-batches resolve identically to
    * the batch face: (ts, eventId) is a unique total order, so a stale
    * row can never overwrite a newer one. */
  def latestState(changes: Dataset[Change]): Dataset[Latest] = {
    val spark = changes.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Change],
               state: GroupState[Latest]): Latest = {
      var cur = state.getOption.orNull
      rows.foreach { c =>
        val t = c.ts.getTime
        if (cur == null || t > cur.tsMs ||
            (t == cur.tsMs && c.eventId > cur.eventId))
          cur = Latest(userId, t, c.eventId, c.eventType, c.value)
      }
      state.update(cur)
      cur
    }

    changes
      .groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** OutputMode for sinks of [[latestState]]: per-key state rows are
    * re-emitted on change, which is Update-mode semantics. */
  val outputMode: OutputMode = OutputMode.Update

  /** `deleted` marks a key whose latest change is a tombstone — the
    * downstream MERGE turns it into a DELETE instead of an UPSERT. */
  final case class Resolved(userId: Long, tsMs: Long, eventId: Long,
                            eventType: String, value: Double, deleted: Boolean)

  /** [[latestState]] with DELETE semantics: events whose type equals
    * `tombstoneType` delete the key when they are its latest change.
    * The winning tombstone STAYS in state — dropping it would let a
    * stale update arriving in a later micro-batch resurrect the
    * deleted key, diverging from the batch plan where the tombstone
    * wins the same (ts, eventId) race. (A production store expires
    * tombstones once the watermark passes their event time — the
    * standard CDC retention compromise — which is when late stale
    * updates can no longer arrive.) */
  def resolvedState(changes: Dataset[Change],
                    tombstoneType: String = "error"): Dataset[Resolved] = {
    val spark = changes.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Change],
               state: GroupState[Latest]): Resolved = {
      var cur = state.getOption.orNull
      rows.foreach { c =>
        val t = c.ts.getTime
        if (cur == null || t > cur.tsMs ||
            (t == cur.tsMs && c.eventId > cur.eventId))
          cur = Latest(userId, t, c.eventId, c.eventType, c.value)
      }
      state.update(cur)
      Resolved(userId, cur.tsMs, cur.eventId, cur.eventType, cur.value,
               cur.eventType == tombstoneType)
    }

    changes
      .groupByKey(_.userId)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }
}
