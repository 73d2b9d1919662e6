package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom arbitrary-state streaming operator (the prompt-level surface
  * beyond built-in windows): per-user session accumulation with
  * flatMapGroupsWithState + event-time timeout. Emits a SessionClosed
  * row once a user has been silent past the watermark — state is
  * per-key, bounded, and removed on timeout, so memory stays O(active
  * users) at any scale. */
object StatefulSessions {

  final case class Event(userId: Long, ts: Timestamp, value: Double)
  final case class SessionState(n: Long, sum: Double, startMs: Long, lastMs: Long)
  final case class SessionClosed(userId: Long, startMs: Long, endMs: Long,
                                 n: Long, sum: Double)

  /** Sessionize a (watermarked) event stream with the given gap. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionClosed] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[SessionClosed] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(SessionClosed(userId, s.startMs, s.lastMs, s.n, s.sum))
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[SessionClosed]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastMs <= gapMs =>
              cur = Some(s.copy(n = s.n + 1, sum = s.sum + e.value, lastMs = t))
            case Some(s) => // gap exceeded inside the batch: close + restart
              closed ::= SessionClosed(userId, s.startMs, s.lastMs, s.n, s.sum)
              cur = Some(SessionState(1L, e.value, t, t))
            case None =>
              cur = Some(SessionState(1L, e.value, t, t))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.lastMs + gapMs)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
