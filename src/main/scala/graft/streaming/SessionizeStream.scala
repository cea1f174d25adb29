package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An event entering the streaming sessionizer. */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)

/** Open-session state per user (epoch seconds). */
final case class OpenSession(start: Long, last: Long, n: Long)

/** A closed session emitted downstream. */
final case class ClosedSession(user_id: Long, n_events: Long, dur_sec: Long)

/** Streaming twin of [[graft.operators.RelationalQueries.sessionize]]:
  * 30-minute-gap sessionization with per-user state kept in
  * `flatMapGroupsWithState`. A session closes when a later event arrives
  * more than `gapSec` after the session's last event; the still-open
  * session stays in state across micro-batches.
  *
  * Scale: state is one 3-long struct per ACTIVE user; each micro-batch
  * shuffles only its own events once, keyed by user_id — the identical
  * partitioning the batch window plan uses. Events inside a micro-batch
  * are buffered and sorted per user (bounded by trigger size); across
  * batches, event-time order is assumed (pair with a watermark +
  * dropped-late-data policy in production; the batch twin is the
  * oracle-checked semantics).
  */
object SessionizeStream {
  val DefaultGapSec = 1800L

  def sessionize(events: Dataset[SessionEvent], gapSec: Long = DefaultGapSec)
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val sorted = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = Vector.newBuilder[ClosedSession]
          var open = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000
            open match {
              case Some(s) if t - s.last > gapSec =>
                closed += ClosedSession(uid, s.n, s.last - s.start)
                open = Some(OpenSession(t, t, 1))
              case Some(s) =>
                open = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
              case None =>
                open = Some(OpenSession(t, t, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
