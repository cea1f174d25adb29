package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An event entering the streaming sessionizer. */
final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)

/** Open per-user session intervals in state (epoch seconds). */
final case class OpenSession(start: Long, last: Long, n: Long)

/** A closed session emitted downstream, once no admissible event can
  * still extend it. */
final case class ClosedSession(user_id: Long, session_start: Long,
    session_end: Long, n_events: Long, dur_sec: Long)

/** Streaming twin of [[graft.operators.RelationalQueries.sessionize]]:
  * 30-minute-gap sessionization with per-user state in
  * `flatMapGroupsWithState` under an EVENT-TIME TIMEOUT.
  *
  * Semantics: exact-gap events stay IN-session (the measured rule the
  * batch lag form, `session_window`, and the DuckDB oracle all
  * implement). Each user's state holds its OPEN session intervals; an
  * incoming event either extends a session it is within `gapSec` of, or
  * opens a new one — by INTERVAL MERGE, so a late bridging event
  * correctly FUSES the two provisional sessions it bridges (a naive
  * extend-the-latest fold under-merges exactly that case, and silently
  * assumes cross-batch event-time order). A session is emitted exactly
  * once, when the event-time watermark passes its end + gap: after
  * that, no event the watermark contract still admits could extend it —
  * including the IDLE user's final session, which a data-driven close
  * (only emit when a LATER event arrives) would hold open forever.
  * Net: the emitted sessions converge to the batch sessionization of
  * the same event set whenever every event arrives within the
  * watermark delay (StreamingSpec asserts equality against
  * [[graft.operators.RelationalQueries.withSessionIds]] on an
  * out-of-order stream).
  *
  * Scale: state per user is its open intervals, which span at most the
  * watermark horizon — ≤ horizon/gap + 1 structs of O(1) each, at any
  * stream volume, for any bot/power user (bounded by construction, the
  * same hot-key discipline as the batch event_paths fix). Each
  * micro-batch shuffles only its own events once, keyed by user_id —
  * the batch plan's partitioning. The caller owns the watermark:
  * `events.withWatermark("ts", delay)` upstream; late events beyond it
  * are dropped by the engine's contract.
  */
object SessionizeStream {
  val DefaultGapSec = 1800L

  def sessionize(events: Dataset[SessionEvent], gapSec: Long = DefaultGapSec)
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent],
            state: GroupState[List[OpenSession]]) =>
          def emit(ss: List[OpenSession]): Iterator[ClosedSession] =
            ss.sortBy(_.start).iterator.map(s =>
              ClosedSession(uid, s.start, s.last, s.n, s.last - s.start))
          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs()
            val (closed, open) = state.get.partition(s =>
              s.last * 1000L + gapMs < wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              state.setTimeoutTimestamp(open.map(_.last).min * 1000L + gapMs + 1)
            }
            emit(closed)
          } else {
            // interval-merge the new points into the open sessions:
            // sort by start, fuse neighbors within the gap, sum counts
            val pts = it.map { e =>
              val t = e.ts.getTime / 1000L; OpenSession(t, t, 1L)
            }.toList
            val all = (state.getOption.getOrElse(Nil) ++ pts).sortBy(_.start)
            val merged = all.foldLeft(List.empty[OpenSession]) {
              case (cur :: rest, s) if s.start <= cur.last + gapSec =>
                OpenSession(cur.start, math.max(cur.last, s.last),
                  cur.n + s.n) :: rest
              case (acc, s) => s :: acc
            }.reverse
            // a session already past its timeout can coexist with new
            // data in ONE micro-batch (the watermark advanced last
            // batch; hasTimedOut is suppressed when data arrives) — it
            // closes HERE, both for correctness and because a timeout
            // timestamp at or below the watermark is rejected by the
            // engine. New points can never merge into it: their ts is
            // ≥ the watermark by the late-data contract, > its end+gap.
            val wm = state.getCurrentWatermarkMs()
            val (overdue, open) = merged.partition(s =>
              s.last * 1000L + gapMs < wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              state.setTimeoutTimestamp(open.map(_.last).min * 1000L + gapMs + 1)
            }
            emit(overdue)
          }
      }
  }
}
