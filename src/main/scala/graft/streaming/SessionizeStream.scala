package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization over a STREAM of events via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset custom-state
  * surface. Batch analog: [[graft.ops.Queries.qSessionize]] (same
  * >30-minute-gap rule, same cents arithmetic); SessionizeStreamSpec
  * asserts the two produce identical closed sessions on the same input.
  *
  * Semantics:
  *  - sessions are per user; a gap STRICTLY greater than `gapMinutes`
  *    between consecutive events starts a new session (micro-second
  *    precision, matching the batch query and its DuckDB oracle);
  *  - a session closes and is EMITTED either when a later event of the
  *    same user arrives beyond the gap, or when the event-time watermark
  *    passes its end + gap (state timeout) — so output is append-mode
  *    and each session is emitted exactly once;
  *  - state per user is ONE open session (constant size — counters and
  *    timestamps, never the event list), so state store size is
  *    O(active users), not O(events): the property that lets this run
  *    indefinitely at web scale. Events within a micro-batch arrive
  *    unordered and are sorted inside the group function; cross-batch
  *    disorder is bounded by the configured watermark delay.
  *
  * Bounded-state tradeoff, stated explicitly: `session_id` is the
  * ordinal within one STATE LIFETIME. When a user's state is dropped
  * after a timeout (that is the bound) and the user later returns, the
  * ordinal restarts at 1 — the batch query's global per-user ordinal
  * cannot be reproduced without O(all users ever) state. Session
  * IDENTITY is therefore (user_id, t_start), which is stable; a global
  * ordinal, when needed, is a trivial batch window downstream.
  */
object SessionizeStream extends Serializable {

  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)

  final case class SessionOut(
      user_id: Long, session_id: Long, n_events: Long,
      t_start: java.sql.Timestamp, t_end: java.sql.Timestamp, cents: Long)

  /** Open-session state: micro timestamps + running aggregates +
    * per-user session counter. */
  final case class OpenSession(
      sessionId: Long, startMicros: Long, endMicros: Long, n: Long, cents: Long)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L

  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Exactly Spark's `round(value * 100)` arithmetic (BigDecimal
    * HALF_UP — away from zero), so streaming cents match the batch
    * query bit-for-bit including negative half-cent values, where
    * math.round (half-up toward +infinity) differs: -0.005 must give
    * -1, not 0. */
  private def cents(value: Double): Long =
    java.math.BigDecimal.valueOf(value * 100.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Wire the sessionizer onto a STREAMING Dataset[Ev]; the caller
    * supplies the watermark (`events.withWatermark("ts", ...)`), which
    * the event-time timeouts require. NOT for batch Datasets: batch
    * execution never fires timeouts and discards state at the end, so
    * every user's final open session would be silently dropped — the
    * batch analog is [[graft.ops.Queries.qSessionize]]. */
  def sessions(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[SessionOut] = {
    val gapMicros = gapMinutes.toLong * 60L * 1000000L

    def close(userId: Long, s: OpenSession): SessionOut =
      SessionOut(userId, s.sessionId, s.n, toTs(s.startMicros), toTs(s.endMicros), s.cents)

    val fn = (userId: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) => {
      if (evs.isEmpty && state.hasTimedOut) {
        // watermark passed end + gap: no later event can extend this
        // session — emit and drop the state
        val out = state.getOption.map(close(userId, _)).toList
        state.remove()
        out.iterator
      } else {
        val sorted = evs.toArray.sortBy(e => (micros(e.ts), e.event_id))
        var open = state.getOption
        val closed = List.newBuilder[SessionOut]
        sorted.foreach { e =>
          val m = micros(e.ts)
          open match {
            case Some(s) if m > s.endMicros + gapMicros =>
              // later than the open session by more than the gap: close
              // it, start the next
              closed += close(userId, s)
              open = Some(OpenSession(s.sessionId + 1, m, m, 1L, cents(e.value)))
            case Some(s) if m < s.startMicros - gapMicros =>
              // cross-batch STRAGGLER older than the open session by more
              // than the gap (admitted by the watermark delay): it cannot
              // belong to the open session. Emit it as its own immediate
              // session — with one open session of state we cannot revisit
              // already-emitted earlier sessions (the bounded-state
              // tradeoff; (user_id, t_start) stays the stable identity).
              // It takes the open session's ordinal, which shifts up.
              closed += SessionOut(userId, s.sessionId, 1L, toTs(m), toTs(m), cents(e.value))
              open = Some(s.copy(sessionId = s.sessionId + 1))
            case Some(s) =>
              // within the gap on EITHER side — merge, extending start
              // backwards for late events (batch sorts globally; a late
              // event inside the gap must land in the same session with
              // the same t_start)
              open = Some(s.copy(
                startMicros = math.min(s.startMicros, m),
                endMicros = math.max(s.endMicros, m),
                n = s.n + 1, cents = s.cents + cents(e.value)))
            case None =>
              open = Some(OpenSession(1L, m, m, 1L, cents(e.value)))
          }
        }
        open.foreach { s =>
          state.update(s)
          // close via timeout once the watermark passes end + gap
          state.setTimeoutTimestamp((s.endMicros + gapMicros) / 1000L + 1L)
        }
        closed.result().iterator
      }
    }

    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[OpenSession]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
