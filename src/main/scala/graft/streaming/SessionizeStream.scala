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

  /** One time interval in the per-batch gap-merge sweep: either a new
    * event (a point span) or the carried open session. */
  private final case class Span(start: Long, end: Long, n: Long, cents: Long)

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
        // ONE standard gap-merge sweep over time order: the batch's new
        // events (point spans) plus the carried open session (an interval
        // span) are merged exactly the way the batch query's global sort
        // would group them — so same-batch straggler chains, backward
        // merges, and chains that bridge INTO the open session all get
        // the batch grouping. The only irrecoverable divergence left is
        // by construction: sessions already EMITTED in earlier batches
        // cannot merge with later stragglers (the bounded-state
        // tradeoff; (user_id, t_start) stays the stable identity).
        // one sort suffices: every merged field is order-independent
        // among equal timestamps (start=min, end=max, n/cents commute)
        val evSpans = evs.toArray
          .map(e => Span(micros(e.ts), micros(e.ts), 1L, cents(e.value)))
        val spans = (state.getOption
          .map(s => Span(s.startMicros, s.endMicros, s.n, s.cents)).toList ++ evSpans)
          .sortBy(s => (s.start, s.end))
        val merged = spans.foldLeft(List.empty[Span]) {
          case (Nil, sp) => sp :: Nil
          case (cur :: done, sp) =>
            if (sp.start - cur.end <= gapMicros)
              Span(cur.start, math.max(cur.end, sp.end), cur.n + sp.n, cur.cents + sp.cents) :: done
            else sp :: cur :: done
        }.reverse
        if (merged.isEmpty) Iterator.empty
        else {
          // ordinals run sequentially from the carried session's ordinal
          // (or 1): everything but the latest span is final — nothing can
          // precede it anymore without being dropped by the watermark —
          // and the latest span becomes the new open session
          val baseId = state.getOption.map(_.sessionId).getOrElse(1L)
          val closed = merged.init.zipWithIndex.map { case (sp, i) =>
            SessionOut(userId, baseId + i, sp.n, toTs(sp.start), toTs(sp.end), sp.cents)
          }
          val last = merged.last
          val open = OpenSession(baseId + merged.size - 1, last.start, last.end, last.n, last.cents)
          state.update(open)
          // close via timeout once the watermark passes end + gap
          state.setTimeoutTimestamp((open.endMicros + gapMicros) / 1000L + 1L)
          closed.iterator
        }
      }
    }

    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[OpenSession]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }
}
