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
  *  - state per user is the set of UNEXPIRED session spans (aggregates
  *    only — start/end/count/cents — never the event list). Each batch's
  *    events merge into that span set with one gap-merge sweep, so any
  *    in-batch or cross-batch arrival order produces the same spans the
  *    batch query's global sort would;
  *  - emission is purely WATERMARK-driven: a span is emitted (exactly
  *    once, append-mode) only when the watermark has passed its
  *    end + gap — from that point no admissible event can merge into it
  *    (anything close enough would be dropped as late), so the span is
  *    provably final. Finality is a PREFIX of the time-sorted span list,
  *    which is what makes the per-user ordinals exact;
  *  - state size per ACTIVE user is bounded by the watermark horizon:
  *    at most ~(delay / gap) + 1 unexpired spans (spans are separated
  *    by more than the gap), so the span store is
  *    O(active users x horizon/gap) — a configuration bound, not a
  *    data bound. A user whose spans have all been emitted retains a
  *    ~16-byte ordinal tombstone (emitted count, no spans): dropping
  *    it would restart a returning user's session_id at 1, duplicating
  *    keys — the total state is bounded by DISTINCT users seen, the
  *    same key domain the batch groupBy shuffles. Within that contract the
  *    output — spans, aggregates, AND ordinals — is EXACTLY the batch
  *    query's, for ANY event disorder the watermark admits
  *    (property-tested against random streams and random batch splits);
  *    events later than the watermark are dropped by Spark upstream,
  *    which is the one remaining divergence from an offline batch pass.
  */
object SessionizeStream extends Serializable {

  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)

  final case class SessionOut(
      user_id: Long, session_id: Long, n_events: Long,
      t_start: java.sql.Timestamp, t_end: java.sql.Timestamp, cents: Long)

  /** One session span: micro timestamps + running aggregates. New events
    * enter as point spans; the gap-merge sweep coalesces them. */
  final case class Span(start: Long, end: Long, n: Long, cents: Long)

  /** Per-user state: how many sessions were already emitted (the ordinal
    * base) + the unexpired spans, kept sorted by start. */
  final case class SessState(emitted: Long, spans: List[Span])

  private def micros(ts: java.sql.Timestamp): Long =
    graft.model.TsMicros.micros(ts)

  private def toTs(us: Long): java.sql.Timestamp =
    graft.model.TsMicros.toTs(us)

  /** Exactly Spark's `round(value * 100).cast("bigint")` arithmetic, so
    * streaming cents match the batch query on EVERY double: finite
    * values round BigDecimal HALF_UP (away from zero — math.round
    * differs on negative half-cents: -0.005 must give -1, not 0), and
    * non-finite or out-of-long-range values FAIL LOUDLY — Spark 4 runs
    * ANSI by default, so the batch query's bigint cast throws
    * CAST_OVERFLOW on them, and a streaming operator that silently
    * saturated would diverge. The previous BigDecimal.valueOf(NaN) also
    * threw, but as an opaque NumberFormatException; this one names the
    * value and the contract (the batch's poison row fails the same way,
    * and Spark replays the failed micro-batch until the input is fixed —
    * ANSI's fail-don't-corrupt semantics, not a new hazard). */
  private def cents(value: Double): Long = {
    val r = value * 100.0
    if (r.isNaN || r.isInfinite)
      throw new ArithmeticException(
        s"[CAST_OVERFLOW] event value $value: value*100 cannot be cast to BIGINT cents " +
          "(the batch qSessionize throws the same way under ANSI mode)")
    // longValueExact throws ArithmeticException on a finite out-of-range
    // product — the same overflow class ANSI raises
    java.math.BigDecimal.valueOf(r)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
  }

  /** Wire the sessionizer onto a STREAMING Dataset[Ev]; the caller
    * supplies the watermark (`events.withWatermark("ts", ...)`), which
    * the event-time timeouts require. NOT for batch Datasets: batch
    * execution never fires timeouts and discards state at the end, so
    * every user's final open session would be silently dropped — the
    * batch analog is [[graft.ops.Queries.qSessionize]]. */
  def sessions(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[SessionOut] = {
    val gapMicros = gapMinutes.toLong * 60L * 1000000L

    val fn = (userId: Long, evs: Iterator[Ev], state: GroupState[SessState]) => {
      val prev = state.getOption.getOrElse(SessState(0L, Nil))
      // ONE standard gap-merge sweep over time order: the carried spans
      // plus this batch's events (point spans) coalesce exactly the way
      // the batch query's global sort would group them — in-batch AND
      // cross-batch disorder included. One sort suffices: every merged
      // field is order-independent among equal timestamps (start=min,
      // end=max, n/cents commute).
      val evSpans = evs.toArray
        .map(e => Span(micros(e.ts), micros(e.ts), 1L, cents(e.value)))
      val merged = (prev.spans ++ evSpans)
        .sortBy(s => (s.start, s.end))
        .foldLeft(List.empty[Span]) {
          case (Nil, sp) => sp :: Nil
          case (cur :: done, sp) =>
            if (sp.start - cur.end <= gapMicros)
              // addExact: the batch analog's ANSI sum(bigint) throws on
              // Long overflow — a silently wrapped cents total here
              // would be exactly the batch divergence cents() forbids
              Span(cur.start, math.max(cur.end, sp.end),
                Math.addExact(cur.n, sp.n), Math.addExact(cur.cents, sp.cents)) :: done
            else sp :: cur :: done
        }.reverse
      // FINALITY: a span whose end + gap the watermark has strictly
      // passed (ms granularity — Spark admits events with tsMs >=
      // watermarkMs, and endGapMs < wm implies any admissible event is
      // strictly beyond the gap) can never change. Spans are pairwise
      // more-than-gap apart, so sorted-by-start == sorted-by-end and the
      // final set is a PREFIX — which keeps per-user ordinals exact.
      val wm = state.getCurrentWatermarkMs()
      val (done, open) = merged.span(sp => (sp.end + gapMicros) / 1000L < wm)
      val out = done.zipWithIndex.map { case (sp, i) =>
        SessionOut(userId, prev.emitted + 1L + i, sp.n, toTs(sp.start), toTs(sp.end), sp.cents)
      }
      val emittedTotal = prev.emitted + done.size
      if (open.isEmpty && emittedTotal == 0L) state.remove()
      else if (open.isEmpty)
        // ORDINAL TOMBSTONE, no timeout: the emitted count must outlive
        // the spans, or a user returning after an idle period would
        // restart session_id at 1 — duplicating (user_id, session_id)
        // keys and breaking exact batch parity. The retained state is
        // ~16 bytes per user ever seen — the same key domain the batch
        // query's groupBy shuffles, a bound in users rather than in
        // events (a deployment preferring TTL'd state would trade
        // ordinal continuity for it explicitly).
        state.update(SessState(emittedTotal, Nil))
      else {
        state.update(SessState(emittedTotal, open))
        // wake when the EARLIEST remaining span becomes final (+1 ms:
        // the timeout timestamp must exceed the current watermark, and
        // firing means wm >= ts > endGapMs — exactly the strict test)
        state.setTimeoutTimestamp((open.head.end + gapMicros) / 1000L + 1L)
      }
      out.iterator
    }

    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fn)
  }

  /** Operational entry point (the `sessionize-stream` CLI verb): drain
    * all currently-available event parquet under `inDir` through the
    * sessionizer (Trigger.AvailableNow — processes everything present,
    * then stops) and append the watermark-FINAL sessions to `outDir`.
    *
    * Streaming semantics, honestly: a session still open at the final
    * watermark is NOT emitted — its span stays in the checkpoint state,
    * and the next invocation with the same `ckptDir` resumes from there
    * (new files are detected by the file source's own log), emitting it
    * once later events push the watermark past its end + gap. Timeout
    * emission needs a batch to run in, so a span whose deadline passed
    * at the very end of a drain surfaces on the next invocation — the
    * standard price of append-mode finality.
    *
    * Returns the TOTAL rows now in `outDir` (cumulative across
    * invocations — the resumable-job progress number, mirroring the
    * encode manifest's whole-table totals). */
  def runFile(spark: org.apache.spark.sql.SparkSession, inDir: String, outDir: String,
      ckptDir: String, gapMinutes: Int = 30, watermarkDelayMinutes: Int = 60): Long = {
    import org.apache.spark.sql.functions.col
    implicit val evEnc = Encoders.product[Ev]
    // the streaming file source WATCHES a directory (new files = new
    // data); pointing it at a single parquet file dies later with an
    // opaque basePath error — fail with intent instead
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(spark.sessionState.newHadoopConf())
    def outCount(): Long =
      try spark.read.parquet(outDir).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    // a watched dir that does not exist yet, or holds no data files yet
    // (first tick of a scheduled drain, producers not started), is a
    // ZERO drain, not an error — the schema probe below would otherwise
    // die with an opaque 'Unable to infer schema'
    if (!fs.exists(inPath)) return outCount()
    require(fs.getFileStatus(inPath).isDirectory,
      s"sessionize-stream input must be a DIRECTORY the file source can watch, got a file: $inDir")
    // recursive probe: a Hive-partitioned producer (.partitionBy) nests
    // data files under key=value subdirectories — a top-level-only
    // listing would report such input empty FOREVER and silently never
    // sessionize it. listFiles is lazy; the walk stops at the first hit.
    // QUALIFIED base for the prefix strip: listFiles returns absolute
    // qualified paths, so a RELATIVE inDir would never strip and the
    // hidden-component filter would inspect the whole absolute path —
    // a '_'/'.'-prefixed component above inDir (or in the cwd) would
    // make a populated directory read as empty forever
    val files = fs.listFiles(inPath, true)
    val inUri = fs.makeQualified(inPath).toUri.getPath.stripSuffix("/")
    var hasData = false
    while (!hasData && files.hasNext) {
      val st = files.next()
      // every path component BELOW inDir must be visible — a file inside
      // _spark_metadata/ or a dot-directory is bookkeeping, not data
      val rel = st.getPath.toUri.getPath.stripPrefix(inUri).stripPrefix("/")
      hasData = st.getLen > 0 &&
        rel.split('/').forall(c => !c.startsWith("_") && !c.startsWith("."))
    }
    if (!hasData) return outCount()
    // static probe pins the wire schema (readStream requires one); casts
    // normalize NTZ event tables (testdata) and plain-timestamp writers
    // alike — difference-neutral under the session's pinned UTC zone
    val schema = spark.read.parquet(inDir).schema
    val evs = spark.readStream.schema(schema).parquet(inDir)
      .select(col("user_id").cast("bigint").as("user_id"),
        col("event_id").cast("bigint").as("event_id"),
        col("ts").cast("timestamp").as("ts"),
        col("value").cast("double").as("value"))
      .as[Ev]
      .withWatermark("ts", s"$watermarkDelayMinutes minutes")
    sessions(evs, gapMinutes).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
      .awaitTermination()
    // the sink's _spark_metadata makes the read consistent (only files
    // the commit log owns are visible); zero-emission first drains leave
    // no readable footprint yet
    outCount()
  }
}
