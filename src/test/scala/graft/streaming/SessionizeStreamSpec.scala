package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.streaming.SessionizeStream.{Ev, SessionOut}

/** Stateful-streaming sessionizer (flatMapGroupsWithState) vs the batch
  * window query: identical closed sessions on the same events, with
  * events arriving across micro-batches and sessions closing both by
  * successor-event and by watermark timeout. */
class SessionizeStreamSpec extends AnyFunSuite with SparkFixture {

  private def ts(minutes: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + minutes * 60000L)

  test("streaming sessions == batch qSessionize on the same events") {
    import spark.implicits._

    // six users, sessions split by >30-min gaps; u2's second session
    // spans the two micro-batches (state must carry across); u4's late
    // batch-2 event lands BEFORE its open span's start but within the
    // gap (must merge backwards, extending t_start); u5's batch-2
    // straggler is older than its open span by MORE than the gap (its
    // own session); u6's two batch-2 stragglers chain into ONE session;
    // u4's late event also carries a negative half-cent value
    // (HALF_UP-away-from-zero parity)
    val batch1 = Seq(
      Ev(1L, 1L, ts(0), 1.00), Ev(1L, 2L, ts(10), 2.00), // u1 s1
      Ev(2L, 3L, ts(0), 0.50),                           // u2 s1
      Ev(2L, 4L, ts(45), 1.25),                          // u2 s2 (gap 45m)
      Ev(3L, 5L, ts(5), 3.00),                           // u3 s1
      Ev(4L, 9L, ts(100), 1.00),                         // u4 s1 (so far)
      Ev(5L, 11L, ts(200), 1.00),                        // u5 s2-to-be
      Ev(6L, 13L, ts(300), 1.00))                        // u6 s2-to-be
    val batch2 = Seq(
      Ev(2L, 6L, ts(60), 0.25),    // extends u2 s2 (15m gap)
      Ev(1L, 7L, ts(55), 4.00),    // u1 s2 (45m gap)
      Ev(3L, 8L, ts(20), 1.00),    // extends u3 s1 (15m gap)
      Ev(4L, 10L, ts(80), -0.005), // LATE: merges backwards into u4 s1
      Ev(5L, 12L, ts(100), 2.00),  // STRAGGLER: own session before u5's open one
      Ev(6L, 14L, ts(0), 1.00),    // STRAGGLER CHAIN: these two must form
      Ev(6L, 15L, ts(20), 2.00))   // ONE session (20m gap), before u6's open one
    val all = batch1 ++ batch2

    // ---- batch reference: the SAME events through Queries.qSessionize
    val dir = tmpDir("graft-sess-batch")
    spark.createDataset(all).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val expected = graft.ops.Queries.qSessionize(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).getTime, r.getTimestamp(4).getTime, r.getLong(5)))
      .toSet

    // ---- streaming: two micro-batches + watermark nudges to time out
    // the still-open sessions (timeouts fire in the batch AFTER the
    // watermark advances past end + gap)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    // 400-min delay: covers the spec's cross-batch event-time disorder
    // (batch2 carries events up to 300 min older than batch1's max, and
    // the watermark would DROP anything older than max - delay); within
    // the admitted-disorder contract the output — including ordinals —
    // is exactly the batch query's (see SessionizeStream's scaladoc)
    val sessions = SessionizeStream.sessions(
      in.toDS().withWatermark("ts", "400 minutes"))
    val q = sessions.writeStream
      .format("memory").queryName("graft_sessions").outputMode("append")
      .start()
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      in.addData(batch2: _*)
      q.processAllAvailable()
      // sentinel user far in the future: advances the watermark past
      // every open session's end + gap; second nudge runs a batch UNDER
      // the advanced watermark so the timeouts actually fire
      in.addData(Ev(999L, 100L, ts(10000), 0.0))
      q.processAllAvailable()
      in.addData(Ev(999L, 101L, ts(10001), 0.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("graft_sessions").as[SessionOut]
      .collect()
      .filter(_.user_id != 999L)
      .map(s => (s.user_id, s.session_id, s.n_events,
        s.t_start.getTime, s.t_end.getTime, s.cents))
      .toSet

    assert(got == expected,
      s"streaming sessions != batch sessions\n got: $got\n exp: $expected")
    // sanity on the shape itself: u1 and u2 have 2 sessions, u3 has 1
    assert(got.count(_._1 == 1L) == 2 && got.count(_._1 == 2L) == 2 &&
      got.count(_._1 == 3L) == 1)
    // and the cross-batch session really merged: u2 s2 has 2 events
    assert(got.exists(s => s._1 == 2L && s._2 == 2L && s._3 == 2L))
    // late event merged BACKWARDS: u4's single session starts at the
    // late event's time and carries the negative half-cent (99 = 100-1)
    assert(got.exists(s => s._1 == 4L && s._3 == 2L &&
      s._4 == ts(80).getTime && s._6 == 99L))
    // straggler became its own session; u5 ends with 2 sessions
    assert(got.count(_._1 == 5L) == 2)
    // same-batch straggler CHAIN formed one 2-event session for u6
    assert(got.exists(s => s._1 == 6L && s._2 == 1L && s._3 == 2L &&
      s._4 == ts(0).getTime && s._5 == ts(20).getTime))
    assert(got.count(_._1 == 6L) == 2)
  }

  test("a user returning after full state emission keeps exact ordinals") {
    import spark.implicits._
    // user 1's only session times out and is emitted mid-stream (state
    // spans empty); the user then RETURNS long after. Without the
    // ordinal tombstone the new session would restart at session_id = 1
    // — a duplicate (user_id, session_id) key and a batch divergence.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val sessions = SessionizeStream.sessions(
      in.toDS().withWatermark("ts", "60 minutes"))
    val q = sessions.writeStream
      .format("memory").queryName("graft_sessions_tomb").outputMode("append")
      .start()
    try {
      in.addData(Ev(1L, 1L, ts(0), 1.0))
      q.processAllAvailable()
      // sentinel batches: advance the watermark past 0 + gap, then run a
      // batch under it so user 1's timeout fires and its state empties
      in.addData(Ev(999L, 2L, ts(500), 0.0))
      q.processAllAvailable()
      in.addData(Ev(999L, 3L, ts(501), 0.0))
      q.processAllAvailable()
      // the returning user: a fresh, non-late session
      in.addData(Ev(1L, 4L, ts(600), 2.0))
      q.processAllAvailable()
      in.addData(Ev(999L, 5L, ts(2000), 0.0))
      q.processAllAvailable()
      in.addData(Ev(999L, 6L, ts(2001), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("graft_sessions_tomb").as[SessionOut]
      .collect().filter(_.user_id == 1L)
      .map(s => (s.session_id, s.t_start.getTime)).sortBy(_._2).toSeq
    assert(got.map(_._1) == Seq(1L, 2L),
      s"returning user's ordinals wrong (session_id restarted?): $got")
    // and the ordinals match the batch query over the same full history
    val dir = tmpDir("graft-sess-tomb")
    spark.createDataset(Seq(
        Ev(1L, 1L, ts(0), 1.0), Ev(1L, 4L, ts(600), 2.0)))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batch = graft.ops.Queries.qSessionize(spark, dir)
      .collect().map(r => (r.getLong(1), r.getTimestamp(3).getTime)).sortBy(_._2).toSeq
    assert(got == batch, s"streaming $got != batch $batch")
  }

  test("randomized equivalence: streaming == batch for random events and batch splits") {
    import spark.implicits._
    // With a watermark delay exceeding the whole event span, nothing is
    // dropped and no state times out mid-stream — streaming output must
    // then equal the batch query EXACTLY (including ordinals), whatever
    // the batch split. Deterministic seeds; two trials keep suite time
    // bounded while varying both event shape and split shape.
    for (seed <- Seq(11L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val events = (1 to 120).map { i =>
        Ev(user_id = 1L + rnd.nextInt(6),
          event_id = i.toLong,
          // minutes 0..600, micro-jitter via seconds so ties are rare but
          // sub-minute gaps occur
          ts = ts(rnd.nextInt(600).toLong),
          value = math.round(rnd.nextDouble() * 400 - 100) / 100.0)
      }
      val dir = tmpDir(s"graft-sess-rand-$seed")
      spark.createDataset(events).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val expected = graft.ops.Queries.qSessionize(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getTimestamp(3).getTime, r.getTimestamp(4).getTime, r.getLong(5)))
        .toSet

      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
      val qname = s"graft_sessions_rand_$seed"
      val q = SessionizeStream.sessions(
          in.toDS().withWatermark("ts", "700 minutes"))
        .writeStream.format("memory").queryName(qname).outputMode("append").start()
      try {
        // random contiguous split into 1..5 micro-batches
        var rest = events
        while (rest.nonEmpty) {
          val take = 1 + rnd.nextInt(rest.size)
          in.addData(rest.take(take): _*)
          q.processAllAvailable()
          rest = rest.drop(take)
        }
        in.addData(Ev(999L, 9000L, ts(100000), 0.0))
        q.processAllAvailable()
        in.addData(Ev(999L, 9001L, ts(100001), 0.0))
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.table(qname).as[SessionOut]
        .collect()
        .filter(_.user_id != 999L)
        .map(s => (s.user_id, s.session_id, s.n_events,
          s.t_start.getTime, s.t_end.getTime, s.cents))
        .toSet
      assert(got == expected,
        s"seed=$seed diverged\n only-streaming: ${got -- expected}\n only-batch: ${expected -- got}")
    }
  }

  test("non-finite values fail LOUDLY in both engines (ANSI parity), not opaquely") {
    import spark.implicits._
    // Spark 4 runs ANSI by default: the batch query's bigint cast throws
    // CAST_OVERFLOW on a NaN event value. The streaming cents must keep
    // that contract — the old BigDecimal.valueOf(NaN) also died, but as
    // an opaque NumberFormatException; now both engines fail the poison
    // row with a named overflow error.
    val events = Seq(
      Ev(1L, 1L, ts(0), Double.NaN), Ev(1L, 2L, ts(10), 2.00))

    // batch: ANSI CAST_OVERFLOW
    val dir = tmpDir("graft-sess-nonfinite")
    spark.createDataset(events).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batchErr = intercept[Exception] {
      graft.ops.Queries.qSessionize(spark, dir).collect()
    }
    assert(batchErr.getMessage.contains("CAST_OVERFLOW"),
      s"batch failed differently: ${batchErr.getMessage}")

    // streaming: the same overflow class, with the value named
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    val q = SessionizeStream.sessions(
        in.toDS().withWatermark("ts", "400 minutes"))
      .writeStream.format("memory").queryName("graft_sessions_nf")
      .outputMode("append").start()
    val streamErr = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        in.addData(events: _*)
        q.processAllAvailable()
      } finally q.stop()
    }
    val msgs = Iterator.iterate(streamErr: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("\n")
    assert(msgs.contains("CAST_OVERFLOW") && msgs.contains("NaN"),
      s"stream failed without the named overflow error:\n$msgs")
  }

  test("runFile drains Hive-partitioned input and a not-yet-created inDir is a zero drain") {
    import spark.implicits._
    val root = tmpDir("graft-sessfile-part")
    val inDir = s"$root/in"
    val outDir = s"$root/out"
    val ckptDir = s"$root/ckpt"

    // inDir does not exist at all yet: a scheduled drain's first tick
    // must be a zero drain, not a FileNotFoundException
    assert(SessionizeStream.runFile(spark, inDir, outDir, ckptDir, 30, 60) == 0L)

    // producer writes PARTITIONED parquet (data files nested under
    // shard=N subdirectories): the old top-level-only probe reported
    // this directory empty forever and never sessionized it
    val normal = Seq(
      Ev(1L, 1L, ts(0), 1.00), Ev(1L, 2L, ts(10), 2.00), // u1 s1
      Ev(1L, 3L, ts(60), 4.00),                          // u1 s2 (50m gap)
      Ev(2L, 4L, ts(5), 0.50))                           // u2 s1
    spark.createDataset(normal)
      .withColumn("shard", org.apache.spark.sql.functions.pmod($"user_id", org.apache.spark.sql.functions.lit(2)))
      .write.partitionBy("shard").mode("append").parquet(inDir)
    SessionizeStream.runFile(spark, inDir, outDir, ckptDir, 30, 60)

    // sentinels push the watermark past every span's end + gap
    spark.createDataset(Seq(Ev(999L, 100L, ts(10000), 0.0)))
      .withColumn("shard", org.apache.spark.sql.functions.lit(1))
      .write.partitionBy("shard").mode("append").parquet(inDir)
    SessionizeStream.runFile(spark, inDir, outDir, ckptDir, 30, 60)
    spark.createDataset(Seq(Ev(999L, 101L, ts(20000), 0.0)))
      .withColumn("shard", org.apache.spark.sql.functions.lit(1))
      .write.partitionBy("shard").mode("append").parquet(inDir)
    val total = SessionizeStream.runFile(spark, inDir, outDir, ckptDir, 30, 60)

    val got = spark.read.parquet(outDir).as[SessionOut].collect()
      .filter(_.user_id != 999L)
      .map(s => (s.user_id, s.session_id, s.n_events,
        s.t_start.getTime, s.t_end.getTime, s.cents)).toSet
    assert(total > 0L, "partitioned input was never drained")

    val bDir = tmpDir("graft-sessfile-part-batch")
    spark.createDataset(normal).write.mode("overwrite").parquet(s"$bDir/events.parquet")
    val expected = graft.ops.Queries.qSessionize(spark, bDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).getTime, r.getTimestamp(4).getTime, r.getLong(5))).toSet
    assert(got == expected,
      s"partitioned drain diverged\n only-streaming: ${got -- expected}\n only-batch: ${expected -- got}")
  }

  test("runFile (CLI verb path): file-sourced drain emits batch-identical sessions and resumes open spans across invocations") {
    import spark.implicits._
    val inDir = tmpDir("graft-sessfile-in")
    val outDir = tmpDir("graft-sessfile-root") + "/out"
    val ckptDir = tmpDir("graft-sessfile-root") + "/ckpt"

    // two users, sessions split by a >30-min gap, all inside minutes
    // 0..95 — so the sentinel runs below make every one of them final
    val normal = Seq(
      Ev(1L, 1L, ts(0), 1.00), Ev(1L, 2L, ts(10), 2.00), // u1 s1
      Ev(1L, 3L, ts(60), 4.00),                          // u1 s2 (50m gap)
      Ev(2L, 4L, ts(5), 0.50),                           // u2 s1
      Ev(2L, 5L, ts(95), -0.005))                        // u2 s2 (90m gap)
    spark.createDataset(normal).write.mode("append").parquet(inDir)
    val afterRun1 = SessionizeStream.runFile(spark, inDir, outDir, ckptDir,
      gapMinutes = 30, watermarkDelayMinutes = 60)

    // sentinel events (user 999) push the watermark far past every normal
    // session's end + gap; each subsequent invocation is a data batch in
    // which the previous run's expired spans time out and emit — state
    // carries across invocations purely via the checkpoint
    spark.createDataset(Seq(Ev(999L, 100L, ts(10000), 0.0)))
      .write.mode("append").parquet(inDir)
    SessionizeStream.runFile(spark, inDir, outDir, ckptDir, 30, 60)
    spark.createDataset(Seq(Ev(999L, 101L, ts(20000), 0.0)))
      .write.mode("append").parquet(inDir)
    val total = SessionizeStream.runFile(spark, inDir, outDir, ckptDir, 30, 60)

    val outRows = spark.read.parquet(outDir).as[SessionOut].collect()
    assert(total == outRows.length.toLong, "returned total != cumulative sink rows")
    assert(total >= afterRun1, "cumulative total shrank across invocations")
    val got = outRows.filter(_.user_id != 999L)
      .map(s => (s.user_id, s.session_id, s.n_events,
        s.t_start.getTime, s.t_end.getTime, s.cents)).toSet

    // batch oracle: the SAME normal events through Queries.qSessionize
    val bDir = tmpDir("graft-sessfile-batch")
    spark.createDataset(normal).write.mode("overwrite").parquet(s"$bDir/events.parquet")
    val expected = graft.ops.Queries.qSessionize(spark, bDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).getTime, r.getTimestamp(4).getTime, r.getLong(5))).toSet
    assert(got == expected,
      s"file drain diverged\n only-streaming: ${got -- expected}\n only-batch: ${expected -- got}")
  }
}
