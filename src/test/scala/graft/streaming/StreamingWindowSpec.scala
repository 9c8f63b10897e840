package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Structured Streaming windowed aggregation with a watermark: hourly
  * per-user event counts where data later than the 30-minute watermark
  * is dropped — the streaming analog of q_sessionize's batch windows.
  * Append mode emits a window only once the watermark passes its end,
  * which is exactly what makes the aggregation state bounded at scale. */
class StreamingWindowSpec extends AnyFunSuite with SparkFixture {

  test("hourly windows finalize on watermark; late data is dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[(Long, Long, Double)] // (epochSec, user, value)
    val agg = mem.toDF().toDF("epoch", "user_id", "value")
      .withColumn("ts", timestamp_seconds($"epoch"))
      .withWatermark("ts", "30 minutes")
      .groupBy(window($"ts", "1 hour").as("w"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))

    val q = agg.writeStream.format("memory").queryName("wagg")
      .outputMode("append").start()
    try {
      val h10 = 10L * 3600 // window [10:00, 11:00)
      // two users inside the 10:00 window
      mem.addData((h10 + 600, 1L, 1.0), (h10 + 1200, 1L, 2.0), (h10 + 1800, 2L, 5.0))
      q.processAllAvailable()
      // nothing finalized yet: watermark is max(ts) - 30min = 10:00
      assert(spark.table("wagg").count() == 0L)

      // an event at 12:40 pushes the watermark to 12:10 > 11:00 — the
      // 10:00 window finalizes and is emitted
      mem.addData((h10 + 2 * 3600 + 2400, 3L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("wagg")
        .select($"user_id", $"n", $"v").as[(Long, Long, Double)].collect().sorted
      assert(rows.toSeq == Seq((1L, 2L, 3.0), (2L, 1L, 5.0)))

      // late data for the finalized window (10:20 << watermark) is DROPPED:
      // no new output rows, the emitted window never changes
      mem.addData((h10 + 1200, 1L, 100.0))
      q.processAllAvailable()
      val after = spark.table("wagg")
        .select($"user_id", $"n", $"v").as[(Long, Long, Double)].collect().sorted
      assert(after.toSeq == rows.toSeq)
    } finally q.stop()
  }
}
