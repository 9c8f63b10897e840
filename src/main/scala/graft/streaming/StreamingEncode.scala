package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.jobs.EncodeJob
import graft.model.Page

/** Structured-Streaming front end for the encoder: page files appearing
  * under `inDir` are encoded micro-batch by micro-batch into the SAME
  * chunks+manifest layout `EncodeJob` writes for batch runs.
  *
  * The reference is batch-only (an input file per run,
  * /root/reference/src/file_io.cu:73-115) and the north_rule mandates a
  * batch job, so this surface is additive: the streaming analog of "new
  * WARC drops keep arriving". Design points:
  *
  *  - pid assignment stays consistent across micro-batches because the
  *    url-range bounds are pinned in bounds.json by the first batch and
  *    reloaded by every later one (the same mechanism batch resume uses);
  *  - each micro-batch appends its own chunks and manifest rows with its
  *    own attemptId — per-micro-batch lineage, so `stats` shows which
  *    batch produced which blocks;
  *  - `resume = false` inside foreachBatch: completed-pid skipping is a
  *    batch-resume concept; a stream legitimately appends NEW blocks to
  *    already-seen pids (chunks are self-contained, DecodeJob reads them
  *    all regardless of which batch wrote them);
  *  - end-to-end replay safety comes from the checkpoint: the file source
  *    tracks consumed input files, so a restarted query re-processes only
  *    unconsumed files. A crash INSIDE a micro-batch can leave that
  *    batch's chunks committed while the checkpoint offset is not — a
  *    restart would then re-encode that batch (duplicate blocks). The
  *    manifest's (attemptId, pid) lineage makes such duplicates visible;
  *    deduplication-on-read is the standard foreachBatch caveat and is
  *    documented rather than hidden.
  */
object StreamingEncode {

  /** Start the incremental encoder. With the default AvailableNow trigger
    * the query drains everything currently in `inDir` and stops — the
    * batch-friendly mode; pass ProcessingTime for a long-running tail. */
  def start(spark: SparkSession, inDir: String, outDir: String,
            cfg: EncodeJob.Config = EncodeJob.Config(),
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val pageSchema = Encoders.product[Page].schema
    spark.readStream
      .schema(pageSchema)
      .parquet(inDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$outDir/_stream_checkpoint")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val pages = batch.as[Page](Encoders.product[Page])
        val r = EncodeJob.run(spark, pages, outDir, cfg.copy(resume = false))
        // scalastyle:off println — operational one-liner, mirrors PipelineCli
        // Result aggregates the WHOLE manifest dir, which accumulates one
        // row set per micro-batch — label these as running totals
        println(s"""{"op":"stream-encode","batchId":$batchId,"rowsTotal":${r.rows},""" +
          s""""encBytesTotal":${r.encBytes},"manifestRowsTotal":${r.pidsEncoded}}""")
        ()
      }
      .start()
  }
}
