package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.jobs.{DecodeJob, EncodeJob, VerifyJob}
import graft.model.Page
import graft.sources.WebtextGen

/** Streaming front end: two arrivals of page files, two micro-batch
  * drains, one coherent chunks+manifest output that decodes and verifies
  * against the union of all input — with pid assignment consistent
  * across batches (pinned bounds) and per-batch lineage in the manifest. */
class StreamingEncodeSpec extends AnyFunSuite with SparkFixture {

  test("incremental encode over arriving files round-trips and keeps lineage") {
    import spark.implicits._
    val inDir = tmpDir("graft-stream-in")
    val outDir = tmpDir("graft-stream-out")
    val cfg = EncodeJob.Config(numPartitions = 4)

    val all = WebtextGen.pages(spark, 600L, partitions = 2).collect()
    val (first, second) = all.splitAt(300)

    // a "drop" = one flat parquet file landing in inDir (the file stream
    // source lists inDir non-recursively, like WARC files arriving)
    def drop(pages: Seq[Page], name: String): Unit = {
      val stage = tmpDir("graft-stream-stage")
      spark.createDataset(pages).coalesce(1).write.parquet(s"$stage/out")
      val part = new java.io.File(s"$stage/out").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }

    // first drop arrives, stream drains it
    drop(first.toSeq, "drop1")
    StreamingEncode.start(spark, inDir, outDir, cfg).awaitTermination()

    // second drop arrives later; the checkpoint skips already-consumed files
    drop(second.toSeq, "drop2")
    StreamingEncode.start(spark, inDir, outDir, cfg).awaitTermination()

    val decoded = DecodeJob.run(spark, outDir)
    assert(decoded.count() == 600L)
    val source = spark.createDataset(all.toSeq)
    assert(VerifyJob.run(spark, source, decoded).ok)

    // per-micro-batch lineage: two attemptIds, and batch-2 pids overlap
    // batch-1 pids (streams append blocks to already-seen pids)
    val manifest = spark.read.parquet(EncodeJob.manifestDir(outDir))
    assert(manifest.select($"attemptId").distinct().count() == 2L)
    val pidsPerAttempt = manifest.groupBy($"attemptId")
      .agg(org.apache.spark.sql.functions.collect_set($"pid").as("pids"))
      .select($"pids").as[Seq[Int]].collect()
    assert(pidsPerAttempt.map(_.toSet).reduce(_ intersect _).nonEmpty)

    // bounds were pinned by batch 1 and reused by batch 2
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(EncodeJob.boundsPath(outDir))))

    // --- replay safety (the foreachBatch exactly-once pattern): simulate
    // the exact crash window — the batch's manifest committed but the
    // streaming offset commit not — by deleting the newest commit marker.
    // The restarted query re-delivers that batch under the SAME batchId;
    // its "batch-<id>" attemptId is already in the manifest, so it must be
    // skipped: no duplicate blocks, decode count unchanged.
    val commits = new java.io.File(s"$outDir/_stream_checkpoint/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    java.nio.file.Files.delete(commits.last.toPath)
    // also drop the local-FS checksum sidecar, else the re-written commit
    // fails the rename as if another query owned the log
    java.nio.file.Files.deleteIfExists(
      commits.last.toPath.resolveSibling(s".${commits.last.getName}.crc"))
    // the skip must ride the O(1) committed sidecar: the whole replay
    // restart — reconcile (marker fast path) + probe + skip — launches
    // ZERO Spark jobs, so the probe's cost cannot scale with the number
    // of committed batches (same sentinel technique as EncodePipelineSpec)
    val replayJobDescs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val replayListener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        replayJobDescs.add(String.valueOf(js.properties.getProperty("spark.job.description")))
    }
    spark.sparkContext.addSparkListener(replayListener)
    try {
      StreamingEncode.start(spark, inDir, outDir, cfg).awaitTermination()
      spark.sparkContext.setJobDescription("graft-replay-sentinel")
      spark.sparkContext.parallelize(1 to 2, 1).count()
      spark.sparkContext.setJobDescription(null)
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!replayJobDescs.contains("graft-replay-sentinel") && System.nanoTime() < deadline)
        Thread.sleep(20)
      val others = scala.jdk.CollectionConverters.CollectionHasAsScala(replayJobDescs).asScala
        .filterNot(_ == "graft-replay-sentinel").toSeq
      assert(others.isEmpty,
        s"sidecar-backed replay skip launched ${others.size} jobs ($others); must be O(1) FS checks")
    } finally spark.sparkContext.removeSparkListener(replayListener)
    assert(DecodeJob.run(spark, outDir).count() == 600L, "replayed batch appended duplicates")
    assert(spark.read.parquet(EncodeJob.manifestDir(outDir))
      .select($"attemptId").distinct().count() == 2L)

    // --- the NARROWER crash window: batch-1's chunks committed but its
    // manifest commit lost. The replayed batch must be reconciled from
    // chunk-level lineage (chunks carry "batch-1") and then skipped —
    // not re-encoded into duplicates.
    val mPath = EncodeJob.manifestDir(outDir)
    val mdf = spark.read.parquet(mPath)
    val mSchema = mdf.schema
    val keptRows = mdf.filter($"attemptId" =!= "batch-1").collect().toSeq
    assert(keptRows.nonEmpty && keptRows.size < mdf.count())
    rmrf(mPath)
    spark.createDataFrame(spark.sparkContext.parallelize(keptRows), mSchema)
      .write.parquet(mPath)
    // a real crash in this window leaves batch-1's attempt markers behind
    // (they are only deleted AFTER the manifest commit) — restore them, so
    // the marker-gated reconcile sees the attempt as pending. It also
    // precedes the committed-sidecar touch, so the sidecar must be absent
    // too: the replay probe then exercises its manifest FALLBACK (against
    // the reconcile-rebuilt rows) and repairs the sidecar
    graft.sources.TableIO.touch(spark, s"${EncodeJob.attemptsDir(outDir)}/begin-batch-1")
    graft.sources.TableIO.touch(spark, s"${EncodeJob.attemptsDir(outDir)}/chunks-batch-1")
    graft.sources.TableIO.delete(spark, s"${EncodeJob.attemptsDir(outDir)}/committed/batch-1")
    val commits2 = new java.io.File(s"$outDir/_stream_checkpoint/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    java.nio.file.Files.delete(commits2.last.toPath)
    java.nio.file.Files.deleteIfExists(
      commits2.last.toPath.resolveSibling(s".${commits2.last.getName}.crc"))
    StreamingEncode.start(spark, inDir, outDir, cfg).awaitTermination()
    assert(DecodeJob.run(spark, outDir).count() == 600L,
      "chunk-committed/manifest-lost batch was re-encoded into duplicates")
    val reconciled = spark.read.parquet(mPath)
    assert(reconciled.filter($"attemptId" === "batch-1").count() > 0,
      "reconcile did not rebuild the lost batch-1 manifest rows under its own tag")
    assert(VerifyJob.run(spark, source, DecodeJob.run(spark, outDir)).ok)
    // the manifest-fallback hit repaired the O(1) sidecar
    assert(graft.sources.TableIO.exists(spark,
      s"${EncodeJob.attemptsDir(outDir)}/committed/batch-1"),
      "replay probe's manifest fallback did not repair the committed sidecar")

    // --- whole-checkpoint LOSS is a different failure: batch ids would
    // renumber from 0 and new data could be skipped as replays — the
    // stream must refuse to start, not silently drop data
    rmrf(s"$outDir/_stream_checkpoint")
    val ex = intercept[IllegalArgumentException] {
      StreamingEncode.start(spark, inDir, outDir, cfg)
    }
    assert(ex.getMessage.contains("no streaming checkpoint"))

    // --- the guard must see batch lineage even when the MANIFEST has
    // none: a first batch that crashed between its chunk commit and its
    // manifest commit leaves batch-tagged CHUNKS (+ markers) only — with
    // the checkpoint also lost, reconcile would rebuild them as "batch-0"
    // and the replay check would skip the NEW batch 0. Refuse instead.
    rmrf(EncodeJob.manifestDir(outDir))
    rmrf(s"${EncodeJob.attemptsDir(outDir)}/committed") // isolate each evidence source
    // (a) marker lineage alone
    graft.sources.TableIO.touch(spark, s"${EncodeJob.attemptsDir(outDir)}/chunks-batch-0")
    val exM = intercept[IllegalArgumentException] {
      StreamingEncode.start(spark, inDir, outDir, cfg)
    }
    assert(exM.getMessage.contains("batch-tagged lineage"))
    graft.sources.TableIO.delete(spark, s"${EncodeJob.attemptsDir(outDir)}/chunks-batch-0")
    // (b) committed-sidecar lineage alone (no markers, no manifest)
    graft.sources.TableIO.touch(spark, s"${EncodeJob.attemptsDir(outDir)}/committed/batch-0")
    val exS = intercept[IllegalArgumentException] {
      StreamingEncode.start(spark, inDir, outDir, cfg)
    }
    assert(exS.getMessage.contains("batch-tagged lineage"))
    rmrf(s"${EncodeJob.attemptsDir(outDir)}/committed")
    // (c) chunk-table lineage alone (no markers, no sidecars, no manifest)
    val exC = intercept[IllegalArgumentException] {
      StreamingEncode.start(spark, inDir, outDir, cfg)
    }
    assert(exC.getMessage.contains("batch-tagged lineage"))
  }

  test("tiny first micro-batch does not pin bounds; first adequate batch does, balanced") {
    import spark.implicits._
    val inDir = tmpDir("graft-stream-tiny-in")
    val outDir = tmpDir("graft-stream-tiny-out")
    val cfg = EncodeJob.Config(numPartitions = 4) // streaming pin guard: 16*4 = 64 rows

    val all = WebtextGen.pages(spark, 2010L, partitions = 2).collect()
    val (tiny, big) = all.splitAt(10)

    def drop(pages: Seq[Page], name: String): Unit = {
      val stage = tmpDir("graft-stream-tiny-stage")
      spark.createDataset(pages).coalesce(1).write.parquet(s"$stage/out")
      val part = new java.io.File(s"$stage/out").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }

    // 10-row first batch: encoded, but bounds NOT frozen
    drop(tiny.toSeq, "drop1")
    StreamingEncode.start(spark, inDir, outDir, cfg).awaitTermination()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(EncodeJob.boundsPath(outDir))),
      "a 10-row micro-batch pinned bounds")

    // 2000-row second batch: pins representative bounds, pids balanced
    drop(big.toSeq, "drop2")
    StreamingEncode.start(spark, inDir, outDir, cfg).awaitTermination()
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(EncodeJob.boundsPath(outDir))))
    val batch1 = spark.read.parquet(EncodeJob.manifestDir(outDir))
      .filter($"attemptId" === "batch-1")
      .select($"pid", $"rows").as[(Int, Long)].collect()
    assert(batch1.map(_._2).sum == 2000L)
    val mean = 2000.0 / batch1.length
    assert(batch1.map(_._2).max <= 3 * mean,
      s"pids unbalanced after pin: ${batch1.mkString(",")}")

    assert(DecodeJob.run(spark, outDir).count() == 2010L)
  }
}
