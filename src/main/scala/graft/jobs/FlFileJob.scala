package graft.jobs

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.codec.ReferenceFl

/** File-level FL compress/decompress — the reference CLI's own surface
  * (`compress c|d fl <in> <out>`), re-expressed on Spark.
  *
  * Compress mirrors the reference's distributed variant
  * (/root/reference/src/fl/fl_gpu.cu:41-74 gpuMPICompress +
  * file_io.cu:28-71 loadFileMpi): the file is split into 128-aligned
  * slices (no frame straddles a slice — fl_common.cuh:8-9), each Spark
  * task compresses its slice independently, and the driver concatenates
  * in slice order (MergeFLCompressed, fl_common.cuh:95-151). The output
  * file is bit-identical to a whole-file single-node encode — the same
  * alignment invariant the reference relies on. Slice reads open the
  * input path per task, exactly the reference's every-rank-opens-the-file
  * model (works in local mode and on any cluster with a shared FS).
  *
  * Decompress is driver-side, mirroring the reference where decompression
  * has no MPI/NCCL variant at all (main.cu:131-169).
  */
object FlFileJob {

  /** 128-aligned slice bounds, last slice takes the remainder
    * (file_io.cu:39-56, with Long sizes — the reference's int offsets
    * overflow past 2 GB, SURVEY.md §2.1). */
  def sliceBounds(fileSize: Long, slices: Int): Seq[(Long, Long)] = {
    val frame = ReferenceFl.FrameLength.toLong
    val per = (fileSize / (frame * slices)) * frame
    if (per == 0) Seq((0L, fileSize))
    else (0 until slices).map { i =>
      val start = i.toLong * per
      val end = if (i == slices - 1) fileSize else start + per
      (start, end)
    }
  }

  def compress(spark: SparkSession, in: String, out: String, slices: Int = 32): Long = {
    val fileSize = Files.size(Paths.get(in))
    val bounds = sliceBounds(fileSize, slices)
    val parts = spark.sparkContext
      .parallelize(bounds.zipWithIndex, bounds.size)
      .map { case ((start, end), idx) =>
        val raf = new java.io.RandomAccessFile(in, "r")
        try {
          val buf = new Array[Byte]((end - start).toInt)
          raf.seek(start)
          raf.readFully(buf)
          (idx, ReferenceFl.compress(buf))
        } finally raf.close()
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val merged = ReferenceFl.merge(parts.toSeq)
    Files.write(Paths.get(out), ReferenceFl.toFileBytes(merged))
    merged.fileSize
  }

  def decompress(in: String, out: String): Long = {
    val c = ReferenceFl.fromFileBytes(Files.readAllBytes(Paths.get(in)))
    val raw = ReferenceFl.decompress(c)
    Files.write(Paths.get(out), raw)
    raw.length.toLong
  }
}
