package graft.jobs

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

import graft.codec.ReferenceFl

/** File-level FL compress/decompress — the reference CLI's own surface
  * (`compress c|d fl <in> <out>`), re-expressed on Spark.
  *
  * Compress mirrors the reference's distributed variant
  * (/root/reference/src/fl/fl_gpu.cu:41-74 gpuMPICompress +
  * file_io.cu:28-71 loadFileMpi): the file is split into 128-aligned
  * slices (no frame straddles a slice — fl_common.cuh:8-9), each Spark
  * task compresses its slice independently and writes its own `bits` and
  * `values` part files (the distributed-write inversion of the
  * reference's gather-to-rank-0), and the driver stream-concatenates the
  * parts in slice order through a fixed-size copy buffer. Driver memory
  * is O(1) in the file size — only per-slice size triples are collected
  * (the reference's MPI_Allgather of sizes, fl_gpu.cu:100-109); payload
  * bytes never pass through the driver. The output file is bit-identical
  * to a whole-file single-node encode — the same alignment invariant
  * behind MergeFLCompressed (fl_common.cuh:95-151: full frames are
  * byte-aligned, so bits/values arrays concatenate exactly). Slice reads
  * open the input path per task, exactly the reference's
  * every-rank-opens-the-file model (works in local mode and on any
  * cluster with a shared FS).
  *
  * This is the one deliberate RDD surface in the engine (north_rule says
  * Dataset-first): the input is an opaque byte file with no schema, so a
  * `parallelize` of slice bounds is the honest representation — there is
  * no row type for Catalyst to optimize.
  *
  * Decompress is driver-side, mirroring the reference where decompression
  * has no MPI/NCCL variant at all (main.cu:131-169).
  */
object FlFileJob {

  /** Largest slice a task may take: the biggest 128-aligned byte count
    * that still fits a JVM Array (the reference's int offsets overflow
    * past 2 GB — file_io.cu:46-51, SURVEY.md §2.1; our slices stay Long
    * *and* provably under Int.MaxValue each). */
  val MaxSliceBytes: Long = (Int.MaxValue.toLong / ReferenceFl.FrameLength) * ReferenceFl.FrameLength

  /** 128-aligned slice bounds, last slice takes the remainder
    * (file_io.cu:39-56). The slice count auto-raises (doubling) until the
    * largest slice — the last one, which owns the remainder — fits under
    * [[MaxSliceBytes]], so a 1-slice request on a >2 GB file degrades to
    * more slices instead of a negative-size allocation. */
  def sliceBounds(fileSize: Long, slices: Int): Seq[(Long, Long)] = {
    val frame = ReferenceFl.FrameLength.toLong
    var n = math.max(1, slices)
    def per(k: Int): Long = (fileSize / (frame * k)) * frame
    def lastSlice(k: Int): Long = fileSize - per(k) * (k - 1)
    while (lastSlice(n) > MaxSliceBytes) n *= 2
    val p = per(n)
    if (p == 0) Seq((0L, fileSize))
    else (0 until n).map { i =>
      val start = i.toLong * p
      val end = if (i == n - 1) fileSize else start + p
      (start, end)
    }
  }

  def compress(spark: SparkSession, in: String, out: String, slices: Int = 32): Long = {
    val fileSize = Files.size(Paths.get(in))
    val bounds = sliceBounds(fileSize, slices)
    val partsDir = s"$out.parts"
    rmrf(Paths.get(partsDir))
    Files.createDirectories(Paths.get(partsDir))

    // executors: compress own slice, write own parts, return sizes only
    val meta = spark.sparkContext
      .parallelize(bounds.zipWithIndex, bounds.size)
      .map { case ((start, end), idx) =>
        val len = end - start
        require(len <= Int.MaxValue,
          s"slice $idx is $len bytes; sliceBounds must keep every slice under 2 GiB")
        val raf = new java.io.RandomAccessFile(in, "r")
        val buf =
          try { val b = new Array[Byte](len.toInt); raf.seek(start); raf.readFully(b); b }
          finally raf.close()
        val c = ReferenceFl.compress(buf)
        Files.write(Paths.get(f"$partsDir/bits-$idx%05d"), c.bits)
        Files.write(Paths.get(f"$partsDir/values-$idx%05d"), c.values)
        (idx, c.inputSize, c.bits.length.toLong, c.values.length.toLong)
      }
      .collect()
      .sortBy(_._1)

    // driver: header (3 LE longs, file_io.cu:236-257) + ordered stream
    // concat of bits parts then values parts; bounded by the copy buffer
    val totalIn = meta.map(_._2).sum
    val totalBits = meta.map(_._3).sum
    val totalValues = meta.map(_._4).sum
    val os = new java.io.BufferedOutputStream(new java.io.FileOutputStream(out), 1 << 20)
    try {
      val hdr = java.nio.ByteBuffer.allocate(ReferenceFl.HeaderBytes.toInt)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hdr.putLong(totalIn).putLong(totalBits).putLong(totalValues)
      os.write(hdr.array())
      for (kind <- Seq("bits", "values"); m <- meta) {
        val part = Paths.get(f"$partsDir/$kind-${m._1}%05d")
        val want = if (kind == "bits") m._3 else m._4
        // header sizes come from task metadata; the payload from disk —
        // fail fast if they disagree (interleaved writes, zombie attempt)
        require(Files.size(part) == want,
          s"$part is ${Files.size(part)} bytes, task reported $want — corrupt part")
        Files.copy(part, os)
      }
    } finally os.close()
    rmrf(Paths.get(partsDir))
    ReferenceFl.HeaderBytes + totalBits + totalValues
  }

  def decompress(in: String, out: String): Long = {
    val c = ReferenceFl.fromFileBytes(Files.readAllBytes(Paths.get(in)))
    val raw = ReferenceFl.decompress(c)
    Files.write(Paths.get(out), raw)
    raw.length.toLong
  }

  private def rmrf(p: Path): Unit = {
    if (Files.isDirectory(p)) Files.list(p).forEach(rmrf(_))
    Files.deleteIfExists(p)
  }
}
