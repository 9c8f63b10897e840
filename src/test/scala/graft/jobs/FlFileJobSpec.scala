package graft.jobs

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.codec.ReferenceFl

/** Reference-CLI parity at the file level: the distributed 128-aligned
  * compress must produce a file byte-identical to a whole-input
  * single-node reference encode (the alignment invariant of
  * /root/reference/src/file_io.cu:39-56 + fl_common.cuh:95-151), and the
  * file must round-trip. */
class FlFileJobSpec extends AnyFunSuite with SparkFixture {

  test("distributed file compress == single-node reference encode, round-trips") {
    val dir = tmpDir("graft-flfile")
    val rnd = new scala.util.Random(42)
    // low-entropy bytes with a partial final frame (not 128-aligned size)
    val data = Array.tabulate(300037)(i =>
      if (i % 1000 < 900) (rnd.nextInt(16)).toByte else rnd.nextInt(256).toByte)
    Files.write(Paths.get(s"$dir/in.bin"), data)

    val outBytes = FlFileJob.compress(spark, s"$dir/in.bin", s"$dir/out.fl", slices = 7)
    val fileBytes = Files.readAllBytes(Paths.get(s"$dir/out.fl"))
    assert(outBytes == fileBytes.length.toLong)

    val single = ReferenceFl.toFileBytes(ReferenceFl.compress(data))
    assert(fileBytes.sameElements(single), "distributed != single-node encode")
    assert(fileBytes.length.toLong == ReferenceFl.fileSizeOf(data))

    val rawBytes = FlFileJob.decompress(spark, s"$dir/out.fl", s"$dir/back.bin", slices = 5)
    assert(rawBytes == data.length.toLong)
    assert(Files.readAllBytes(Paths.get(s"$dir/back.bin")).sameElements(data))
    // distributed parts are stream-concatenated then removed — no payload
    // bytes are gathered to the driver and no temp files linger
    assert(!Files.exists(Paths.get(s"$dir/out.fl.parts")))
    assert(!Files.exists(Paths.get(s"$dir/back.bin.parts")))
  }

  test("distributed decompress slices independently of compress slicing") {
    val dir = tmpDir("graft-flfile-d")
    val rnd = new scala.util.Random(7)
    // width variety across frames + a partial final frame, so slice
    // boundaries land at frames with different cumulative bit offsets
    val data = Array.tabulate(64 * 128 + 91) { i =>
      val w = 1 + (i / 128) % 8
      (rnd.nextInt(1 << w)).toByte
    }
    Files.write(Paths.get(s"$dir/in.bin"), data)
    val single = ReferenceFl.toFileBytes(ReferenceFl.compress(data))
    Files.write(Paths.get(s"$dir/in.fl"), single)
    // decompress at several slice counts (all different from any compress
    // slicing) — each must reproduce the input bit-identically
    for (slices <- Seq(1, 3, 9, 32)) {
      val n = FlFileJob.decompress(spark, s"$dir/in.fl", s"$dir/back-$slices.bin", slices)
      assert(n == data.length.toLong)
      assert(Files.readAllBytes(Paths.get(s"$dir/back-$slices.bin")).sameElements(data),
        s"mismatch at slices=$slices")
    }
    // empty file round-trip
    Files.write(Paths.get(s"$dir/empty.bin"), Array.emptyByteArray)
    FlFileJob.compress(spark, s"$dir/empty.bin", s"$dir/empty.fl", 4)
    assert(FlFileJob.decompress(spark, s"$dir/empty.fl", s"$dir/empty-back.bin", 4) == 0L)
    assert(Files.size(Paths.get(s"$dir/empty-back.bin")) == 0L)
  }

  test("slice count auto-raises so no slice exceeds 2 GiB (reference int-overflow guard)") {
    // a 5 GiB file at slices=1 must NOT become one negative-size array
    val big = 5L << 30
    for (req <- Seq(1, 3, 32)) {
      val bounds = FlFileJob.sliceBounds(big, req)
      assert(bounds.head._1 == 0L && bounds.last._2 == big)
      assert(bounds.sliding(2).forall { case Seq((_, e), (s, _)) => e == s; case _ => true })
      bounds.init.foreach { case (s, e) => assert(s % 128 == 0 && e % 128 == 0) }
      bounds.foreach { case (s, e) =>
        assert(e - s <= FlFileJob.MaxSliceBytes, s"slice ${e - s} over cap at req=$req")
      }
    }
  }

  test("multi-petabyte files terminate with in-cap even slices (doubling turnaround)") {
    // lastSlice(k) ~ fileSize/k + frame*k GROWS again past k ~
    // sqrt(fileSize/frame): for these sizes the remainder-to-last scheme
    // fits NO k, and the old unbounded doubling overflowed Int and
    // emitted negative bounds (or spun forever). The even-frame fallback
    // must cover the file exactly, stay 128-aligned, and keep every
    // slice under the JVM-array cap.
    val big = 10_000_000_000_000_037L // ~10 PB, deliberately unaligned
    val bounds = FlFileJob.sliceBounds(big, 32)
    assert(bounds.head._1 == 0L && bounds.last._2 == big)
    // one imperative pass — the fallback legitimately returns millions of
    // slices at this size, so no sliding/init allocation games
    var prevEnd = 0L
    for ((s, e) <- bounds) {
      assert(s == prevEnd && s % 128 == 0)
      assert(e > s && e - s <= FlFileJob.MaxSliceBytes)
      prevEnd = e
    }
    assert(prevEnd == big)
  }

  test("slice bounds are 128-aligned with remainder on the last slice") {
    val bounds = FlFileJob.sliceBounds(300037L, 7)
    assert(bounds.head._1 == 0L && bounds.last._2 == 300037L)
    bounds.init.foreach { case (s, e) => assert(s % 128 == 0 && e % 128 == 0) }
    assert(bounds.sliding(2).forall { case Seq((_, e), (s, _)) => e == s })
    // tiny file: single slice
    assert(FlFileJob.sliceBounds(100L, 8) == Seq((0L, 100L)))
  }

  test("scheme-qualified (Hadoop FileSystem) paths round-trip") {
    // all FlFileJob I/O goes through the Hadoop FileSystem API so
    // hdfs:///s3a:// inputs work; prove the resolution path with explicit
    // file: URIs (same API, LocalFileSystem implementation)
    val dir = tmpDir("graft-flfile-uri")
    val data = Array.tabulate(300037)(i => (i % 29).toByte)
    Files.write(Paths.get(s"$dir/in.bin"), data)
    val outBytes = FlFileJob.compress(spark, s"file:$dir/in.bin", s"file:$dir/out.fl", 5)
    assert(Files.size(Paths.get(s"$dir/out.fl")) == outBytes)
    // byte-identical to the non-schemed write of the same input
    val single = ReferenceFl.toFileBytes(ReferenceFl.compress(data))
    assert(Files.readAllBytes(Paths.get(s"$dir/out.fl")).sameElements(single))
    val n = FlFileJob.decompress(spark, s"file:$dir/out.fl", s"file:$dir/back.bin", 3)
    assert(n == data.length.toLong)
    assert(Files.readAllBytes(Paths.get(s"$dir/back.bin")).sameElements(data))
  }
}
