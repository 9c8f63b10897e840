package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Worked examples frozen from the reference design doc
  * (/root/reference/IMPLEMENTATION-PLAN.md:12-16) and CPU semantics
  * (/root/reference/src/fl/fl_cpu.cu). */
class ReferenceFlSpec extends AnyFunSuite {

  // the doc's example uses frame=3; replicate with a local frame-3 packer
  // that shares the normative bit order (LSB-first sequential cursor)
  private def flCompressFrames(data: Array[Byte], frame: Int): (Array[Int], Array[Byte]) = {
    val framesCount = (data.length + frame - 1) / frame
    val bits = Array.tabulate(framesCount) { f =>
      val end = math.min(data.length, (f + 1) * frame)
      math.max(1, (f * frame until end).map(i => Bits.widthOfByte(data(i))).max)
    }
    val totalBits = (0 until framesCount).map { f =>
      bits(f).toLong * (math.min(data.length, (f + 1) * frame) - f * frame)
    }.sum
    val values = new Array[Byte](Bits.byteLen(totalBits))
    val w = new BitWriter(values)
    for (f <- 0 until framesCount; i <- f * frame until math.min(data.length, (f + 1) * frame))
      w.write(data(i) & 0xffL, bits(f))
    (bits, values)
  }

  test("FL worked example: [0,2,1,5,5,7,10,1,13] frame=3 -> bits [2,3,4]") {
    val input = Array[Byte](0, 2, 1, 5, 5, 7, 10, 1, 13)
    val (bits, values) = flCompressFrames(input, 3)
    assert(bits.toSeq == Seq(2, 3, 4))
    // 27 bits -> 4 bytes; LSB-first layout computed by hand from
    // fl_cpu.cu:62-84 semantics
    assert(values.toSeq == Seq(88, 123, -115, 6).map(_.toByte))
  }

  test("zero frame costs 1 bit per value (fl_cpu.cu:39-47)") {
    val c = ReferenceFl.compress(new Array[Byte](256))
    assert(c.bits.toSeq == Seq(1, 1).map(_.toByte))
    assert(c.values.length == 32) // 256 bits / 8
  }

  test("empty input -> empty output (fl_cpu.cu:11-14)") {
    val c = ReferenceFl.compress(Array.emptyByteArray)
    assert(c.inputSize == 0 && c.bits.isEmpty && c.values.isEmpty)
    assert(ReferenceFl.fileSizeOf(Array.emptyByteArray) == 24L)
  }

  test("round-trip identity on mixed data") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 127, 128, 129, 1000, 4096)) {
      val data = new Array[Byte](n)
      rnd.nextBytes(data)
      val c = ReferenceFl.compress(data)
      assert(ReferenceFl.decompress(c).toSeq == data.toSeq, s"n=$n")
      assert(c.fileSize == ReferenceFl.fileSizeOf(data))
    }
  }

  test("file round-trip: header 3 longs + bits + values") {
    val data = Array.tabulate(300)(i => (i % 17).toByte)
    val c = ReferenceFl.compress(data)
    val back = ReferenceFl.fromFileBytes(ReferenceFl.toFileBytes(c))
    assert(back.inputSize == c.inputSize)
    assert(back.bits.toSeq == c.bits.toSeq && back.values.toSeq == c.values.toSeq)
  }

  test("128-aligned chunk concat == whole-input encode (fl_common.cuh:95-151)") {
    val rnd = new scala.util.Random(7)
    val data = new Array[Byte](128 * 5 + 77)
    rnd.nextBytes(data)
    val chunks = Seq(
      java.util.Arrays.copyOfRange(data, 0, 128 * 2),
      java.util.Arrays.copyOfRange(data, 128 * 2, 128 * 4),
      java.util.Arrays.copyOfRange(data, 128 * 4, data.length))
    val merged = ReferenceFl.merge(chunks.map(ReferenceFl.compress))
    val whole = ReferenceFl.compress(data)
    assert(merged.inputSize == whole.inputSize)
    assert(merged.bits.toSeq == whole.bits.toSeq)
    assert(merged.values.toSeq == whole.values.toSeq)
    assert(ReferenceFl.decompress(merged).toSeq == data.toSeq)
  }
}
