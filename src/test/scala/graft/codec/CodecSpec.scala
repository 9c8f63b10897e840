package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class CodecSpec extends AnyFunSuite with GenDriven {

  private val byteArrays: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 2048)
    mode <- Gen.oneOf("random", "low", "runs", "zero")
    seed <- Gen.chooseNum(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    mode match {
      case "random" => Array.fill(n)(rnd.nextInt(256).toByte)
      case "low"    => Array.fill(n)(rnd.nextInt(8).toByte)
      case "zero"   => new Array[Byte](n)
      case "runs" =>
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) {
          val v = rnd.nextInt(4).toByte
          val len = math.min(n - i, 1 + rnd.nextInt(300))
          java.util.Arrays.fill(out, i, i + len, v)
          i += len
        }
        out
    }
  }

  private val longArrays: Gen[Array[Long]] = for {
    n <- Gen.chooseNum(0, 1024)
    mode <- Gen.oneOf("random", "narrow", "sorted", "extreme", "runs")
    seed <- Gen.chooseNum(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    mode match {
      case "random"  => Array.fill(n)(rnd.nextLong())
      case "narrow"  => Array.fill(n)(1721000000000L + rnd.nextInt(100000))
      case "sorted"  => Array.iterate(rnd.nextLong() % 1000000, n)(_ + rnd.nextInt(100))
      case "extreme" => Array.fill(n)(if (rnd.nextBoolean()) Long.MinValue else Long.MaxValue)
      case "runs"    => Array.fill(n)(rnd.nextInt(3).toLong * 1000000007L)
    }
  }

  test("FlBytes payload is bit-identical to the ReferenceFl oracle") {
    forAll(byteArrays) { data =>
      val ref = ReferenceFl.compress(data)
      val block = FlBytes.encode(data)
      val cur = new ByteCursor(block)
      assert(cur.readUnsignedVarint() == data.length.toLong)
      val framesCount = (data.length + 127) / 128
      val bits = cur.readBytes(framesCount)
      val values = cur.readBytes(cur.remaining)
      assert(bits.toSeq == ref.bits.toSeq)
      assert(values.toSeq == ref.values.toSeq)
      assert(FlBytes.sizeOf(data) == block.length.toLong)
      assert(FlBytes.decode(block).toSeq == data.toSeq)
    }
  }

  test("FlBytes block is always smaller than the reference FL file") {
    forAll(byteArrays) { data =>
      assert(FlBytes.sizeOf(data) <= ReferenceFl.fileSizeOf(data))
    }
  }

  /** Reference run collector (the spec's own oracle): production
    * RleBytes.encode streams runs without materializing them, so the
    * boxed collector lives HERE, next to its only callers. */
  private def collectRuns(data: Array[Byte], maxRun: Long): Array[(Byte, Long)] = {
    if (data.isEmpty) return Array.empty
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Byte, Long)]
    var runVal = data(0)
    var runLen = 1L
    var i = 1
    while (i < data.length) {
      if (data(i) == runVal && runLen < maxRun) runLen += 1L
      else { runs += ((runVal, runLen)); runVal = data(i); runLen = 1L }
      i += 1
    }
    runs += ((runVal, runLen))
    runs.toArray
  }

  test("RleBytes worked example (IMPLEMENTATION-PLAN.md:87-89)") {
    val input = Array[Byte](5, 5, 8, 8, 8, 7, 7, 7, 7, 3, 4, 4, 4)
    val runs = collectRuns(input, Long.MaxValue)
    assert(runs.map(_._1).toSeq == Seq[Byte](5, 8, 7, 3, 4))
    assert(runs.map(_._2).toSeq == Seq[Long](2, 3, 4, 1, 3))
  }

  test("RleBytes 255-cap splits a 256-run (IMPLEMENTATION-PLAN.md:125)") {
    val input = Array.fill[Byte](256)(9)
    val runs = collectRuns(input, 255)
    assert(runs.toSeq == Seq((9.toByte, 255L), (9.toByte, 1L)))
    // spec size model: 2 bytes per run at cap 255 when counts < 128 need
    // 1-byte varints; capped block round-trips identically
    assert(RleBytes.decode(RleBytes.encode(input, 255)).toSeq == input.toSeq)
  }

  test("RleBytes round-trip + exact size") {
    forAll(byteArrays) { data =>
      val block = RleBytes.encode(data)
      assert(RleBytes.decode(block).toSeq == data.toSeq)
      assert(RleBytes.sizeOf(data) == block.length.toLong)
    }
  }

  test("FsstBytes round-trip on arbitrary bytes") {
    forAll(byteArrays) { data =>
      assert(FsstBytes.decode(FsstBytes.encode(data)).toSeq == data.toSeq)
    }
  }

  test("FsstBytes round-trips UTF-8 text and beats plain on boilerplate") {
    val boiler = ("the quick brown fox jumps over the lazy dog — " +
      "zażółć gęślą jaźń 東京 https://example.com/path?q=1 ") * 400
    val data = boiler.getBytes("UTF-8")
    val block = FsstBytes.encode(data)
    assert(FsstBytes.decode(block).toSeq == data.toSeq)
    assert(block.length < data.length / 2, s"fsst ${block.length} vs plain ${data.length}")
  }

  test("LongCodecs round-trip + exact sizes") {
    forAll(longArrays) { values =>
      for (codec <- LongCodecs.all) {
        val block = codec.encode(values)
        assert(codec.decode(block).toSeq == values.toSeq, codec.name)
      }
      assert(ForLongs.sizeOf(values) == ForLongs.encode(values).length.toLong)
      assert(RleLongs.sizeOf(values) == RleLongs.encode(values).length.toLong)
      assert(DeltaLongs.sizeOf(values) == DeltaLongs.encode(values).length.toLong)
    }
  }

  test("varint round-trip") {
    forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { xs =>
      val out = new java.io.ByteArrayOutputStream()
      xs.foreach(Varint.writeSigned(out, _))
      val cur = new ByteCursor(out.toByteArray)
      assert(xs.map(_ => cur.readSignedVarint()) == xs)
      assert(cur.remaining == 0, "trailing bytes after the last varint")
    }
  }

  test("offset decode == whole-block decode for every codec (zero-copy entry)") {
    // nested-block readers decode at an offset inside a larger buffer;
    // each codec must read exactly its self-delimited block regardless of
    // what precedes or follows it
    val rnd = new scala.util.Random(99)
    val bytesData = Array.tabulate(5000)(i =>
      if (i % 7 == 0) rnd.nextInt(256).toByte else (i % 17).toByte)
    val longsData = Array.tabulate(3000)(i =>
      if (i % 5 == 0) rnd.nextLong() % 1000 else i.toLong)
    def padded(block: Array[Byte]): (Array[Byte], Int) = {
      val pre = Array.fill(rnd.nextInt(33) + 1)(rnd.nextInt(256).toByte)
      val post = Array.fill(rnd.nextInt(17))(rnd.nextInt(256).toByte)
      (pre ++ block ++ post, pre.length)
    }
    for (c <- Seq(PlainBytes, RleBytes, FlBytes, FsstBytes)) {
      val block = c.encode(bytesData)
      val (buf, off) = padded(block)
      assert(c.decode(buf, off).sameElements(c.decode(block)), c.name)
    }
    for (c <- Seq(PlainLongs, ForLongs, RleLongs, DeltaLongs)) {
      val block = c.encode(longsData)
      val (buf, off) = padded(block)
      assert(c.decode(buf, off).sameElements(c.decode(block)), c.name)
    }
  }

  test("BitWriter/BitReader round-trip at all widths") {
    val rnd = new scala.util.Random(1)
    for (width <- 0 to 64) {
      val values = Array.fill(200)(
        if (width == 0) 0L
        else if (width == 64) rnd.nextLong()
        else rnd.nextLong() & ((1L << width) - 1))
      val buf = new Array[Byte](Bits.byteLen(width.toLong * values.length))
      val w = new BitWriter(buf)
      values.foreach(w.write(_, width))
      val r = new BitReader(buf)
      assert(values.forall(v => r.read(width) == v), s"width=$width")
    }
  }

  test("corrupt inner-codec blocks fail loudly, never silent garbage") {
    import graft.codec._
    // RLE bytes: runs UNDERSHOOT n -> must not return a zero-filled tail
    // layout [varint n=2][varint runCount=1][value 'A'][varint count=1]
    val rleShort = Array[Byte](2, 1, 0x41, 1)
    val e1 = intercept[IllegalArgumentException] { RleBytes.decode(rleShort, 0) }
    assert(e1.getMessage.contains("cover"), e1.getMessage)
    // RLE bytes: a run OVERRUNS n -> named error, not a bare index crash
    val rleOver = Array[Byte](2, 1, 0x41, 5)
    val e2 = intercept[IllegalArgumentException] { RleBytes.decode(rleOver, 0) }
    assert(e2.getMessage.contains("overruns"), e2.getMessage)
    // RLE longs: same undershoot contract
    val rleL = Array[Byte](2, 1, 0, 1) // n=2, runCount=1, v=zigzag(0), c=1
    val e3 = intercept[IllegalArgumentException] { RleLongs.decode(rleL, 0) }
    assert(e3.getMessage.contains("cover"), e3.getMessage)

    // FL bytes: width byte outside 1..8 must fail, not misalign frames
    val fl = FlBytes.encode(Array[Byte](1, 2, 3, 4)).clone()
    fl(1) = 0 // [varint n=4][bits frame][values]: width byte at offset 1
    val e4 = intercept[IllegalArgumentException] { FlBytes.decode(fl, 0) }
    assert(e4.getMessage.contains("width"), e4.getMessage)

    // FOR longs: width byte above 64 must fail (BitReader shifts wrap
    // mod 64 -> silently wrong longs otherwise)
    val forB = ForLongs.encode(Array(100L, 101L, 102L)).clone()
    // layout [varint n=3][svarint min][width][bits]: min=100 zigzags to
    // 200 = 2-byte varint, so the width byte sits at offset 3
    forB(3) = 100
    val e5 = intercept[IllegalArgumentException] { ForLongs.decode(forB, 0) }
    assert(e5.getMessage.contains("width"), e5.getMessage)

    // count varint past Int.MaxValue fails named instead of aliasing
    // small via .toInt: [varint 2^32+5] as a PlainBytes count
    val big = new java.io.ByteArrayOutputStream()
    Varint.writeUnsigned(big, (1L << 32) + 5L)
    val e6 = intercept[IllegalArgumentException] { PlainBytes.decode(big.toByteArray, 0) }
    assert(e6.getMessage.contains("count"), e6.getMessage)
  }
}
