package graft.codec

import java.io.ByteArrayOutputStream

/** A byte-stream codec: encodes an opaque byte payload into a
  * self-describing block (codec id is stored by the caller's block
  * header, not here). All codecs are pure Scala, Spark-agnostic; they run
  * inside `Dataset.mapPartitions` kernels. */
trait ByteCodec extends Serializable {
  def id: Int
  def name: String
  def encode(data: Array[Byte]): Array[Byte]
  /** Decode a block that STARTS at `from` inside a larger buffer — the
    * zero-copy entry every nested-block reader uses (blocks are fully
    * self-delimiting, so no end offset is needed). */
  def decode(block: Array[Byte], from: Int): Array[Byte]
  final def decode(block: Array[Byte]): Array[Byte] = decode(block, 0)
}

object ByteCodecs {
  val FrameLength = 128

  def byId(id: Int): ByteCodec = id match {
    case PlainBytes.id => PlainBytes
    case FlBytes.id    => FlBytes
    case RleBytes.id   => RleBytes
    case FsstBytes.id  => FsstBytes
    case other         => throw new IllegalArgumentException(s"unknown byte codec id $other")
  }

  val all: Seq[ByteCodec] = Seq(PlainBytes, FlBytes, RleBytes, FsstBytes)
}

/** Identity codec: [varint n][bytes]. */
case object PlainBytes extends ByteCodec {
  val id = 0
  val name = "plain"
  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 5)
    Varint.writeUnsigned(out, data.length.toLong)
    out.write(data, 0, data.length)
    out.toByteArray
  }
  /** Exact realized size — selector candidates must be exact by contract. */
  def sizeOf(data: Array[Byte]): Long =
    Varint.sizeUnsigned(data.length.toLong).toLong + data.length
  def decode(block: Array[Byte], from: Int): Array[Byte] = {
    val cur = new ByteCursor(block, from)
    cur.readBytes(cur.readCount())
  }
}

/** Generalized Fixed-Length bit-packing over bytes.
  *
  * Payload is bit-identical to the reference FL stream (bits array then
  * values array, /root/reference/src/fl/fl_cpu.cu:9-90): frame=128,
  * per-frame width = max(1, bitWidth(maxValue)), LSB-first sequential
  * cursor. Block layout: [varint n][bits ceil(n/128)][values]. The block
  * is always <= the reference's on-disk FL file on the same bytes (its
  * 24-byte header vs our <=9-byte varint) — this codec is the structural
  * "<= reference size" fallback in the selector. */
case object FlBytes extends ByteCodec {
  val id = 1
  val name = "fl_bitpack"
  import ByteCodecs.FrameLength

  def encode(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    // frame math in Long: (n + 127) and (f + 1) * 128 both wrap Int for
    // n within ~127 of Int.MaxValue — a size the caller-side chunk guard
    // admits — turning sizeOf negative (winning selection!) and encode
    // into a NegativeArraySizeException
    val framesCount = ((n.toLong + FrameLength - 1) / FrameLength).toInt
    val bits = new Array[Byte](framesCount)
    var totalBits = 0L
    var f = 0
    while (f < framesCount) {
      val end = math.min(n.toLong, (f + 1).toLong * FrameLength).toInt
      var w = 1
      var i = f * FrameLength
      while (i < end) {
        val vw = Bits.widthOfByte(data(i))
        if (vw > w) w = vw
        i += 1
      }
      bits(f) = w.toByte
      totalBits += w.toLong * (end - f * FrameLength)
      f += 1
    }
    val header = new ByteArrayOutputStream(16)
    Varint.writeUnsigned(header, n.toLong)
    val head = header.toByteArray
    val values = new Array[Byte](Bits.byteLen(totalBits))
    val writer = new BitWriter(values)
    f = 0
    while (f < framesCount) {
      val w = bits(f) & 0xff
      val end = math.min(n.toLong, (f + 1).toLong * FrameLength).toInt
      var i = f * FrameLength
      while (i < end) {
        writer.write((data(i) & 0xffL), w)
        i += 1
      }
      f += 1
    }
    // Long-checked: the caller-side chunk guard bounds the INPUT, but FL
    // output exceeds it by one bits byte per 128-byte frame, so a ~2.14 GB
    // width-8 input would wrap this sum negative and crash the allocation
    val outLen = head.length.toLong + framesCount + values.length
    require(outLen <= Int.MaxValue,
      s"FL block would be $outLen bytes (> JVM array cap); encode smaller chunks")
    val out = new Array[Byte](outLen.toInt)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(bits, 0, out, head.length, framesCount)
    System.arraycopy(values, 0, out, head.length + framesCount, values.length)
    out
  }

  def decode(block: Array[Byte], from: Int): Array[Byte] = {
    val cur = new ByteCursor(block, from)
    val n = cur.readCount()
    if (n == 0) return Array.emptyByteArray
    val framesCount = ((n.toLong + FrameLength - 1) / FrameLength).toInt
    val bits = cur.readBytes(framesCount)
    val reader = new BitReader(block, cur.pos.toLong * 8L)
    val out = new Array[Byte](n)
    var f = 0
    while (f < framesCount) {
      val w = bits(f) & 0xff
      // encode only ever writes widths 1..8; anything else is corruption
      // and would silently misalign every later frame's bit reads
      require(w >= 1 && w <= 8,
        s"FL frame $f has width $w (valid: 1..8) — corrupt block")
      val end = math.min(n.toLong, (f + 1).toLong * FrameLength).toInt
      var i = f * FrameLength
      while (i < end) {
        out(i) = reader.read(w).toByte
        i += 1
      }
      f += 1
    }
    out
  }

  /** Exact encoded block size without materializing it. */
  def sizeOf(data: Array[Byte]): Long = {
    val n = data.length
    val framesCount = ((n.toLong + FrameLength - 1) / FrameLength).toInt
    var totalBits = 0L
    var f = 0
    while (f < framesCount) {
      val end = math.min(n.toLong, (f + 1).toLong * FrameLength).toInt
      var w = 1
      var i = f * FrameLength
      while (i < end) {
        val vw = Bits.widthOfByte(data(i))
        if (vw > w) w = vw
        i += 1
      }
      totalBits += w.toLong * (end - f * FrameLength)
      f += 1
    }
    Varint.sizeUnsigned(n.toLong).toLong + framesCount + (totalBits + 7) / 8
  }
}

/** Run-Length codec over bytes, per the reference's design spec
  * (/root/reference/IMPLEMENTATION-PLAN.md:81-152): runs of equal bytes
  * become (value, count) pairs. We widen counts to varints; `maxRun`
  * reproduces the spec's 255-cap by splitting long runs
  * (IMPLEMENTATION-PLAN.md:125-148). Block: [varint n][varint runCount]
  * [(value byte, count varint)...]. */
case object RleBytes extends ByteCodec {
  val id = 2
  val name = "rle"

  def encode(data: Array[Byte]): Array[Byte] = encode(data, Long.MaxValue)

  def encode(data: Array[Byte], maxRun: Long): Array[Byte] = {
    // two passes total: one counting walk (run count + exact run-stream
    // bytes — no boxed runs, no Int capacity hints that went negative
    // past ~715M runs) and one emit pass into an exactly-sized buffer.
    // rle_encode is a public SQL kernel over arbitrary binary; an output
    // that cannot fit a JVM array fails loudly up front.
    var runCount = 0L
    var runBytes = 0L
    if (data.nonEmpty) {
      var runVal = data(0)
      var runLen = 1L
      var i = 1
      while (i < data.length) {
        if (data(i) == runVal && runLen < maxRun) runLen += 1L
        else {
          runCount += 1L; runBytes += 1L + Varint.sizeUnsigned(runLen)
          runVal = data(i); runLen = 1L
        }
        i += 1
      }
      runCount += 1L; runBytes += 1L + Varint.sizeUnsigned(runLen)
    }
    val total = Varint.sizeUnsigned(data.length.toLong).toLong +
      Varint.sizeUnsigned(runCount).toLong + runBytes
    require(total <= Int.MaxValue.toLong - 8L,
      s"RLE output $total bytes exceeds the JVM array cap; encode smaller chunks")
    val out = new ByteArrayOutputStream(total.toInt)
    Varint.writeUnsigned(out, data.length.toLong)
    Varint.writeUnsigned(out, runCount)
    if (data.nonEmpty) {
      var runVal = data(0)
      var runLen = 1L
      var i = 1
      def close(): Unit = { out.write(runVal & 0xff); Varint.writeUnsigned(out, runLen) }
      while (i < data.length) {
        if (data(i) == runVal && runLen < maxRun) runLen += 1L
        else { close(); runVal = data(i); runLen = 1L }
        i += 1
      }
      close()
    }
    out.toByteArray
  }

  def decode(block: Array[Byte], from: Int): Array[Byte] = {
    val cur = new ByteCursor(block, from)
    val n = cur.readCount()
    val runCount = cur.readCount()
    val out = new Array[Byte](n)
    var pos = 0
    var r = 0
    while (r < runCount) {
      val v = cur.readByte().toByte
      val c = cur.readCount()
      require(c <= n - pos,
        s"RLE run $r of $c overruns $n values at $pos — corrupt block")
      java.util.Arrays.fill(out, pos, pos + c, v)
      pos += c
      r += 1
    }
    // runs that UNDERSHOOT n would silently leave a fabricated zero tail
    // — the exact failure mode the readBytes guard exists for
    require(pos == n, s"RLE runs cover $pos of $n values — corrupt block")
    out
  }

  /** Exact encoded size for a given cap. */
  def sizeOf(data: Array[Byte], maxRun: Long = Long.MaxValue): Long = {
    if (data.isEmpty) return 2L
    var size = Varint.sizeUnsigned(data.length.toLong).toLong
    var runCount = 0L
    var runVal = data(0)
    var runLen = 1L
    var i = 1
    var runBytes = 0L
    def close(): Unit = { runCount += 1; runBytes += 1L + Varint.sizeUnsigned(runLen) }
    while (i < data.length) {
      if (data(i) != runVal || runLen == maxRun) { close(); runVal = data(i); runLen = 1L }
      else runLen += 1L
      i += 1
    }
    close()
    size + Varint.sizeUnsigned(runCount) + runBytes
  }
}
