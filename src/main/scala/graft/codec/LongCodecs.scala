package graft.codec

import java.io.ByteArrayOutputStream

/** Codecs over Long arrays (timestamp epochs, string/binary lengths,
  * dictionary codes). Frame-of-reference generalizes the reference's FL
  * per-frame width search from uint8 to 64-bit domains
  * (/root/reference/src/fl/fl_cpu.cu:36-50 is the width-search analog). */
sealed trait LongCodec extends Serializable {
  def id: Int
  def name: String
  def encode(values: Array[Long]): Array[Byte]
  /** Decode a block that STARTS at `from` inside a larger buffer (zero-
    * copy nested-block entry; blocks are fully self-delimiting). */
  def decode(block: Array[Byte], from: Int): Array[Long]
  final def decode(block: Array[Byte]): Array[Long] = decode(block, 0)
}

object LongCodecs {
  val FrameLength = 128

  def byId(id: Int): LongCodec = id match {
    case PlainLongs.id  => PlainLongs
    case ForLongs.id    => ForLongs
    case RleLongs.id    => RleLongs
    case DeltaLongs.id  => DeltaLongs
    case other          => throw new IllegalArgumentException(s"unknown long codec id $other")
  }

  val all: Seq[LongCodec] = Seq(PlainLongs, ForLongs, RleLongs, DeltaLongs)
}

/** [varint n][8n bytes little-endian]. */
case object PlainLongs extends LongCodec {
  val id = 10
  val name = "plain_i64"
  /** Exact realized size — selector candidates must be exact by contract. */
  def sizeOf(values: Array[Long]): Long =
    Varint.sizeUnsigned(values.length.toLong).toLong + 8L * values.length
  def encode(values: Array[Long]): Array[Byte] = {
    val head = new ByteArrayOutputStream(10)
    Varint.writeUnsigned(head, values.length.toLong)
    val h = head.toByteArray
    val bb = java.nio.ByteBuffer
      .allocate(h.length + values.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(h)
    values.foreach(bb.putLong)
    bb.array()
  }
  def decode(block: Array[Byte], from: Int): Array[Long] = {
    val cur = new ByteCursor(block, from)
    val n = cur.readCount()
    // Long arithmetic: n * 8 as Int overflows negative past Int.MaxValue/8
    // and would surface as a bare IndexOutOfBounds from ByteBuffer.wrap
    // instead of the named corrupt-block refusal the codec layer
    // standardizes on (ForLongs/RleBytes carry the same guard)
    require(n.toLong * 8L <= (block.length - cur.pos).toLong,
      s"plain_i64: count $n claims ${n.toLong * 8L} payload bytes but only " +
        s"${block.length - cur.pos} remain — corrupt block")
    val bb = java.nio.ByteBuffer.wrap(block, cur.pos, n * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(n)(bb.getLong())
  }
}

/** Frame-of-reference + bit-packing: per frame of 128, store the frame min
  * (signed varint) and bit-packed deltas. Width 64 handles full-range and
  * wrap-around (delta arithmetic is modular, decode adds min back).
  * Block: [varint n][per frame: varint zigzag(min), width byte, packed]. */
case object ForLongs extends LongCodec {
  val id = 11
  val name = "for_bitpack"
  import LongCodecs.FrameLength

  def encode(values: Array[Long]): Array[Byte] = {
    val n = values.length
    val out = new ByteArrayOutputStream(16 + n * 2)
    Varint.writeUnsigned(out, n.toLong)
    var f = 0
    while (f * FrameLength < n) {
      val start = f * FrameLength
      val end = math.min(n, start + FrameLength)
      var min = values(start)
      var i = start + 1
      while (i < end) { if (values(i) < min) min = values(i); i += 1 }
      var width = 0
      i = start
      while (i < end) {
        val d = values(i) - min
        // d < 0 means the range overflowed a signed long -> need 64 bits
        val w = if (d < 0) 64 else Bits.widthOfLong(d)
        if (w > width) width = w
        i += 1
      }
      Varint.writeSigned(out, min)
      out.write(width)
      if (width > 0) {
        val packed = new Array[Byte](Bits.byteLen(width.toLong * (end - start)))
        val writer = new BitWriter(packed)
        i = start
        while (i < end) { writer.write(values(i) - min, width); i += 1 }
        out.write(packed, 0, packed.length)
      }
      f += 1
    }
    out.toByteArray
  }

  def decode(block: Array[Byte], from: Int): Array[Long] = {
    val cur = new ByteCursor(block, from)
    val n = cur.readCount()
    val out = new Array[Long](n)
    var f = 0
    while (f * FrameLength < n) {
      val start = f * FrameLength
      val end = math.min(n, start + FrameLength)
      val min = cur.readSignedVarint()
      val width = cur.readByte()
      // encode writes widths 0..64; a corrupt byte above 64 would make
      // BitReader's shifts wrap mod 64 (silently wrong longs) AND
      // misalign the cursor for every later frame
      require(width <= 64,
        s"FOR frame $f has width $width (valid: 0..64) — corrupt block")
      if (width == 0) {
        java.util.Arrays.fill(out, start, end, min)
      } else {
        val nBytes = Bits.byteLen(width.toLong * (end - start))
        val reader = new BitReader(block, cur.pos.toLong * 8L)
        var i = start
        while (i < end) { out(i) = min + reader.read(width); i += 1 }
        cur.pos += nBytes
      }
      f += 1
    }
    out
  }

  /** Exact encoded size without materializing. */
  def sizeOf(values: Array[Long]): Long = {
    val n = values.length
    var size = Varint.sizeUnsigned(n.toLong).toLong
    var f = 0
    while (f * FrameLength < n) {
      val start = f * FrameLength
      val end = math.min(n, start + FrameLength)
      var min = values(start)
      var i = start + 1
      while (i < end) { if (values(i) < min) min = values(i); i += 1 }
      var width = 0
      i = start
      while (i < end) {
        val d = values(i) - min
        val w = if (d < 0) 64 else Bits.widthOfLong(d)
        if (w > width) width = w
        i += 1
      }
      size += Varint.sizeSigned(min) + 1 + (width.toLong * (end - start) + 7) / 8
      f += 1
    }
    size
  }
}

/** Run-length over longs: [varint n][varint runCount][(zigzag value,
  * varint count)...] — the reference RL spec lifted to 64-bit values
  * (/root/reference/IMPLEMENTATION-PLAN.md:81-152). */
case object RleLongs extends LongCodec {
  val id = 12
  val name = "rle_i64"

  def encode(values: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    Varint.writeUnsigned(out, values.length.toLong)
    if (values.isEmpty) { Varint.writeUnsigned(out, 0L); return out.toByteArray }
    // small hint: RLE only WINS selection when runs are few, so sizing
    // the buffer at values.length over-allocated ~n bytes exactly in the
    // cases the codec is used (a constant 64k chunk wasted 64 KB; a
    // constant 268M-value column would reserve 268 MB for ~4 bytes)
    val runs = new ByteArrayOutputStream(64)
    var runCount = 0L
    var runVal = values(0)
    var runLen = 1L
    var i = 1
    def close(): Unit = {
      Varint.writeSigned(runs, runVal)
      Varint.writeUnsigned(runs, runLen)
      runCount += 1
    }
    while (i < values.length) {
      if (values(i) == runVal) runLen += 1L
      else { close(); runVal = values(i); runLen = 1L }
      i += 1
    }
    close()
    Varint.writeUnsigned(out, runCount)
    val rb = runs.toByteArray
    out.write(rb, 0, rb.length)
    out.toByteArray
  }

  def decode(block: Array[Byte], from: Int): Array[Long] = {
    val cur = new ByteCursor(block, from)
    val n = cur.readCount()
    val runCount = cur.readUnsignedVarint()
    val out = new Array[Long](n)
    var pos = 0
    var r = 0L
    while (r < runCount) {
      val v = cur.readSignedVarint()
      val c = cur.readCount()
      require(c <= n - pos,
        s"RLE run $r of $c overruns $n values at $pos — corrupt block")
      java.util.Arrays.fill(out, pos, pos + c, v)
      pos += c
      r += 1
    }
    // undershooting runs would leave a fabricated zero tail — fail loudly
    require(pos == n, s"RLE runs cover $pos of $n values — corrupt block")
    out
  }

  def sizeOf(values: Array[Long]): Long = {
    if (values.isEmpty) return 2L
    var size = Varint.sizeUnsigned(values.length.toLong).toLong
    var runCount = 0L
    var runBytes = 0L
    var runVal = values(0)
    var runLen = 1L
    var i = 1
    def close(): Unit = {
      runCount += 1
      runBytes += Varint.sizeSigned(runVal) + Varint.sizeUnsigned(runLen)
    }
    while (i < values.length) {
      if (values(i) == runVal) runLen += 1L
      else { close(); runVal = values(i); runLen = 1L }
      i += 1
    }
    close()
    size + Varint.sizeUnsigned(runCount) + runBytes
  }
}

/** Delta + FOR: first-order deltas then ForLongs — wins on sorted or
  * near-sorted sequences (timestamps non-decreasing within a host).
  * Block: [varint n][zigzag first][ForLongs block of deltas]. */
case object DeltaLongs extends LongCodec {
  val id = 13
  val name = "delta_for"

  def encode(values: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    Varint.writeUnsigned(out, values.length.toLong)
    if (values.isEmpty) return out.toByteArray
    Varint.writeSigned(out, values(0))
    val deltas = new Array[Long](values.length - 1)
    var i = 1
    while (i < values.length) { deltas(i - 1) = values(i) - values(i - 1); i += 1 }
    val inner = ForLongs.encode(deltas)
    out.write(inner, 0, inner.length)
    out.toByteArray
  }

  def decode(block: Array[Byte], from: Int): Array[Long] = {
    val cur = new ByteCursor(block, from)
    val n = cur.readCount()
    if (n == 0) return Array.emptyLongArray
    val first = cur.readSignedVarint()
    val deltas = ForLongs.decode(block, cur.pos)
    val out = new Array[Long](n)
    out(0) = first
    var i = 1
    while (i < n) { out(i) = out(i - 1) + deltas(i - 1); i += 1 }
    out
  }

  def sizeOf(values: Array[Long]): Long = {
    if (values.isEmpty) return 1L
    // ForLongs' frame walk over the VIRTUAL delta stream, one 128-long
    // scratch frame at a time: sizeOf runs on the selector hot path for
    // every long column (and every string column's lengths), where the
    // old full n-1 delta array was an O(chunk) transient allocation per
    // sizing call. Must stay byte-exact with encode's
    // ForLongs.sizeOf(deltas) — same frame boundaries, same min/width
    // math (CodecSpec pins the sizeOf == encode.length contract).
    val m = values.length - 1
    var size = Varint.sizeUnsigned(values.length.toLong).toLong +
      Varint.sizeSigned(values(0)).toLong + Varint.sizeUnsigned(m.toLong).toLong
    val frame = LongCodecs.FrameLength
    val scratch = new Array[Long](frame)
    var f = 0
    while (f * frame < m) {
      val start = f * frame
      val end = math.min(m, start + frame)
      val len = end - start
      var i = 0
      while (i < len) { scratch(i) = values(start + i + 1) - values(start + i); i += 1 }
      var min = scratch(0)
      i = 1
      while (i < len) { if (scratch(i) < min) min = scratch(i); i += 1 }
      var width = 0
      i = 0
      while (i < len) {
        val d = scratch(i) - min
        val w = if (d < 0) 64 else Bits.widthOfLong(d)
        if (w > width) width = w
        i += 1
      }
      size += Varint.sizeSigned(min) + 1 + (width.toLong * len + 7) / 8
      f += 1
    }
    size
  }
}
