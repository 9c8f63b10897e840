package graft.codec

/** Sequential LSB-first bit cursor IO, generalized to widths 0..64.
  *
  * Semantics (normative, matching the reference CPU path): bits are written
  * into a byte array starting at bit 0 of byte 0; within each byte the
  * least-significant bit is filled first; a value wider than the remaining
  * bits of the current byte spills its high bits into the following
  * byte(s). Byte-for-byte compatible with the reference's 8-bit packer
  * (/root/reference/src/fl/fl_cpu.cu:62-84 encode, 92-147 decode) when
  * width <= 8.
  */
object Bits {

  /** Minimal bits to represent an unsigned byte value, floored at 1
    * (a frame of zeros still costs 1 bit/value — fl_cpu.cu:39-47). */
  @inline def widthOfByte(b: Byte): Int = {
    val v = b & 0xff
    math.max(1, 32 - Integer.numberOfLeadingZeros(v))
  }

  /** Minimal bits to represent a non-negative long, 0 allowed (width 0
    * means "all values in frame are zero" for the generalized packer). */
  @inline def widthOfLong(v: Long): Int = {
    require(v >= 0, s"widthOfLong expects non-negative, got $v")
    if (v == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)
  }

  /** ceil(nBits / 8) as a Long-safe byte count. */
  @inline def byteLen(nBits: Long): Int = {
    val n = (nBits + 7) >>> 3
    require(n <= Int.MaxValue, s"bit buffer too large: $nBits bits")
    n.toInt
  }
}

/** Sequential writer. Allocate with the exact byte length (pre-sized, like
  * the reference's two-phase sizing) and write values in order. */
final class BitWriter(val buf: Array[Byte]) {
  private var cursor: Long = 0L

  @inline def position: Long = cursor

  /** Write the low `width` bits of `v` (0 <= width <= 64). Caller
    * guarantees v's significant bits fit in `width`. */
  def write(v: Long, width: Int): Unit = {
    var remaining = width
    var value = v
    while (remaining > 0) {
      val byteId = (cursor >>> 3).toInt
      val bitOff = (cursor & 7L).toInt
      val room = 8 - bitOff
      val take = math.min(room, remaining)
      // take <= room <= 8, so (1L << take) can never wrap
      val mask = (1L << take) - 1L
      buf(byteId) = (buf(byteId) | (((value & mask) << bitOff) & 0xff)).toByte
      value >>>= take
      cursor += take
      remaining -= take
    }
  }
}

/** Sequential reader mirroring [[BitWriter]]. */
final class BitReader(val buf: Array[Byte], startBit: Long = 0L) {
  private var cursor: Long = startBit

  @inline def position: Long = cursor

  def read(width: Int): Long = {
    var remaining = width
    var shift = 0
    var out = 0L
    while (remaining > 0) {
      val byteId = (cursor >>> 3).toInt
      val bitOff = (cursor & 7L).toInt
      val room = 8 - bitOff
      val take = math.min(room, remaining)
      val mask = (1L << take) - 1L
      out |= (((buf(byteId) & 0xffL) >>> bitOff) & mask) << shift
      shift += take
      cursor += take
      remaining -= take
    }
    out
  }
}
