package graft.codec

import java.io.ByteArrayOutputStream

/** Unsigned LEB128 varints + zigzag, used by codec block headers and by
  * the RLE/dict codecs for counts and lengths (we widen the reference's
  * uint8 run counts to varint; a maxRun cap mode keeps spec parity —
  * /root/reference/IMPLEMENTATION-PLAN.md:125-148). */
object Varint {

  def writeUnsigned(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  @inline def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  @inline def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  def writeSigned(out: ByteArrayOutputStream, value: Long): Unit =
    writeUnsigned(out, zigzag(value))

  def sizeUnsigned(value: Long): Int = {
    var v = value; var n = 1
    while ((v & ~0x7fL) != 0L) { v >>>= 7; n += 1 }
    n
  }

  def sizeSigned(value: Long): Int = sizeUnsigned(zigzag(value))
}

/** Simple sequential byte reader for decoding codec blocks. */
final class ByteCursor(val buf: Array[Byte], var pos: Int = 0) {
  def readUnsignedVarint(): Long = {
    var shift = 0; var out = 0L; var b = 0
    do {
      // a valid LEB128 long is at most 10 bytes (shift 0..63); anything
      // longer is corruption — fail here, not as silent garbage offsets
      // or an out-of-bounds read far from the damage
      require(shift < 64, s"varint longer than 10 bytes at offset $pos — corrupt block")
      b = buf(pos) & 0xff
      pos += 1
      // 10th byte (shift 63): only its low bit fits in a Long — any higher
      // payload bit would be shifted out silently ((0x40L << 63) == 0), so
      // [0x80 x9, 0x40] would decode to 0 instead of failing
      require(shift < 63 || (b & 0x7e) == 0,
        s"varint overflows 64 bits at offset ${pos - 1} — corrupt block")
      out |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    out
  }
  def readSignedVarint(): Long = Varint.unzigzag(readUnsignedVarint())
  /** Count varint narrowed to Int with a NAMED overflow check: a bare
    * `.toInt` aliases a corrupt 64-bit count to a small value and the
    * decode "succeeds" with the wrong length — bypassing every guard
    * downstream of the narrowing. */
  def readCount(): Int = {
    // report the offset where the corrupt count STARTS, not the cursor
    // position after it was consumed — the message exists for forensics
    val at = pos
    val v = readUnsignedVarint()
    require(v <= Int.MaxValue,
      s"count $v exceeds Int range at offset $at — corrupt block")
    v.toInt
  }
  def readByte(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
  def readBytes(n: Int): Array[Byte] = {
    // copyOfRange silently ZERO-PADS past the source's end — a corrupt
    // length field claiming more bytes than remain would return real tail
    // + fabricated 0x00s and complete the decode with wrong data
    require(n >= 0 && n <= remaining,
      s"readBytes($n) at offset $pos exceeds remaining $remaining — corrupt block")
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
    pos += n
    out
  }
  def remaining: Int = buf.length - pos
}
