package graft.codec

/** Deliberately-naïve oracle for the reference's Fixed-Length codec.
  *
  * Normative semantics frozen from the reference CPU path
  * (/root/reference/src/fl/fl_cpu.cu:9-90 compress, 92-147 decompress):
  *   - frame = 128 consecutive bytes (fl_common.cuh:8-9);
  *   - per-frame width = max(1, 8 - clz8(v)) — a frame of zeros still
  *     costs 1 bit/value (fl_cpu.cu:39-47);
  *   - payload = sequential LSB-first bit cursor, value << offset OR'd
  *     into the byte, overflow spills into the next byte (fl_cpu.cu:62-84);
  *   - valuesSize = ceil(totalBits / 8) (fl_cpu.cu:49-53);
  *   - on-disk form = header of 3 longs (inputSize, bitsSize, valuesSize,
  *     little-endian as on the reference's x86 targets) then bits then
  *     values (file_io.cu:236-273).
  *
  * This object is the *baseline size model* ("compressed size <= the
  * reference's FL output on the same bytes") and the bit-exactness oracle
  * for our generalized BitPack codec. It is intentionally simple and
  * independent of BitWriter/BitReader so the two implementations
  * cross-check each other.
  */
object ReferenceFl {
  val FrameLength = 128
  val HeaderBytes = 24L // 3 x 8-byte sizes, file_io.cu:236-257

  final case class FlCompressed(inputSize: Long, bits: Array[Byte], values: Array[Byte]) {
    def fileSize: Long = HeaderBytes + bits.length.toLong + values.length.toLong
  }

  def compress(data: Array[Byte]): FlCompressed = {
    val size = data.length
    if (size == 0) return FlCompressed(0L, Array.emptyByteArray, Array.emptyByteArray)
    val framesCount = (size + FrameLength - 1) / FrameLength
    val outputBits = new Array[Byte](framesCount)
    var totalBitsRequired = 0L
    var f = 0
    while (f < framesCount) {
      var minBits = 1
      var i = 0
      while (i < FrameLength && f * FrameLength + i < size) {
        val v = data(f * FrameLength + i) & 0xff
        val requiredBits = 32 - Integer.numberOfLeadingZeros(v) // 8 - clz8(v)
        if (requiredBits > minBits) minBits = requiredBits
        i += 1
      }
      outputBits(f) = minBits.toByte
      totalBitsRequired += minBits.toLong * math.min(FrameLength, size - FrameLength * f)
      f += 1
    }
    val valuesSize = ((totalBitsRequired + 7) / 8).toInt
    val outputValues = new Array[Byte](valuesSize)
    var usedBits = 0L
    f = 0
    while (f < framesCount) {
      val requiredBits = outputBits(f) & 0xff
      var i = 0
      while (i < FrameLength && f * FrameLength + i < size) {
        val value = data(f * FrameLength + i) & 0xff
        val outputId = (usedBits / 8).toInt
        val outputOffset = (usedBits % 8).toInt
        outputValues(outputId) = (outputValues(outputId) | ((value << outputOffset) & 0xff)).toByte
        if (outputOffset + requiredBits > 8) {
          val overflowValue = value >>> (8 - outputOffset)
          outputValues(outputId + 1) = (outputValues(outputId + 1) | overflowValue).toByte
        }
        usedBits += requiredBits
        i += 1
      }
      f += 1
    }
    FlCompressed(size.toLong, outputBits, outputValues)
  }

  def decompress(c: FlCompressed): Array[Byte] = {
    val outputSize = c.inputSize.toInt
    if (c.values.isEmpty || c.bits.isEmpty) return Array.emptyByteArray
    val data = new Array[Byte](outputSize)
    var consumedBits = 0L
    var f = 0
    while (f < c.bits.length) {
      val usedBits = c.bits(f) & 0xff
      var i = 0
      while (i < FrameLength && f * FrameLength + i < outputSize) {
        val inputId = (consumedBits / 8).toInt
        val inputOffset = (consumedBits % 8).toInt
        val mask = (1 << usedBits) - 1
        var decoded = ((c.values(inputId) & 0xff) >>> inputOffset) & mask
        if (inputOffset + usedBits > 8) {
          val overflowBits = inputOffset + usedBits - 8
          val overflowMask = (1 << overflowBits) - 1
          decoded |= ((c.values(inputId + 1) & overflowMask) & 0xff) << (usedBits - overflowBits)
        }
        data(f * FrameLength + i) = decoded.toByte
        consumedBits += usedBits
        i += 1
      }
      f += 1
    }
    data
  }

  /** Ordered concat of per-chunk encodings; valid iff every chunk except
    * the last is 128-aligned — the load-bearing invariant behind the
    * reference's distributed gather (/root/reference/src/fl/fl_common.cuh:95-151,
    * file_io.cu:39-56) and behind our per-partition independence. */
  def merge(parts: Seq[FlCompressed]): FlCompressed = {
    val nonEmpty = parts.filter(_.inputSize > 0)
    // enforce the invariant instead of documenting it: a misaligned part
    // would concatenate into a stream that DECODES, just wrongly
    if (nonEmpty.nonEmpty)
      nonEmpty.init.zipWithIndex.foreach { case (p, i) =>
        require(p.inputSize % FrameLength == 0,
          s"merge part $i has ${p.inputSize} input bytes — every part except " +
            s"the last must be $FrameLength-aligned or the concat mis-decodes")
      }
    FlCompressed(
      nonEmpty.map(_.inputSize).sum,
      nonEmpty.toArray.flatMap(_.bits),
      nonEmpty.toArray.flatMap(_.values))
  }

  /** Exact on-disk size of the reference FL encoding without materializing
    * the payload: ceil(n/128) + ceil(sum bits_f * count_f / 8) + 24. */
  def fileSizeOf(data: Array[Byte]): Long = {
    val size = data.length
    if (size == 0) return HeaderBytes
    val framesCount = (size + FrameLength - 1) / FrameLength
    var totalBits = 0L
    var f = 0
    while (f < framesCount) {
      var minBits = 1
      var i = 0
      while (i < FrameLength && f * FrameLength + i < size) {
        val v = data(f * FrameLength + i) & 0xff
        val w = 32 - Integer.numberOfLeadingZeros(v)
        if (w > minBits) minBits = w
        i += 1
      }
      totalBits += minBits.toLong * math.min(FrameLength, size - FrameLength * f)
      f += 1
    }
    framesCount.toLong + (totalBits + 7) / 8 + HeaderBytes
  }

  /** On-disk file form: header (3 little-endian longs) + bits + values
    * (file_io.cu:222-280 save, 117-192 load; sizes are Long — the
    * reference's int offsets overflow past 2 GB, see SURVEY.md §2.1). */
  /** The header alone — THE definition of the 3-long layout, shared with
    * the distributed file job (FlFileJob), which streams parts behind it
    * instead of materializing one array. One encode/decode pair so the
    * codec-level and file-level surfaces cannot silently diverge. */
  def headerOf(inputSize: Long, bitsSize: Long, valuesSize: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(HeaderBytes.toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(inputSize).putLong(bitsSize).putLong(valuesSize)
    bb.array()
  }

  /** (inputSize, bitsSize, valuesSize) from a header-sized prefix. */
  def readHeader(hdr: Array[Byte]): (Long, Long, Long) = {
    require(hdr.length >= HeaderBytes.toInt,
      s"FL header needs $HeaderBytes bytes, got ${hdr.length}")
    val bb = java.nio.ByteBuffer.wrap(hdr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (bb.getLong(), bb.getLong(), bb.getLong())
  }

  def toFileBytes(c: FlCompressed): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(HeaderBytes.toInt + c.bits.length + c.values.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(headerOf(c.inputSize, c.bits.length.toLong, c.values.length.toLong))
    bb.put(c.bits).put(c.values)
    bb.array()
  }

  def fromFileBytes(bytes: Array[Byte]): FlCompressed = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val inputSize = bb.getLong()
    val bitsSize = bb.getLong().toInt
    val valuesSize = bb.getLong().toInt
    val bits = new Array[Byte](bitsSize)
    val values = new Array[Byte](valuesSize)
    bb.get(bits).get(values)
    FlCompressed(inputSize, bits, values)
  }
}
