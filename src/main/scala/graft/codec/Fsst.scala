package graft.codec

import java.io.ByteArrayOutputStream

/** FSST-style symbol-table string compression (after the public paper
  * "FSST: Fast Random Access String Compression", Boncz/Neumann/Leis,
  * PVLDB 13(11), 2020 — no reference-repo counterpart; mandated by
  * BASELINE.json north_rule).
  *
  * A table of at most 255 symbols, each 1..8 bytes, is trained by
  * iterative greedy gain maximization on a sample: compress the sample
  * with the current table, count symbol and adjacent-symbol-pair
  * frequencies, admit the concatenations with highest gain = freq * len.
  * Code 255 is the escape: [0xFF, literal byte]. Encoding is
  * longest-match via a per-first-byte bucket list sorted by length.
  *
  * Block layout:
  *   [varint decodedLen][nSymbols byte]
  *   [symbol lengths: nSymbols bytes][symbol bytes, concatenated]
  *   [varint codesLen][codes]
  */
case object FsstBytes extends ByteCodec {
  val id = 3
  val name = "fsst"

  val MaxSymbols = 255 // code 255 reserved for escape
  val MaxSymbolLen = 8
  val TrainIterations = 5
  val MaxSampleBytes = 1 << 16

  def encode(data: Array[Byte]): Array[Byte] = {
    val table = train(sample(data))
    encodeWithTable(data, table)
  }

  def decode(block: Array[Byte]): Array[Byte] = {
    val cur = new ByteCursor(block)
    val decodedLen = cur.readUnsignedVarint().toInt
    val nSymbols = cur.readByte()
    val lens = cur.readBytes(nSymbols)
    val symBytes = cur.readBytes(lens.map(_ & 0xff).sum)
    val symbols = new Array[Array[Byte]](nSymbols)
    var off = 0
    var s = 0
    while (s < nSymbols) {
      val l = lens(s) & 0xff
      symbols(s) = java.util.Arrays.copyOfRange(symBytes, off, off + l)
      off += l
      s += 1
    }
    val codesLen = cur.readUnsignedVarint().toInt
    val out = new Array[Byte](decodedLen)
    var outPos = 0
    var i = cur.pos
    val end = cur.pos + codesLen
    while (i < end) {
      val code = block(i) & 0xff
      if (code == 0xff) {
        out(outPos) = block(i + 1)
        outPos += 1
        i += 2
      } else {
        val sym = symbols(code)
        System.arraycopy(sym, 0, out, outPos, sym.length)
        outPos += sym.length
        i += 1
      }
    }
    out
  }

  // ---------------------------------------------------------------- train

  private[codec] def sample(data: Array[Byte]): Array[Byte] =
    if (data.length <= MaxSampleBytes) data
    else {
      // stride-sample contiguous 1 KiB pieces across the whole payload so
      // the table sees head, middle and tail distributions
      val piece = 1024
      val pieces = MaxSampleBytes / piece
      val out = new Array[Byte](MaxSampleBytes)
      val stride = (data.length - piece).toLong / math.max(1, pieces - 1)
      var p = 0
      while (p < pieces) {
        val src = math.min((p * stride).toInt, data.length - piece)
        System.arraycopy(data, src, out, p * piece, piece)
        p += 1
      }
      out
    }

  final case class SymbolTable(symbols: Array[Array[Byte]]) {
    // two-level match index: symbols of length >= 2 bucketed by their first
    // TWO bytes (longest first), single-byte symbols in a direct 256-entry
    // code lookup. Cuts the per-position candidate scan to the handful of
    // symbols sharing a 2-byte prefix.
    private val pairBuckets: Array[Array[Int]] = {
      val tmp = new java.util.HashMap[Integer, List[Int]]()
      symbols.zipWithIndex.foreach { case (sym, idx) =>
        if (sym.length >= 2) {
          val key = ((sym(0) & 0xff) << 8) | (sym(1) & 0xff)
          tmp.merge(key, List(idx), (a, b) => b ::: a)
        }
      }
      val out = new Array[Array[Int]](65536)
      tmp.forEach { (k, v) => out(k) = v.sortBy(i => -symbols(i).length).toArray }
      out
    }
    private val singleCode: Array[Int] = {
      val out = Array.fill(256)(-1)
      symbols.zipWithIndex.foreach { case (sym, idx) =>
        if (sym.length == 1) out(sym(0) & 0xff) = idx
      }
      out
    }

    /** Longest symbol matching data at pos, or -1. */
    def findLongest(data: Array[Byte], pos: Int): Int = {
      if (pos + 1 < data.length) {
        val bucket = pairBuckets(((data(pos) & 0xff) << 8) | (data(pos + 1) & 0xff))
        if (bucket != null) {
          var k = 0
          while (k < bucket.length) {
            val idx = bucket(k)
            val sym = symbols(idx)
            if (pos + sym.length <= data.length && matches(data, pos, sym)) return idx
            k += 1
          }
        }
      }
      singleCode(data(pos) & 0xff)
    }

    @inline private def matches(data: Array[Byte], pos: Int, sym: Array[Byte]): Boolean = {
      var j = 0
      while (j < sym.length) {
        if (data(pos + j) != sym(j)) return false
        j += 1
      }
      true
    }
  }

  /** Iterative greedy construction: start from frequent single bytes, then
    * repeatedly re-compress the sample and admit high-gain concatenations
    * of adjacent emitted symbols (paper §3.3's bottom-up algorithm,
    * simplified but semantics-preserving: any table round-trips). */
  def train(sampleData: Array[Byte]): SymbolTable = {
    if (sampleData.isEmpty) return SymbolTable(Array.empty)
    var table = initialTable(sampleData)
    var iter = 0
    while (iter < TrainIterations) {
      table = refine(sampleData, table)
      iter += 1
    }
    table
  }

  private def initialTable(sampleData: Array[Byte]): SymbolTable = {
    val freq = new Array[Long](256)
    sampleData.foreach(b => freq(b & 0xff) += 1)
    val top = freq.zipWithIndex.filter(_._1 > 0).sortBy(-_._1).take(MaxSymbols)
    SymbolTable(top.map { case (_, b) => Array(b.toByte) })
  }

  private def refine(sampleData: Array[Byte], table: SymbolTable): SymbolTable = {
    // compress sample, counting symbol freq and adjacent-pair freq
    val symFreq = new java.util.HashMap[java.nio.ByteBuffer, Long]()
    def bump(m: java.util.HashMap[java.nio.ByteBuffer, Long], key: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.wrap(key)
      m.merge(bb, 1L, (a, b) => a + b)
    }
    val pairFreq = new java.util.HashMap[java.nio.ByteBuffer, Long]()
    var pos = 0
    var prev: Array[Byte] = null
    while (pos < sampleData.length) {
      val idx = table.findLongest(sampleData, pos)
      val cur =
        if (idx >= 0) table.symbols(idx)
        else Array(sampleData(pos))
      bump(symFreq, cur)
      if (prev != null && prev.length + cur.length <= MaxSymbolLen)
        bump(pairFreq, prev ++ cur)
      prev = cur
      pos += cur.length
    }
    // candidates: current symbols + escaped single bytes + pairs
    val gains = new java.util.HashMap[java.nio.ByteBuffer, Long]()
    symFreq.forEach { (k, f) =>
      val len = k.array().length
      gains.merge(k, f * len, (a, b) => math.max(a, b))
    }
    pairFreq.forEach { (k, f) =>
      val len = k.array().length
      gains.merge(k, f * len, (a, b) => math.max(a, b))
    }
    val selected = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)]()
    gains.forEach { (k, g) => selected += ((k.array(), g)) }
    val top = selected.sortBy(-_._2).take(MaxSymbols).map(_._1).toArray
    SymbolTable(top)
  }

  // --------------------------------------------------------------- encode

  def encodeWithTable(data: Array[Byte], table: SymbolTable): Array[Byte] = {
    val codes = new ByteArrayOutputStream(math.max(64, data.length / 2))
    var pos = 0
    while (pos < data.length) {
      val idx = if (table.symbols.nonEmpty) table.findLongest(data, pos) else -1
      if (idx >= 0) {
        codes.write(idx)
        pos += table.symbols(idx).length
      } else {
        codes.write(0xff)
        codes.write(data(pos) & 0xff)
        pos += 1
      }
    }
    val codeBytes = codes.toByteArray
    val out = new ByteArrayOutputStream(codeBytes.length + 1024)
    Varint.writeUnsigned(out, data.length.toLong)
    out.write(table.symbols.length)
    table.symbols.foreach(s => out.write(s.length))
    table.symbols.foreach(s => out.write(s, 0, s.length))
    Varint.writeUnsigned(out, codeBytes.length.toLong)
    out.write(codeBytes, 0, codeBytes.length)
    out.toByteArray
  }

  /** Estimated encoded size from a sample compression (used by the
    * selector; the structural <=FL bound is enforced post-encode). */
  def estimateSize(data: Array[Byte]): Long = {
    if (data.isEmpty) return 3L
    val s = sample(data)
    estimateSizeWithTable(data, s, train(s))
  }

  /** Same estimate given an already-trained table (lets the selector train
    * once and reuse the table for the real encode if FSST wins). */
  def estimateSizeWithTable(data: Array[Byte], sampleData: Array[Byte], table: SymbolTable): Long = {
    val enc = encodeWithTable(sampleData, table)
    val tableBytes = 1L + table.symbols.map(_.length + 1).sum
    val codesRatio = (enc.length.toLong - tableBytes).toDouble / sampleData.length
    (codesRatio * data.length).toLong + tableBytes + 10L
  }
}
