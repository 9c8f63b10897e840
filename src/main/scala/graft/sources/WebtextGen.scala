package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Page

/** Deterministic synthetic Common-Crawl-style webtext generator
  * (FIXTURES.md §A). Every value is a pure function of (seed, docId), so
  * the same table regenerates identically at any parallelism — the basis
  * of the bench's local[8]-vs-local[32] identical-input requirement and
  * of the resume tests. No external data.
  */
object WebtextGen {

  private val words = Array(
    "the", "of", "and", "to", "a", "in", "is", "was", "for", "on", "that",
    "market", "report", "growth", "quarterly", "committee", "announced",
    "today", "data", "system", "analysis", "compression", "engine", "web",
    "page", "crawl", "archive", "record", "stream", "column", "value")

  private val boilerplate =
    "This website uses cookies to ensure you get the best experience. "

  private val nonAscii = Array("zażółć gęślą jaźń", "東京都心", "naïve café", "Ёлка")

  private val langs = Array("en", "en", "en", "en", "de", "fr", "pl", "ja", "es", "ru")

  /** splitmix64 — deterministic per-doc PRNG stream. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Head-heavy host pick via a cubic CDF (P(k) ~ k^(-2/3) tail — a
    * power law flatter than Zipf 1.2; FIXTURES.md §A documents this
    * exact shape); with skewShare>0 a single host ("h0.example.org")
    * absorbs EXACTLY that fraction of docs in expectation, and the
    * cubic pick then covers h1..h(hosts-1) — letting it also emit h0
    * (head mass (1/hosts)^(1/3), ~21% at hosts=100) would overshoot the
    * documented share by ~10 points. */
  private def host(r: Long, hosts: Int, skewShare: Double): String = {
    val u = ((r >>> 11).toDouble / (1L << 53).toDouble)
    if (skewShare > 0 && u < skewShare) "h0.example.org"
    else {
      val v = ((mix(r) >>> 11).toDouble / (1L << 53).toDouble)
      // hosts == 1 with skew would otherwise compute lo = 1 and emit an
      // out-of-range h1 — there is only h0 to fall back to
      val lo = if (skewShare > 0 && hosts > 1) 1 else 0
      val span = math.max(1, hosts - lo)
      val k = lo + math.min(span - 1, (span * v * v * v).toInt) // cubic -> head-heavy
      s"h$k.example.org"
    }
  }

  def page(seed: Long, docId: Long, hosts: Int, skewShare: Double): Page = {
    val r0 = mix(seed ^ (docId * 0x9e3779b97f4a7c15L))
    val h = host(r0, hosts, skewShare)
    val url = s"https://$h/p${docId}"
    // base epoch 2025-07-04T00:00:00Z (micros): 1 s per docId within a
    // repeating day window (docId % 86400 — bench-scale tables wrap) plus
    // up to ~1.05 s of jitter, so per-host order is ROUGHLY increasing
    // in a narrow range (delta/FOR-friendly), not strictly non-decreasing
    val baseMicros = 1751587200000000L
    val tsMicros = baseMicros + (docId % 86400L) * 1000000L + (mix(r0 + 1) >>> 44)
    val ts = new java.sql.Timestamp(tsMicros / 1000L)
    ts.setNanos(((tsMicros % 1000000L) * 1000L).toInt)

    // KNOWN coupling, kept deliberately: nWords, the boilerplate flag and
    // the non-ASCII flag all read low bits of the one r1 draw, so e.g.
    // every boilerplate doc has nWords ≡ 20 (mod 4) and boilerplate/
    // non-ASCII are mutually exclusive. A fresh mix() per decision would
    // decouple them — but it would also change every generated corpus,
    // breaking the cross-round byte-identical encBytes evidence; the
    // regularity is a few bits per doc and does not materially flatter
    // the codecs (FSST/dict operate on symbol content, not word counts).
    val r1 = mix(r0 + 2)
    val nWords = 20 + (r1 & 0x3f).toInt
    val sb = new StringBuilder(256)
    if ((r1 & 3L) == 0L) sb.append(boilerplate) // 25% share boilerplate prefix
    var w = 0
    var rw = mix(r1)
    while (w < nWords) {
      sb.append(words(((rw >>> 8) % words.length).toInt)).append(' ')
      rw = mix(rw)
      w += 1
    }
    if ((r1 & 15L) == 1L) sb.append(nonAscii(((r1 >>> 16) % nonAscii.length).toInt))
    val text = sb.toString.trim
    val lang = langs(((r0 >>> 24) % langs.length).toInt)

    // pseudo-HTML wrapping text + a seeded low-entropy filler block
    val filler = new Array[Byte](64 + (mix(r1 + 7) & 0xff).toInt)
    var i = 0
    var rf = mix(r1 + 8)
    while (i < filler.length) {
      filler(i) = (rf & 0x07).toByte // low-entropy: 3 significant bits
      if ((i & 7) == 7) rf = mix(rf)
      else rf >>>= 3
      i += 1
    }
    val html = (s"<html><head><title>$h</title></head><body><p>$text</p>" +
      new String(filler.map(b => ('a' + b).toChar)) + "</body></html>").getBytes("UTF-8")

    Page(url, ts, html, text, lang)
  }

  /** Distributed generation: spark.range drives per-executor synthesis;
    * no driver-side materialization, scales linearly with partitions. */
  def pages(
      spark: SparkSession,
      n: Long,
      seed: Long = 42L,
      hosts: Int = 100,
      skewShare: Double = 0.0,
      partitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, n, 1L, partitions) else spark.range(n)
    base.map(id => page(seed, id, hosts, skewShare))
  }
}
