package graft.tools

import java.nio.charset.StandardCharsets.UTF_8

import graft.codec._
import graft.sources.WebtextGen

/** Scratch single-threaded profiler for the encode kernel: generates one
  * chunk of synthetic pages locally (no Spark) and times each column /
  * codec phase. Not part of the driver contract. */
object ProfileEncode {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4700)
    val pages = Array.tabulate(n)(i => WebtextGen.page(42L, i.toLong, 100, 0.0))
    val urls = pages.map(_.url.getBytes(UTF_8))
    val texts = pages.map(_.text.getBytes(UTF_8))
    val htmls = pages.map(_.html)
    val langs = pages.map(_.lang.getBytes(UTF_8))
    val ts = pages.map(_.warc_ts.getTime * 1000L)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e6}%10.1f ms")
      r
    }
    // warmup
    ColumnCodec.encodeBytes(texts.take(500))
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      time("col url")(ColumnCodec.encodeBytes(urls))
      time("col text")(ColumnCodec.encodeBytes(texts))
      time("col html")(ColumnCodec.encodeBytes(htmls))
      time("col lang")(ColumnCodec.encodeBytes(langs))
      time("col warc_ts")(ColumnCodec.encodeLongs(ts))
      val payload = new java.io.ByteArrayOutputStream()
      texts.foreach(t => payload.write(t, 0, t.length))
      val p = payload.toByteArray
      println(s"text payload bytes: ${p.length}")
      time("  fsst estimateSize")(FsstBytes.estimateSize(p))
      val table = time("  fsst train")(FsstBytes.train(p.take(65536)))
      time("  fsst encodeWithTable")(FsstBytes.encodeWithTable(p, table))
      time("  fl sizeOf")(FlBytes.sizeOf(p))
      time("  fl encode")(FlBytes.encode(p))
      time("  rle sizeOf")(RleBytes.sizeOf(p))
      time("  refFl fileSizeOf")(ReferenceFl.fileSizeOf(p))
    }
  }
}
