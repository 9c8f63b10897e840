package graft.jobs

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.codec.ColumnCodec
import graft.sources.TableIO
import graft.model.{EncodedChunk, Page}

/** Mirror image of EncodeJob: chunks decode independently (the §1.1
  * chunk-independence invariant), so this is a shuffle-free mapPartitions.
  * Decoded columns are bit-identical to the encoder's input — the
  * north_rule invariant, asserted by VerifyJob and the e2e suite. */
object DecodeJob {

  def run(spark: SparkSession, outDir: String): Dataset[Page] = {
    import spark.implicits._
    TableIO.read(spark, EncodeJob.chunksDir(outDir)).as[EncodedChunk]
      .mapPartitions(_.flatMap(decodeChunk))
  }

  def decodeChunk(chunk: EncodedChunk): Iterator[Page] = {
    val byName = chunk.cols.map(c => c.name -> c.block).toMap
    val urls = ColumnCodec.decodeBytes(byName("url"))
    val (tsMicros, tsNulls) = ColumnCodec.decodeLongs(byName("warc_ts"))
    val htmls = ColumnCodec.decodeBytes(byName("html"))
    val texts = ColumnCodec.decodeBytes(byName("text"))
    val langs = ColumnCodec.decodeBytes(byName("lang"))
    // lineage check: decoded text must reproduce the CRC the encoder
    // recorded for this chunk — corruption fails fast, at the chunk that
    // broke, instead of surfacing later as a verify-join mismatch
    val crc = new java.util.zip.CRC32()
    texts.foreach(t => if (t != null) crc.update(t))
    require(crc.getValue == chunk.textCrc32,
      s"chunk pid=${chunk.pid} blockIdx=${chunk.blockIdx}: decoded text CRC " +
        s"${crc.getValue} != recorded ${chunk.textCrc32} (corrupt block?)")
    val n = chunk.rows.toInt
    Iterator.tabulate(n) { i =>
      val ts =
        if (tsNulls != null && tsNulls(i)) null
        else {
          val micros = tsMicros(i)
          val t = new java.sql.Timestamp(math.floorDiv(micros, 1000000L) * 1000L)
          t.setNanos((math.floorMod(micros, 1000000L) * 1000L).toInt)
          t
        }
      Page(
        new String(urls(i), UTF_8), ts, htmls(i),
        new String(texts(i), UTF_8), new String(langs(i), UTF_8))
    }
  }
}
