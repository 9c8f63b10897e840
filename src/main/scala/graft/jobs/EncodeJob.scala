package graft.jobs

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.CRC32

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.ColumnCodec
import graft.model._
import graft.sources.TableIO

/** Distributed per-column encode.
  *
  * Pipeline (SURVEY.md §3.4):
  *   read -> assign pid from pinned url-range bounds -> filter completed
  *   (resume) -> repartition(pid) -> sortWithinPartitions(pid, url) ->
  *   mapPartitions(encode) -> write chunks -> derive+append manifest.
  *
  * Exactly one shuffle (the pid repartition). Encoding is shuffle-free and
  * embarrassingly parallel, mirroring the reference's 128-aligned per-rank
  * split (/root/reference/src/file_io.cu:39-56); the reference's
  * gather-to-rank-0 (fl_gpu.cu:41-74) is inverted into a distributed
  * write + a small manifest aggregation, which is the piece that scales.
  *
  * Resume (north_rule): url-range bounds are sampled once and pinned in
  * `bounds.json`; pid assignment is a pure function of (url, bounds), so
  * an interrupted run re-derives identical pids and skips every pid
  * already present in the manifest.
  *
  * Skewed hosts (north_rule "salting for skewed hosts"): the partition
  * key is the full url, which is unique per row, so a host that owns 50%
  * of the table is NOT a skewed shuffle key — the quantile bounds are
  * sampled at url granularity and fall *inside* the hot host's url space,
  * splitting it across as many pids as its share warrants. This subsumes
  * explicit salt columns (salting exists to split one over-frequent key;
  * here no key repeats) and keeps pid ranges contiguous for the manifest.
  * The skew test (EncodePipelineSpec) pins the resulting spread at <= 3x
  * the mean under a 50%-single-host distribution. AQE skew-join handles
  * the verify-join side.
  */
/** Shuffle row: input page + its assigned logical partition id. Top-level
  * (not nested) so Spark's reflection-based Encoder can resolve it. */
final case class PidPage(
    pid: Int, url: String, warc_ts: java.sql.Timestamp,
    html: Array[Byte], text: String, lang: String)

object EncodeJob {

  final case class Config(
      numPartitions: Int = 32,
      targetBlockBytes: Long = 16L << 20,
      maxBlockRows: Int = 65536,
      resume: Boolean = true,
      seedSampleSize: Int = 10000,
      /** Checkpoint wave: only encode pending pids < this bound, then
        * commit chunks+manifest. Repeated calls with a growing bound (or
        * None = all) give partition-granular resumability even though each
        * parquet write commit is atomic. */
      pidUpperBound: Option[Int] = None,
      /** "auto" = stats-driven selector (the engine); "fl" = FL bit-pack
        * only, the exact work of the reference CPU path, for
        * apples-to-apples throughput comparison. */
      codecMode: String = "auto")

  final case class Result(
      pidsEncoded: Long,
      pidsSkipped: Long,
      rows: Long,
      rawBytes: Long,
      encBytes: Long,
      flBaselineBytes: Long,
      wallNanos: Long,
      boundsNanos: Long = 0L,
      encodeNanos: Long = 0L,
      manifestNanos: Long = 0L)

  def chunksDir(outDir: String) = s"$outDir/chunks"
  def manifestDir(outDir: String) = s"$outDir/manifest"
  def boundsPath(outDir: String) = s"$outDir/bounds.json"

  // ---------------------------------------------------------------- bounds

  /** Upper-exclusive cut points; pid = #bounds <= url (binary search). */
  def pidOf(bounds: Array[String], url: String): Int = {
    var lo = 0
    var hi = bounds.length // pid range is [0, bounds.length]
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (url >= bounds(mid)) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def loadOrComputeBounds(
      spark: SparkSession, input: Dataset[Page], outDir: String, cfg: Config): Array[String] = {
    val p = Paths.get(boundsPath(outDir))
    if (Files.exists(p)) {
      val txt = Files.readString(p)
      parseJsonStringArray(txt)
    } else {
      import spark.implicits._
      val total = math.max(1L, input.count())
      val fraction = math.min(1.0, cfg.seedSampleSize.toDouble / total.toDouble)
      val sample = input.select($"url").sample(withReplacement = false, fraction, seed = 42L)
        .as[String].collect().sorted
      val bounds =
        if (sample.length < cfg.numPartitions) Array.empty[String]
        else Array.tabulate(cfg.numPartitions - 1) { i =>
          sample(((i + 1).toLong * sample.length / cfg.numPartitions).toInt)
        }.distinct
      Files.createDirectories(p.getParent)
      Files.writeString(p, bounds.map(jsonQuote).mkString("[", ",", "]"))
      bounds
    }
  }

  private def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  private def parseJsonStringArray(txt: String): Array[String] = {
    // bounds are urls we wrote ourselves (quoted, \uXXXX-escaped controls)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < txt.length) {
      if (txt(i) == '"') {
        val sb = new StringBuilder
        i += 1
        while (txt(i) != '"') {
          if (txt(i) == '\\') {
            txt(i + 1) match {
              case 'u' => sb.append(Integer.parseInt(txt.substring(i + 2, i + 6), 16).toChar); i += 6
              case c   => sb.append(c); i += 2
            }
          } else { sb.append(txt(i)); i += 1 }
        }
        out += sb.toString
      }
      i += 1
    }
    out.toArray
  }

  // ---------------------------------------------------------------- encode

  def run(spark: SparkSession, input: Dataset[Page], outDir: String,
          cfg: Config = Config()): Result = {
    import spark.implicits._
    val t0 = System.nanoTime()

    val bounds = loadOrComputeBounds(spark, input, outDir, cfg)
    val tBounds = System.nanoTime()
    val boundsBc = spark.sparkContext.broadcast(bounds)

    val completed: Set[Int] =
      if (cfg.resume && Files.exists(Paths.get(manifestDir(outDir))))
        TableIO.read(spark, manifestDir(outDir)).select($"pid").as[Int].collect().toSet
      else Set.empty
    val completedBc = spark.sparkContext.broadcast(completed)

    val pidCap = cfg.pidUpperBound.getOrElse(Int.MaxValue)
    val withPid = input
      .map(p => PidPage(pidOf(boundsBc.value, p.url), p.url, p.warc_ts, p.html, p.text, p.lang))
      .filter(p => !completedBc.value.contains(p.pid) && p.pid < pidCap)

    val targetBytes = cfg.targetBlockBytes
    val maxRows = cfg.maxBlockRows
    val flOnly = cfg.codecMode == "fl"
    // Hash repartition on the (already range-derived) pid: pids are dense
    // ints in [0, numPartitions], so hashing spreads them ~1 per task
    // WITHOUT the extra sampling pass a repartitionByRange would run over
    // the whole input. Two pids hashing to one task is fine: the kernel
    // cuts chunks at pid boundaries, so output is identical either way.
    val chunks = withPid
      .repartition(cfg.numPartitions, $"pid")
      .sortWithinPartitions($"pid", $"url")
      .as[PidPage]
      .mapPartitions(it => encodePartition(it, targetBytes, maxRows, flOnly))

    TableIO.write(chunks.toDF(), chunksDir(outDir), SaveMode.Append)
    val tEncode = System.nanoTime()

    // manifest derived from what is actually on disk, restricted to the
    // pids this run produced (append-safe for resume). Payload columns are
    // pruned out before the aggregation — only metadata bytes are re-read.
    val attemptId = java.util.UUID.randomUUID().toString
    val onDisk = TableIO.read(spark, chunksDir(outDir))
      .select($"pid", $"rows", $"urlMin", $"urlMax", $"rawBytes", $"encBytes",
        $"flBaselineBytes", $"encodeNanos", $"textCrc32",
        arrays_zip($"cols.name".as("col"), $"cols.codec".as("codec")).as("colCodecs"))
      .filter(!$"pid".isin(completed.toSeq: _*))
    val codecsPerPid = onDisk
      .select($"pid", explode($"colCodecs").as("cc"))
      .select($"pid", $"cc.col".as("col"), $"cc.codec".as("codec"))
      .groupBy($"pid", $"col").agg(concat_ws("|", sort_array(collect_set($"codec"))).as("codec"))
      .groupBy($"pid").agg(map_from_entries(sort_array(collect_list(struct($"col", $"codec")))).as("codecs"))
    val manifest = onDisk
      .groupBy($"pid")
      .agg(
        count(lit(1)).as("blocks"),
        sum($"rows").as("rows"),
        min($"urlMin").as("urlMin"),
        max($"urlMax").as("urlMax"),
        sum($"rawBytes").as("rawBytes"),
        sum($"encBytes").as("encBytes"),
        sum($"flBaselineBytes").as("flBaselineBytes"),
        sum($"encodeNanos").as("encodeNanos"),
        expr("bit_xor(textCrc32)").as("textCrc32Xor"))
      .join(codecsPerPid, Seq("pid"))
      .withColumn("attemptId", lit(attemptId))
      .withColumn("finishedAtEpochMs", lit(System.currentTimeMillis()))
      .as[PartitionManifest]
    TableIO.write(manifest.toDF(), manifestDir(outDir), SaveMode.Append)

    val stats = TableIO.read(spark, manifestDir(outDir))
      .agg(count(lit(1)), sum($"rows"), sum($"rawBytes"), sum($"encBytes"), sum($"flBaselineBytes"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])].head()
    Result(
      pidsEncoded = stats._1 - completed.size,
      pidsSkipped = completed.size.toLong,
      rows = stats._2.getOrElse(0L),
      rawBytes = stats._3.getOrElse(0L),
      encBytes = stats._4.getOrElse(0L),
      flBaselineBytes = stats._5.getOrElse(0L),
      wallNanos = System.nanoTime() - t0,
      boundsNanos = tBounds - t0,
      encodeNanos = tEncode - tBounds,
      manifestNanos = System.nanoTime() - tEncode)
  }

  /** Per-partition kernel: consume (pid,url)-sorted rows, cut a chunk at
    * pid change / row cap / byte cap, encode all five columns. Pure Scala
    * (no Spark types inside) — the JVM analog of the reference's
    * cpuCompress kernel, applied per column. */
  def encodePartition(it: Iterator[PidPage], targetBlockBytes: Long, maxBlockRows: Int,
                      flOnly: Boolean = false): Iterator[EncodedChunk] = {
    new Iterator[EncodedChunk] {
      private var pending: PidPage = null
      private var blockIdxByPid = scala.collection.mutable.Map.empty[Int, Int]

      def hasNext: Boolean = pending != null || it.hasNext

      def next(): EncodedChunk = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[PidPage]
        var bufBytes = 0L
        if (pending == null) pending = it.next()
        val pid = pending.pid
        var cut = false
        while (!cut && pending != null && pending.pid == pid) {
          buf += pending
          bufBytes += pending.html.length.toLong + pending.text.length + pending.url.length + 16
          pending = if (it.hasNext) it.next() else null
          cut = buf.length >= maxBlockRows || bufBytes >= targetBlockBytes
        }
        val idx = blockIdxByPid.getOrElse(pid, 0)
        blockIdxByPid(pid) = idx + 1
        encodeChunk(pid, idx, buf.toArray, flOnly)
      }
    }
  }

  def encodeChunk(pid: Int, blockIdx: Int, rows: Array[PidPage],
                  flOnly: Boolean = false): EncodedChunk = {
    val t0 = System.nanoTime()
    val urls = rows.map(_.url.getBytes(UTF_8))
    val texts = rows.map(_.text.getBytes(UTF_8))
    val htmls = rows.map(_.html)
    val langsB = rows.map(_.lang.getBytes(UTF_8))
    val tsNulls = if (rows.exists(_.warc_ts == null)) rows.map(_.warc_ts == null) else null
    val tsMicros = rows.map { r =>
      val ts = r.warc_ts
      if (ts == null) 0L
      else math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    }

    val crc = new CRC32()
    texts.foreach(t => crc.update(t))

    val encoded = Seq(
      "url" -> ColumnCodec.encodeBytes(urls, flOnly),
      "warc_ts" -> ColumnCodec.encodeLongs(tsMicros, tsNulls, flOnly),
      "html" -> ColumnCodec.encodeBytes(htmls, flOnly),
      "text" -> ColumnCodec.encodeBytes(texts, flOnly),
      "lang" -> ColumnCodec.encodeBytes(langsB, flOnly))
    val cols = encoded.map { case (name, e) =>
      EncodedColumn(name, e.codecName, e.bytes, e.rawBytes, e.bytes.length.toLong, e.flBaselineBytes)
    }
    EncodedChunk(
      pid, blockIdx, rows.length.toLong,
      rows.head.url, rows.last.url,
      cols.map(_.rawBytes).sum, cols.map(_.encBytes).sum, cols.map(_.flBaselineBytes).sum,
      System.nanoTime() - t0, crc.getValue, cols)
  }
}
