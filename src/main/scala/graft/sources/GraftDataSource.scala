package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.OptionalLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.parquet.schema.{GroupType, MessageType, Type => PType, Types}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.catalog.SupportsWrite
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, InsertableRelation, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.ColumnCodec

/** DataSource V2 read surface for the engine's encoded chunk table —
  * the declarative twin of the reference CLI's decompress direction
  * (/root/reference/src/main.cu:22-31 dispatches compress/decompress
  * over files; here the compressed table becomes a Catalyst relation),
  * with the write half fronting the compress direction the same way:
  *
  * {{{ spark.read.format("graft").load(encodeDir) }}}
  *
  * presents the decoded Page table (url, warc_ts, html, text, lang) as a
  * first-class Catalyst relation. The connector implements the two
  * pushdowns the chunk layout was designed for (see EncodedChunk's
  * scaladoc and DecodeJob.runProjected):
  *
  *  - '''Column pruning''' ([[SupportsPushDownRequiredColumns]]): only
  *    the requested columns' `block` leaves are read from the chunk
  *    parquet — the reader builds a pruned parquet MessageType, so
  *    `select(url)` never touches text/html bytes on disk.
  *  - '''url-range predicates''' ([[SupportsPushDownFilters]]):
  *    `>=`/`<=`/`=` on `url` are consumed by the scan — parquet row
  *    groups whose (urlMin, urlMax) STATISTICS cannot intersect the
  *    bounds are skipped with zero I/O, surviving groups' chunks are
  *    pruned on the same metadata before any block is decoded (the
  *    chunk-level analog of partition pruning), then rows are filtered
  *    exactly on the decoded url bytes. The comparison is UTF-8 byte
  *    order on all levels — the SAME order Spark's own string
  *    comparison (UTF8String) uses, so consuming the filter is
  *    semantics-preserving.
  *  - '''warc_ts-range predicates''': `>=`/`<=`/`=` on `warc_ts` get
  *    the same three-level skip through the chunk (tsMin, tsMax) epoch-
  *    micros statistics (row-group stats → chunk stats → exact decoded
  *    micros). Pre-round-7 tables without ts statistics fall back to
  *    the exact row filter alone — never a wrong prune. All other
  *    predicates are returned as residuals for Spark to evaluate.
  *  - '''count(*) pushdown''' ([[SupportsPushDownAggregates]]): a
  *    global unfiltered count is answered from the chunk metadata
  *    `rows` column in O(#chunks) without touching a payload byte —
  *    see [[GraftScanBuilder]].
  *
  * Values are emitted as [[InternalRow]]s built directly on the decoded
  * block views (`UTF8String.fromBytes` over the shared payload buffer —
  * no per-cell String round-trip), and `warc_ts` micros pass through
  * unconverted (InternalRow's native timestamp representation).
  *
  * Scale shape: one [[InputPartition]] per chunk file (the same
  * granularity the encoder committed — bounded by the 65k-row/16 MB
  * chunk caps, so a reader task's memory is bounded regardless of table
  * size), planned from ONE `listStatus` RPC. [[SupportsReportStatistics]]
  * reports the summed compressed file size so AQE can broadcast a small
  * encoded dimension table without being told to. */
final class GraftDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDataSource.PageSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft source requires a path: spark.read.format(\"graft\").load(<encodeDir>)")
    new GraftTable(path)
  }
}

object GraftDataSource {
  /** The decoded Page schema, exactly the input_hint shape. Fully
    * nullable on BOTH sides except the one real key constraint: the
    * codec blocks carry null bitmaps for warc_ts/html/text/lang (null
    * rows round-trip as nulls through every front door), while `url` —
    * the range/sort key with no null representation — is enforced
    * non-null by the writer with a named per-row error. */
  val PageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))
}

final class GraftTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft.`$path`"
  override def schema(): StructType = GraftDataSource.PageSchema
  override def capabilities(): java.util.Set[TableCapability] =
    // BATCH_WRITE is what DataFrameWriter's capability check looks for;
    // V1_BATCH_WRITE is what routes the built V1Write through the
    // InsertableRelation exec. Both are required.
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(path, info)
}

/** The write half: `df.write.format("graft").save(encodeDir)` runs the
  * FULL production encode pipeline (bounds sampling, url-range pid
  * assignment, codec selection, chunk+manifest commit, attempt lineage)
  * behind the standard DSv2 writer API, via the [[V1Write]] bridge —
  * the same delegation Spark's own JDBC v2 connector uses. Deliberate:
  * a second, native `BatchWrite` implementation of the encode would be
  * a drift-prone twin of `EncodeJob` with FEWER guarantees (no bounds
  * pinning, no resume, no orphan reconcile); one write pipeline, two
  * front doors.
  *
  * Mode semantics follow the engine's contract, not append-merge:
  *  - `overwrite` — re-encode from scratch; onto an EXISTING table it
  *    stages into a sibling dir and swaps only after the full pipeline
  *    commits, so a failed overwrite leaves the original table intact.
  *  - `append` on a FRESH directory — a plain encode.
  *  - `append` on an EXISTING table — refused unless
  *    `option("resume", "true")` is set, because the engine's append
  *    is the north-rule crash-resume: pids already committed in the
  *    manifest are SKIPPED, which completes an interrupted write of
  *    the SAME data but silently drops genuinely new rows. The
  *    explicit option turns that silent-loss foot-gun into a stated
  *    choice; incremental ingest of NEW data is the streaming front
  *    end's job ([[graft.streaming.StreamingEncode]]), which carries
  *    the exactly-once batch lineage a blind append cannot.
  *
  * The writer enforces the ONE key constraint up front: `url` (the
  * range/sort key — it has no null representation) must be non-null,
  * failing with a codegen'd per-row named error. warc_ts / html / text
  * / lang nulls are legal NULL ROWS carried by the codec null bitmaps —
  * the same data the engine's CLI surface accepts, so a
  * read-graft → write-graft round trip of any engine-produced table
  * succeeds.
  *
  * Options: `partitions` pins the pid count; otherwise it is sized by
  * the 128 MiB-raw/pid rule from Catalyst's plan-size estimate (no
  * extra job; estimates above 1 TiB fall back to the cores floor —
  * pass `partitions` explicitly at that scale). */
final class GraftWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new GraftInsertableRelation(path, overwrite, info.options())
  }
}

final class GraftInsertableRelation(path: String, truncate: Boolean,
                                    options: CaseInsensitiveStringMap)
    extends InsertableRelation {
  override def insert(data: org.apache.spark.sql.DataFrame, overwriteArg: Boolean): Unit = {
    import org.apache.spark.sql.{functions => F}
    val spark = data.sparkSession
    val doOverwrite = truncate || overwriteArg
    if (!doOverwrite &&
        TableIO.exists(spark, graft.jobs.EncodeJob.manifestDir(path)) &&
        !Option(options.get("resume")).exists(_.toBoolean))
      throw new IllegalArgumentException(
        s"graft write: table at $path already has committed partitions, and the " +
          "engine's append is a crash-RESUME (manifest-committed pids are skipped, " +
          "so appending genuinely new rows would silently drop them). Re-issue the " +
          "interrupted write of the SAME data with .option(\"resume\", \"true\"), " +
          "use mode(\"overwrite\") to replace the table, or use " +
          "graft.streaming.StreamingEncode for incremental ingest of new data.")
    // the one NAMED per-row guard the kernel needs: url is the range/
    // sort key with no null representation. html/text/lang nulls are
    // REAL null rows — the codec null bitmaps carry them and the decode
    // paths emit them back (the engine's own CLI surface accepts them,
    // and the two front doors to one pipeline must agree on what data
    // is legal); only the key column fails.
    val pages = data.select(
        F.when(F.col("url").isNull, F.raise_error(F.lit(
          "graft write: column 'url' must be non-null (urls are the range key)")))
          .otherwise(F.col("url")).as("url"),
        F.col("warc_ts"), F.col("html"), F.col("text"), F.col("lang"))
      .as[graft.model.Page](org.apache.spark.sql.Encoders.product[graft.model.Page])
    val parts = Option(options.get("partitions")).map(_.toInt).getOrElse {
      // x3 converts ON-DISK parquet bytes to raw (the PipelineCli
      // calibration). A plan whose stats already approximate raw — e.g.
      // a graft-to-graft re-encode, where the DSv2 read reports ~4x
      // disk — over-partitions ~3x, the SAFE direction (smaller pids
      // never spill; they just make more files). Pass `partitions`
      // explicitly to pin it.
      val est = data.queryExecution.optimizedPlan.stats.sizeInBytes
      val raw = if (est < BigInt(1L << 40)) est.toLong * 3 else 0L
      graft.jobs.EncodeJob.suggestPartitions(raw, spark.sparkContext.defaultParallelism)
    }
    // wholeTableStats=false: this caller DISCARDS EncodeJob.Result, so
    // the end-of-run whole-manifest totals aggregation would be a pure
    // extra job per write (the CLI, which prints the totals, keeps it on)
    val cfg = graft.jobs.EncodeJob.Config(numPartitions = parts,
      codecMode = Option(options.get("codecMode")).getOrElse("auto"),
      wholeTableStats = false)
    if (doOverwrite && TableIO.exists(spark, path)) {
      // STAGE-THEN-SWAP: encode into a sibling staging dir while the old
      // table stays intact, and only after the full pipeline commits do
      // delete + rename run. A failed overwrite (null url, executor
      // loss, codec error) therefore leaves the ORIGINAL table readable
      // — delete-first would destroy it with nothing to replace it. The
      // crash window shrinks to the delete+rename pair; a crash inside
      // it leaves the complete staging dir on disk for manual recovery
      // (named after the target).
      // Trailing slashes are stripped BEFORE deriving the staging name:
      // save("/data/t/") would otherwise stage at "/data/t/.__overwrite-…"
      // — a CHILD of the table dir that deleteRecursive(path) destroys
      // before the rename, losing both copies. Belt-and-braces assert
      // that staging really is a sibling.
      val normPath = path.replaceAll("/+$", "")
      require(normPath.nonEmpty && new HPath(normPath).getParent != null,
        s"graft write: refusing to overwrite filesystem root '$path'")
      val staging = s"$normPath.__overwrite-${java.util.UUID.randomUUID().toString.take(8)}"
      require(!staging.startsWith(normPath + "/"),
        s"graft write: staging dir $staging must not be a descendant of $normPath")
      // explicit swap-phase flag, NOT an exists(path) probe: a
      // deleteRecursive that throws PARTWAY leaves the half-deleted
      // target existing, and the probe would then delete staging — the
      // only complete copy — contradicting the crash-recovery contract
      // that staging survives once the swap begins
      var swapStarted = false
      try {
        graft.jobs.EncodeJob.run(spark, pages, staging, cfg)
        swapStarted = true
        TableIO.deleteRecursive(spark, normPath)
        val hconf = spark.sessionState.newHadoopConf()
        val dst = new HPath(normPath)
        val fs = dst.getFileSystem(hconf)
        require(fs.rename(new HPath(staging), dst),
          s"graft write: rename $staging -> $normPath failed after the old table was " +
            "removed; the complete new table is intact at the staging path")
      } catch {
        case e: Throwable =>
          // best-effort staging cleanup ONLY when the failure predates
          // the swap; once the swap begins, staging may be the sole
          // surviving copy — keep it
          if (!swapStarted)
            try TableIO.deleteRecursive(spark, staging)
            catch { case s: Exception => e.addSuppressed(s) }
          throw e
      }
    } else {
      if (doOverwrite) TableIO.deleteRecursive(spark, path)
      graft.jobs.EncodeJob.run(spark, pages, path, cfg)
    }
  }
}

/** Accumulates the pushdowns. Multiple bounds on `url`/`warc_ts` are ALL
  * kept (list, not max/min-folded): the reader applies every bound, so
  * consuming `url >= a AND url >= b` never widens the predicate.
  *
  * `warc_ts` bounds arrive as [[java.time.Instant]] (the default Java-8
  * datetime API) or [[java.sql.Timestamp]] (legacy conf) and are
  * normalized to epoch MICROS — the exact representation the encode
  * kernel stored and the chunk's (tsMin, tsMax) statistics use, so the
  * three-level skip (chunk stats, parquet row-group stats, exact decoded
  * row) is lossless.
  *
  * [[SupportsPushDownAggregates]]: global `count(*)` / `count(url)`
  * (url is non-null by the encode contract), `min/max(url)` and
  * `min/max(warc_ts)` — with no grouping and no pushed predicates —
  * are answered from the chunk table's METADATA columns (`rows`,
  * `urlMin`/`urlMax`, `tsMin`/`tsMax`): O(#chunks) values, zero
  * payload-block bytes. Pushed as PARTIAL aggregates (one per-file
  * subtotal per input partition; Spark's final aggregate merges),
  * which is what keeps them correct on a multi-partition relation —
  * complete pushdown would emit one "total" per file. Refused whenever
  * predicates were consumed: bounds prune chunks only approximately,
  * so metadata cannot answer a filtered aggregate exactly. */
/** The consumed scan bounds, shipped to every partition reader: url
  * bounds as UTF-8 bytes (inclusive and STRICT kept apart — strings
  * have no exact successor, so `url > v` cannot fold to an inclusive
  * bound) and warc_ts bounds as epoch micros (always inclusive: micros
  * are integral, so the builder folds `> t` to `>= t+1µs`). Statistics-
  * level prunes (parquet row groups, chunk metadata) apply every bound
  * NON-strictly — conservative-correct for strict bounds — while the
  * exact decoded-row filters honor strictness. */
final case class GraftBounds(
    urlLo: Array[Array[Byte]], urlHi: Array[Array[Byte]],
    urlLoStrict: Array[Array[Byte]], urlHiStrict: Array[Array[Byte]],
    tsLo: Array[Long], tsHi: Array[Long]) {
  def hasUrl: Boolean =
    urlLo.nonEmpty || urlHi.nonEmpty || urlLoStrict.nonEmpty || urlHiStrict.nonEmpty
  def hasTs: Boolean = tsLo.nonEmpty || tsHi.nonEmpty
  def isEmpty: Boolean = !hasUrl && !hasTs
  // stats-level views: strict url bounds weaken to non-strict (a chunk/
  // group whose max EQUALS a strict lower bound may still hold no
  // matching row — the exact filter settles it)
  def allUrlLo: Array[Array[Byte]] = urlLo ++ urlLoStrict
  def allUrlHi: Array[Array[Byte]] = urlHi ++ urlHiStrict
  def chunkUrlOverlaps(mn: Array[Byte], mx: Array[Byte]): Boolean =
    allUrlLo.forall(lo => java.util.Arrays.compareUnsigned(mx, lo) >= 0) &&
      allUrlHi.forall(hi => java.util.Arrays.compareUnsigned(mn, hi) <= 0)
  def chunkTsOverlaps(mn: Long, mx: Long): Boolean =
    tsLo.forall(mx >= _) && tsHi.forall(mn <= _)
  def describe: String =
    (urlLo.map(l => s"url >= '${new String(l, UTF_8)}'") ++
      urlLoStrict.map(l => s"url > '${new String(l, UTF_8)}'") ++
      urlHi.map(h => s"url <= '${new String(h, UTF_8)}'") ++
      urlHiStrict.map(h => s"url < '${new String(h, UTF_8)}'") ++
      tsLo.map(l => s"warc_ts_micros >= $l") ++
      tsHi.map(h => s"warc_ts_micros <= $h")).mkString(", ")
}

final class GraftScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates {
  private var required: StructType = GraftDataSource.PageSchema
  private var los: List[String] = Nil
  private var his: List[String] = Nil
  private var losStrict: List[String] = Nil
  private var hisStrict: List[String] = Nil
  private var tsLos: List[Long] = Nil
  private var tsHis: List[Long] = Nil
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = 0

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands back a subset of PageSchema in its own order; honor it
    // verbatim (an empty projection — count(*) — is legal and yields
    // zero-width rows)
    required = requiredSchema

  /** Pushed timestamp literal → epoch micros (the kernel's and the chunk
    * statistics' representation — graft.model.TsMicros is the one
    * Timestamp definition; Instant is this call site's own case). */
  private def tsMicros(v: Any): Option[Long] = v match {
    case i: java.time.Instant =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        (i.getNano / 1000).toLong))
    case t: java.sql.Timestamp => Some(graft.model.TsMicros.micros(t))
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def consume(f: Filter): Boolean = f match {
      case GreaterThanOrEqual("url", v: String) => los ::= v; true
      case LessThanOrEqual("url", v: String) => his ::= v; true
      case GreaterThan("url", v: String) => losStrict ::= v; true
      case LessThan("url", v: String) => hisStrict ::= v; true
      case EqualTo("url", v: String) => los ::= v; his ::= v; true
      case GreaterThanOrEqual("warc_ts", v) =>
        tsMicros(v).exists { m => tsLos ::= m; true }
      case LessThanOrEqual("warc_ts", v) =>
        tsMicros(v).exists { m => tsHis ::= m; true }
      // micros are integral, so strict ts bounds fold to inclusive ±1µs
      // EXACTLY; the Long.MaxValue/MinValue edges stay residual rather
      // than wrap
      case GreaterThan("warc_ts", v) =>
        tsMicros(v).exists { m => if (m == Long.MaxValue) false else { tsLos ::= m + 1L; true } }
      case LessThan("warc_ts", v) =>
        tsMicros(v).exists { m => if (m == Long.MinValue) false else { tsHis ::= m - 1L; true } }
      case EqualTo("warc_ts", v) =>
        tsMicros(v).exists { m => tsLos ::= m; tsHis ::= m; true }
      case _ => false
    }
    val (acc, residual) = filters.partition(consume)
    pushed = acc
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val noPredicates = los.isEmpty && his.isEmpty && losStrict.isEmpty &&
      hisStrict.isEmpty && tsLos.isEmpty && tsHis.isEmpty
    if (!noPredicates || aggregation.groupByExpressions.nonEmpty ||
        aggregation.aggregateExpressions.isEmpty) return false
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
        case _ => None
      }
    // every supported aggregate is answerable EXACTLY from chunk
    // metadata: rows (counts — url is non-null by the encode contract,
    // so count(url) == count(*)), urlMin/urlMax (the chunk's true row
    // min/max — the kernel sorts by url), tsMin/tsMax (exact non-null
    // min/max; SQL min/max skip nulls, so the stats ARE the answer)
    val toks = aggregation.aggregateExpressions.map {
      case _: CountStar => "count"
      case c: Count if !c.isDistinct && colOf(c.column).contains("url") => "count"
      case m: Min => colOf(m.column) match {
        case Some("url") => "min_url"
        case Some("warc_ts") => "min_ts"
        case _ => return false
      }
      case m: Max => colOf(m.column) match {
        case Some("url") => "max_url"
        case Some("warc_ts") => "max_ts"
        case _ => return false
      }
      case _ => return false
    }
    aggTokens = toks
    true
  }
  private var aggTokens: Array[String] = Array.empty

  override def build(): Scan = {
    val bounds = GraftBounds(
      los.map(_.getBytes(UTF_8)).toArray, his.map(_.getBytes(UTF_8)).toArray,
      losStrict.map(_.getBytes(UTF_8)).toArray, hisStrict.map(_.getBytes(UTF_8)).toArray,
      tsLos.toArray, tsHis.toArray)
    new GraftScan(path, required, bounds, aggTokens)
  }
}

final case class GraftInputPartition(file: String, length: Long) extends InputPartition

final class GraftScan(path: String, required: StructType,
                      bounds: GraftBounds, aggTokens: Array[String])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType =
    if (aggTokens.nonEmpty)
      // partial-aggregate output, one field per pushed aggregate in
      // Spark's order (it binds by position; names are cosmetic):
      // counts are non-null LongType, min/max carry the column's type
      // and are null for an empty table / all-null ts — exactly the
      // SQL answer Spark's final min/max then preserves
      StructType(aggTokens.zipWithIndex.map { case (t, i) =>
        t match {
          case "count" =>
            StructField(s"agg_$i", org.apache.spark.sql.types.LongType, nullable = false)
          case "min_url" | "max_url" => StructField(s"agg_$i", StringType)
          case "min_ts" | "max_ts" => StructField(s"agg_$i", TimestampType)
        }
      })
    else required
  override def toBatch: Batch = this

  override def description(): String = {
    val aggNames = aggTokens.map {
      case "count" => "COUNT(*)"
      case "min_url" => "MIN(url)"
      case "max_url" => "MAX(url)"
      case "min_ts" => "MIN(warc_ts)"
      case "max_ts" => "MAX(warc_ts)"
    }
    val agg = if (aggTokens.nonEmpty) s" PushedAggregates=[${aggNames.mkString(",")}]" else ""
    s"GraftScan path=$path ReadColumns=[${required.fieldNames.mkString(",")}] " +
      s"PushedBounds=[${bounds.describe}]$agg"
  }

  private lazy val partitions: Array[GraftInputPartition] = {
    val spark = SparkSession.active
    // the listing below assumes the parquet chunk layout; under another
    // configured table format (e.g. iceberg: data/ + metadata/ subdirs)
    // it would see no plain files and silently return an EMPTY relation
    // for a populated table — fail loudly instead
    val fmt = TableIO.format(spark)
    require(fmt == "parquet",
      s"graft DSv2 read supports the parquet chunk layout; " +
        s"spark.graft.table.format=$fmt is configured — read this table " +
        "through DecodeJob/TableIO instead")
    val hconf = spark.sessionState.newHadoopConf()
    val root = new HPath(path)
    val fs = root.getFileSystem(hconf)
    require(fs.exists(root),
      s"graft source: no such encode directory: $path")
    val chunks = new HPath(root, "chunks")
    // an encode of an EMPTY input commits no chunks dir — that is a
    // valid zero-row table, not an error (mirror chunkMetaScan's
    // pinned-schema behavior)
    if (!fs.exists(chunks)) Array.empty
    else fs.listStatus(chunks)
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && st.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(st => GraftInputPartition(st.getPath.toString, st.getLen))
  }

  override def planInputPartitions(): Array[InputPartition] =
    if (aggTokens.nonEmpty && partitions.isEmpty)
      // sentinel for the empty table: count(*) must be 0 (not NULL from
      // an empty sum of partials) and min/max must be one null partial
      Array(GraftInputPartition("", 0L))
    else partitions.toArray[InputPartition]

  override def estimateStatistics(): Statistics = new Statistics {
    // raw compressed bytes UNDERSTATE the decoded relation ~4x (the
    // measured corpus ratio), and an underestimate is the unsafe
    // direction for broadcast decisions — a 9 MB-on-disk table that
    // decodes to 90 MB must not slip under the autoBroadcast
    // threshold. Scale by the ratio ceiling (same idea as Spark's
    // fileCompressionFactor); conf-overridable per deployment.
    override def sizeInBytes(): OptionalLong = {
      val factor = SparkSession.active.conf
        .getOption("spark.graft.read.sizeFactor")
        .flatMap(_.toDoubleOption).getOrElse(4.0)
      OptionalLong.of((partitions.map(_.length).sum * factor).toLong)
    }
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // one shared Configuration wire format in the codebase (Spark's own
    // SerializableConfiguration is private[spark] at the Scala level)
    val conf = new graft.jobs.FlFileJob.SerializableConf(
      SparkSession.active.sessionState.newHadoopConf())
    new GraftReaderFactory(conf, required.fieldNames, bounds, aggTokens)
  }
}

final class GraftReaderFactory(conf: graft.jobs.FlFileJob.SerializableConf,
                               columns: Array[String],
                               bounds: GraftBounds,
                               aggTokens: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    if (aggTokens.nonEmpty)
      new GraftAggReader(p.asInstanceOf[GraftInputPartition].file,
        conf.value, aggTokens)
    else
      new GraftPartitionReader(p.asInstanceOf[GraftInputPartition].file,
        conf.value, columns, bounds)
}

/** Partial pushed aggregates straight off the chunk table's METADATA
  * columns: ONE row per chunk file carrying the file's subtotals —
  * count from `rows`, min/max url from (urlMin, urlMax) (the chunk's
  * true row extrema: the kernel sorts by url), min/max warc_ts from
  * (tsMin, tsMax) (exact non-null extrema; SQL min/max skip nulls, so
  * the statistics ARE the answer). Reads only the referenced metadata
  * leaves — no payload block is ever touched — so the cost is
  * O(#chunks) regardless of table bytes. One exception keeps legacy
  * tables correct: a pre-round-7 file without ts statistics falls back
  * to decoding the warc_ts BLOCKS (still only that one column) for the
  * ts extrema. Spark's final aggregate merges the partials (partial
  * pushdown — see [[GraftScanBuilder]]). */
final class GraftAggReader(file: String, conf: Configuration, tokens: Array[String])
    extends PartitionReader[InternalRow] {
  // "" is the empty-table sentinel partition (see planInputPartitions):
  // zero scan partitions would make Spark's final sum-of-partials NULL
  // where count(*) must be 0; min/max correctly stay null
  private val reader =
    if (file.isEmpty) null
    else ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(file), conf))
  private var done = false
  private var total = 0L
  private var minUrl: Array[Byte] = null
  private var maxUrl: Array[Byte] = null
  private var haveTs = false
  private var minTs = 0L
  private var maxTs = 0L

  private val needCount = tokens.contains("count")
  private val needUrl = tokens.contains("min_url") || tokens.contains("max_url")
  private val needTs = tokens.contains("min_ts") || tokens.contains("max_ts")

  private def seeTs(v: Long): Unit = {
    if (!haveTs) { haveTs = true; minTs = v; maxTs = v }
    else { if (v < minTs) minTs = v; if (v > maxTs) maxTs = v }
  }

  override def next(): Boolean = {
    if (done) return false
    if (reader == null) { done = true; return true }
    try {
      val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema
      val fsGroup: GroupType = fileSchema
      val hasTsStats = !needTs ||
        (fsGroup.containsField("tsMin") && fsGroup.containsField("tsMax"))
      val fields = scala.collection.mutable.ArrayBuffer.empty[PType]
      if (needCount) fields += fsGroup.getType("rows")
      if (needUrl) { fields += fsGroup.getType("urlMin"); fields += fsGroup.getType("urlMax") }
      if (needTs && hasTsStats) {
        fields += fsGroup.getType("tsMin"); fields += fsGroup.getType("tsMax")
      }
      if (needTs && !hasTsStats) {
        val g = fsGroup.getType("warc_ts").asGroupType()
        fields += new GroupType(g.getRepetition, g.getName, g.getType("block"))
      }
      val rq = Types.buildMessage().addFields(fields.toSeq: _*).named(fileSchema.getName)
      reader.setRequestedSchema(rq)
      val columnIO = new ColumnIOFactory().getColumnIO(rq, fileSchema)
      var pages = reader.readNextRowGroup()
      while (pages != null) {
        val rr = columnIO.getRecordReader(pages, new GroupRecordConverter(rq))
        var left = pages.getRowCount
        while (left > 0L) {
          val g = rr.read()
          if (needCount) total = Math.addExact(total, g.getLong("rows", 0))
          if (needUrl) {
            val mn = g.getBinary("urlMin", 0).getBytes
            val mx = g.getBinary("urlMax", 0).getBytes
            if (minUrl == null || java.util.Arrays.compareUnsigned(mn, minUrl) < 0) minUrl = mn
            if (maxUrl == null || java.util.Arrays.compareUnsigned(mx, maxUrl) > 0) maxUrl = mx
          }
          if (needTs) {
            if (hasTsStats) {
              // null stats = all-null-ts chunk: contributes nothing,
              // exactly like SQL min/max over its rows
              if (g.getFieldRepetitionCount("tsMin") > 0) {
                seeTs(g.getLong("tsMin", 0)); seeTs(g.getLong("tsMax", 0))
              }
            } else {
              val col = g.getGroup("warc_ts", 0)
              require(col.getFieldRepetitionCount("block") > 0,
                s"chunk in $file: null warc_ts block")
              val (micros, nulls) = ColumnCodec.decodeLongs(col.getBinary("block", 0).getBytes)
              var j = 0
              while (j < micros.length) {
                if (nulls == null || !nulls(j)) seeTs(micros(j))
                j += 1
              }
            }
          }
          left -= 1
        }
        pages = reader.readNextRowGroup()
      }
    } finally done = true
    true
  }
  override def get(): InternalRow =
    new GenericInternalRow(tokens.map[Any] {
      case "count" => total
      case "min_url" => if (minUrl == null) null else UTF8String.fromBytes(minUrl)
      case "max_url" => if (maxUrl == null) null else UTF8String.fromBytes(maxUrl)
      case "min_ts" => if (haveTs) java.lang.Long.valueOf(minTs) else null
      case "max_ts" => if (haveTs) java.lang.Long.valueOf(maxTs) else null
    })
  override def close(): Unit = if (reader != null) reader.close()
}

/** Reads ONE chunk parquet file with a pruned parquet schema (only the
  * requested columns' block leaves + the metadata primitives), decodes
  * each chunk row's blocks with [[ColumnCodec]], and emits InternalRows
  * straight off the decoded views. */
final class GraftPartitionReader(file: String, conf: Configuration,
                                 columns: Array[String],
                                 bounds: GraftBounds)
    extends PartitionReader[InternalRow] {

  private val hasUrlBounds = bounds.hasUrl
  private val hasTsBounds = bounds.hasTs
  private val needText = columns.contains("text")
  // blocks decoded beyond the projection: url for exact url-range
  // filtering, warc_ts for exact ts-range filtering
  private val blockCols: Array[String] = {
    var cs = columns
    if (hasUrlBounds && !cs.contains("url")) cs = cs :+ "url"
    if (hasTsBounds && !cs.contains("warc_ts")) cs = cs :+ "warc_ts"
    cs
  }

  private val reader =
    ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(file), conf))

  // anything that throws between open() and a successfully constructed
  // reader (schema lookup on a pre-columnar-layout file, a corrupt
  // stats column tripping the row-group filter below, …) must not leak
  // the parquet input stream: Spark only close()es readers that
  // createReader returned
  // plain tuple + field extraction, NOT a destructuring pattern: a
  // typed pattern (`keptGroups: java.util.Set[...]`) refuses to match
  // null, and keptGroups is legitimately null when no bounds are pushed
  private val init: (MessageType, org.apache.parquet.io.MessageColumnIO, Boolean,
      java.util.Set[org.apache.parquet.hadoop.metadata.BlockMetaData]) =
    try {
      val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema
      // upcast to GroupType: MessageType inherits a varargs getType
      // overload that makes the String call ambiguous
      val fsGroup: GroupType = fileSchema
      // ts statistics are schema-gated per FILE: a pre-round-7 chunk
      // file has no tsMin/tsMax columns, and a predicate referencing a
      // missing column would make the row-group statistics filter treat
      // it as all-null and WRONGLY drop every group — such files fall
      // back to exact row filtering on the decoded warc_ts block
      val tsStats = hasTsBounds &&
        fsGroup.containsField("tsMin") && fsGroup.containsField("tsMax")
      /* Pruned parquet projection: metadata primitives + ONLY the needed
       * columns' `block` leaves — select(url) never reads text bytes. */
      val fields = scala.collection.mutable.ArrayBuffer.empty[PType]
      def add(n: String): Unit = fields += fsGroup.getType(n)
      add("pid"); add("blockIdx"); add("rows")
      if (needText) add("textCrc32")
      if (hasUrlBounds) { add("urlMin"); add("urlMax") }
      if (tsStats) { add("tsMin"); add("tsMax") }
      blockCols.foreach { c =>
        val g = fsGroup.getType(c).asGroupType()
        fields += new GroupType(g.getRepetition, g.getName, g.getType("block"))
      }
      val rq = Types.buildMessage().addFields(fields.toSeq: _*).named(fileSchema.getName)
      // THE pruning call: readNextRowGroup() reads only the requested
      // columns' chunks from disk. Without it the reader defaults to the
      // full file schema and the MessageType above would prune record
      // ASSEMBLY only — every text/html byte still coming off the disk.
      reader.setRequestedSchema(rq)

      // row-group STATISTICS filter on the chunk metadata columns: a row
      // group whose (urlMin, urlMax) / (tsMin, tsMax) stats cannot
      // intersect the pushed bounds is SKIPPED before any of its column
      // chunks are read (skipNextRowGroup below — zero I/O for dropped
      // groups). A group's stats span the UNION of the chunk rows it
      // holds (pid-hash file assignment mixes ranges within a file), so
      // this prunes at row-group granularity; the per-chunk-row prune in
      // decodeChunkRow then skips the decode of individual non-matching
      // chunks the surviving group still carries. Applied AFTER open
      // (not as a record filter at open time) so the predicate can be
      // built against the columns this file's schema actually has.
      // Strict url bounds weaken to non-strict here — conservative.
      val kept: java.util.Set[org.apache.parquet.hadoop.metadata.BlockMetaData] = {
        import org.apache.parquet.filter2.predicate.FilterApi
        import org.apache.parquet.io.api.Binary
        val preds = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.parquet.filter2.predicate.FilterPredicate]
        if (hasUrlBounds) {
          bounds.allUrlLo.foreach(lo => preds += FilterApi.gtEq(
            FilterApi.binaryColumn("urlMax"), Binary.fromConstantByteArray(lo)))
          bounds.allUrlHi.foreach(hi => preds += FilterApi.ltEq(
            FilterApi.binaryColumn("urlMin"), Binary.fromConstantByteArray(hi)))
        }
        if (tsStats) {
          // an all-null-ts chunk stores null stats; parquet's statistics
          // visitor then drops the group for gtEq/ltEq — CORRECT here, a
          // ts-range predicate cannot match a null ts (SQL comparison)
          bounds.tsLo.foreach(lo => preds += FilterApi.gtEq(
            FilterApi.longColumn("tsMax"), java.lang.Long.valueOf(lo)))
          bounds.tsHi.foreach(hi => preds += FilterApi.ltEq(
            FilterApi.longColumn("tsMin"), java.lang.Long.valueOf(hi)))
        }
        if (preds.isEmpty) null
        else {
          val filter = org.apache.parquet.filter2.compat.FilterCompat.get(
            preds.reduce(FilterApi.and(_, _)))
          // BlockMetaData has identity equality, so the HashSet is an
          // identity set over the reader's own block list
          new java.util.HashSet(
            org.apache.parquet.filter2.compat.RowGroupFilter.filterRowGroups(
              filter, reader.getRowGroups, fileSchema))
        }
      }
      (rq, new ColumnIOFactory().getColumnIO(rq, fileSchema), tsStats, kept)
    } catch {
      case e: Throwable =>
        try reader.close() catch { case s: Exception => e.addSuppressed(s) }
        throw e
    }
  private def reqSchema = init._1
  private def columnIO = init._2
  private def hasTsStats = init._3
  private def keptGroups = init._4

  private val allGroups = reader.getRowGroups
  private var groupOrdinal = 0

  private var rowsLeftInGroup: Long = 0L
  private var recordReader: org.apache.parquet.io.RecordReader[Group] = null
  private var rowIter: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = null

  override def next(): Boolean = {
    while (!rowIter.hasNext) {
      if (rowsLeftInGroup == 0L) {
        while (keptGroups != null && groupOrdinal < allGroups.size() &&
            !keptGroups.contains(allGroups.get(groupOrdinal))) {
          reader.skipNextRowGroup()
          groupOrdinal += 1
        }
        val pages = reader.readNextRowGroup()
        if (pages == null) return false
        groupOrdinal += 1
        rowsLeftInGroup = pages.getRowCount
        recordReader =
          columnIO.getRecordReader(pages, new GroupRecordConverter(reqSchema))
      }
      if (rowsLeftInGroup > 0L) {
        val g = recordReader.read()
        rowsLeftInGroup -= 1
        rowIter = decodeChunkRow(g)
      }
    }
    current = rowIter.next()
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()

  private def blockOf(g: Group, pid: Int, blockIdx: Int, name: String): Array[Byte] = {
    require(g.getFieldRepetitionCount(name) > 0,
      s"chunk pid=$pid blockIdx=$blockIdx has no '$name' column block — " +
        "written by a pre-columnar-layout encoder? Re-encode the table.")
    val col = g.getGroup(name, 0)
    require(col.getFieldRepetitionCount("block") > 0,
      s"chunk pid=$pid blockIdx=$blockIdx: null '$name' block")
    col.getBinary("block", 0).getBytes
  }

  private def decodeChunkRow(g: Group): Iterator[InternalRow] = {
    val pid = g.getInteger("pid", 0)
    val blockIdx = g.getInteger("blockIdx", 0)
    val n = g.getLong("rows", 0).toInt
    if (hasUrlBounds) {
      // chunk-level pruning on (urlMin, urlMax) BEFORE any block decode
      if (!bounds.chunkUrlOverlaps(
          g.getBinary("urlMin", 0).getBytes, g.getBinary("urlMax", 0).getBytes))
        return Iterator.empty
    }
    if (hasTsStats) {
      // chunk-level pruning on (tsMin, tsMax): a null stat pair means
      // every ts in the chunk is null — prunable under any ts bound
      if (g.getFieldRepetitionCount("tsMin") == 0) return Iterator.empty
      if (!bounds.chunkTsOverlaps(g.getLong("tsMin", 0), g.getLong("tsMax", 0)))
        return Iterator.empty
    }
    var urlView: ColumnCodec.BytesView = null
    def bytesView(name: String): ColumnCodec.BytesView = {
      // url may already have been decoded for the keep set below —
      // never decode one block twice
      if (name == "url" && urlView != null) return urlView
      val v = ColumnCodec.decodeBytesView(blockOf(g, pid, blockIdx, name))
      if (name == "url") urlView = v
      if (name == "text")
        graft.jobs.DecodeJob.requireTextCrc(v, g.getLong("textCrc32", 0), pid, blockIdx)
      v
    }
    // warc_ts decodes ONCE whether it serves the projection, the exact
    // ts-range filter, or both
    var tsData: (Array[Long], Array[Boolean]) = null
    def tsDecoded(): (Array[Long], Array[Boolean]) = {
      if (tsData == null)
        tsData = ColumnCodec.decodeLongs(blockOf(g, pid, blockIdx, "warc_ts"))
      tsData
    }
    // FILTER FIRST, decode after: the keep set needs only the url and/or
    // warc_ts blocks — resolving it before the projection decodes means
    // a chunk whose metadata range spans the probe but which holds no
    // matching row (common: a point lookup against pid-hash-mixed files)
    // costs a url-block decode, not a 16 MB text decode + CRC pass.
    val matches: Array[Int] =
      if (!hasUrlBounds && !hasTsBounds) null // all rows
      else {
        // shared UTF-8 byte-order range semantics — one definition with
        // DecodeJob.runProjected (see DecodeJob.urlRangeKeep)
        val urlKeep: Int => Boolean =
          if (!hasUrlBounds) null
          else graft.jobs.DecodeJob.urlRangeKeep(bytesView("url"),
            bounds.urlLo, bounds.urlHi, bounds.urlLoStrict, bounds.urlHiStrict)
        // exact ts filter on the DECODED micros: null ts never matches a
        // range bound (SQL comparison semantics)
        // exact ts filter on the DECODED micros — shared semantics with
        // the engine decode (see DecodeJob.tsRangeKeep)
        val tsKeep: Int => Boolean =
          if (!hasTsBounds) null
          else {
            val (micros, nulls) = tsDecoded()
            graft.jobs.DecodeJob.tsRangeKeep(micros, nulls, bounds.tsLo, bounds.tsHi)
          }
        val b = Array.newBuilder[Int]
        var j = 0
        while (j < n) {
          if ((urlKeep == null || urlKeep(j)) && (tsKeep == null || tsKeep(j))) b += j
          j += 1
        }
        val m = b.result()
        if (m.isEmpty) return Iterator.empty // no projection decode at all
        m
      }
    val getters: Array[Int => Any] = columns.map {
      case c @ ("url" | "text" | "lang") =>
        val v = bytesView(c)
        (j: Int) =>
          if (v.isNull(j)) null
          else UTF8String.fromBytes(v.payload, v.start(j), v.len(j))
      case "html" =>
        val v = bytesView("html")
        (j: Int) => if (v.isNull(j)) null else v.copyAt(j)
      case "warc_ts" =>
        val (micros, nulls) = tsDecoded()
        (j: Int) =>
          if (nulls != null && nulls(j)) null
          else java.lang.Long.valueOf(micros(j)) // InternalRow micros
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    val idx: Iterator[Int] =
      if (matches == null) Iterator.range(0, n) else matches.iterator
    idx.map { j =>
      val vals = new Array[Any](getters.length)
      var c = 0
      while (c < getters.length) { vals(c) = getters(c)(j); c += 1 }
      new GenericInternalRow(vals)
    }
  }
}
