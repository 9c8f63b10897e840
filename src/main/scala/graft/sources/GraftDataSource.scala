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
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThanOrEqual, InsertableRelation, LessThanOrEqual}
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
  *    `>=`/`<=`/`=` on `url` are consumed by the scan — chunks whose
  *    (urlMin, urlMax) fall outside the bounds are skipped before any
  *    block is decoded (the chunk-level analog of partition pruning),
  *    then rows are filtered exactly on the decoded url bytes. The
  *    comparison is UTF-8 byte order on both levels — the SAME order
  *    Spark's own string comparison (UTF8String) uses, so consuming the
  *    filter is semantics-preserving. All other predicates are returned
  *    as residuals for Spark to evaluate.
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
  /** The decoded Page schema, exactly the input_hint shape. Declared
    * fully nullable on the READ side (the codec blocks carry null
    * bitmaps, so a tolerant reader costs nothing). The WRITE contract
    * is stricter and enforced by the writer: only `warc_ts` may be
    * null — the encode kernel requires url/text/lang/html (a null
    * there would otherwise surface as an opaque executor NPE deep in
    * EncodeJob). */
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
  *  - `overwrite` — truncate and re-encode from scratch.
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
  * The writer also enforces the Page contract up front: url / text /
  * lang / html must be non-null (a codegen'd per-row guard raises a
  * named error instead of the executor NPE EncodeJob would throw);
  * only warc_ts is nullable.
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
    if (doOverwrite) TableIO.deleteRecursive(spark, path)
    else if (TableIO.exists(spark, s"$path/manifest") &&
        !Option(options.get("resume")).exists(_.toBoolean))
      throw new IllegalArgumentException(
        s"graft write: table at $path already has committed partitions, and the " +
          "engine's append is a crash-RESUME (manifest-committed pids are skipped, " +
          "so appending genuinely new rows would silently drop them). Re-issue the " +
          "interrupted write of the SAME data with .option(\"resume\", \"true\"), " +
          "use mode(\"overwrite\") to replace the table, or use " +
          "graft.streaming.StreamingEncode for incremental ingest of new data.")
    // fail per-row with a NAMED error on the non-null contract — the
    // alternative is an opaque NullPointerException inside the encode
    // kernel's executor task
    def required(c: String) =
      F.when(F.col(c).isNull, F.raise_error(F.lit(
        s"graft write: column '$c' must be non-null (only warc_ts is nullable)")))
        .otherwise(F.col(c)).as(c)
    val pages = data.select(required("url"), F.col("warc_ts"), required("html"),
        required("text"), required("lang"))
      .as[graft.model.Page](org.apache.spark.sql.Encoders.product[graft.model.Page])
    val parts = Option(options.get("partitions")).map(_.toInt).getOrElse {
      val est = data.queryExecution.optimizedPlan.stats.sizeInBytes
      val raw = if (est < BigInt(1L << 40)) est.toLong * 3 else 0L
      graft.jobs.EncodeJob.suggestPartitions(raw, spark.sparkContext.defaultParallelism)
    }
    graft.jobs.EncodeJob.run(spark, pages, path,
      graft.jobs.EncodeJob.Config(numPartitions = parts,
        codecMode = Option(options.get("codecMode")).getOrElse("auto")))
  }
}

/** Accumulates the two pushdowns. Multiple bounds on `url` are ALL kept
  * (list, not max/min-folded): the reader applies every bound, so
  * consuming `url >= a AND url >= b` never widens the predicate. */
final class GraftScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = GraftDataSource.PageSchema
  private var los: List[String] = Nil
  private var his: List[String] = Nil
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands back a subset of PageSchema in its own order; honor it
    // verbatim (an empty projection — count(*) — is legal and yields
    // zero-width rows)
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def consume(f: Filter): Boolean = f match {
      case GreaterThanOrEqual("url", v: String) => los ::= v; true
      case LessThanOrEqual("url", v: String) => his ::= v; true
      case EqualTo("url", v: String) => los ::= v; his ::= v; true
      case _ => false
    }
    val (acc, residual) = filters.partition(consume)
    pushed = acc
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new GraftScan(path, required, los, his)
}

final case class GraftInputPartition(file: String, length: Long) extends InputPartition

final class GraftScan(path: String, required: StructType,
                      los: Seq[String], his: Seq[String])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String = {
    val bounds =
      (los.map(l => s"url >= '$l'") ++ his.map(h => s"url <= '$h'")).mkString(", ")
    s"GraftScan path=$path ReadColumns=[${required.fieldNames.mkString(",")}] " +
      s"PushedUrlBounds=[$bounds]"
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
    partitions.toArray[InputPartition]

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
    val loB = los.map(_.getBytes(UTF_8)).toArray
    val hiB = his.map(_.getBytes(UTF_8)).toArray
    new GraftReaderFactory(conf, required.fieldNames, loB, hiB)
  }
}

final class GraftReaderFactory(conf: graft.jobs.FlFileJob.SerializableConf,
                               columns: Array[String],
                               loB: Array[Array[Byte]],
                               hiB: Array[Array[Byte]])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(p.asInstanceOf[GraftInputPartition].file,
      conf.value, columns, loB, hiB)
}

/** Reads ONE chunk parquet file with a pruned parquet schema (only the
  * requested columns' block leaves + the metadata primitives), decodes
  * each chunk row's blocks with [[ColumnCodec]], and emits InternalRows
  * straight off the decoded views. */
final class GraftPartitionReader(file: String, conf: Configuration,
                                 columns: Array[String],
                                 loB: Array[Array[Byte]],
                                 hiB: Array[Array[Byte]])
    extends PartitionReader[InternalRow] {

  private val hasBounds = loB.nonEmpty || hiB.nonEmpty
  private val needText = columns.contains("text")
  // the url block must be decoded for exact row filtering even when the
  // projection dropped it
  private val blockCols: Array[String] =
    if (hasBounds && !columns.contains("url")) columns :+ "url" else columns

  // row-group STATISTICS filter on the chunk metadata columns: a row
  // group whose (urlMin, urlMax) stats cannot intersect the pushed
  // bounds is skipped before any of its column chunks are READ. A
  // group's stats span the UNION of the chunk rows it holds (pid-hash
  // file assignment mixes url ranges within a file), so this prunes at
  // row-group granularity; the per-chunk-row prune in decodeChunkRow
  // then skips the decode of individual non-matching chunks the
  // surviving group still carries.
  private val rowGroupFilter: Option[org.apache.parquet.filter2.compat.FilterCompat.Filter] =
    if (loB.isEmpty && hiB.isEmpty) None
    else {
      import org.apache.parquet.filter2.predicate.FilterApi
      import org.apache.parquet.io.api.Binary
      val preds: Seq[org.apache.parquet.filter2.predicate.FilterPredicate] =
        loB.toSeq.map(lo => FilterApi.gtEq(FilterApi.binaryColumn("urlMax"),
          Binary.fromConstantByteArray(lo))) ++
          hiB.toSeq.map(hi => FilterApi.ltEq(FilterApi.binaryColumn("urlMin"),
            Binary.fromConstantByteArray(hi)))
      Some(org.apache.parquet.filter2.compat.FilterCompat.get(
        preds.reduce(FilterApi.and(_, _))))
    }

  private val reader = {
    val b = org.apache.parquet.HadoopReadOptions.builder(conf, new HPath(file))
    rowGroupFilter.foreach(b.withRecordFilter)
    ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(file), conf), b.build())
  }

  // anything that throws between open() and a successfully constructed
  // reader (schema lookup on a pre-columnar-layout file, say) must not
  // leak the parquet input stream: Spark only close()es readers that
  // createReader returned
  private val (reqSchema: MessageType, columnIO: org.apache.parquet.io.MessageColumnIO) =
    try {
      val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema
      /* Pruned parquet projection: metadata primitives + ONLY the needed
       * columns' `block` leaves — select(url) never reads text bytes. */
      // upcast to GroupType: MessageType inherits a varargs getType
      // overload that makes the String call ambiguous
      val fsGroup: GroupType = fileSchema
      val fields = scala.collection.mutable.ArrayBuffer.empty[PType]
      def add(n: String): Unit = fields += fsGroup.getType(n)
      add("pid"); add("blockIdx"); add("rows")
      if (needText) add("textCrc32")
      if (hasBounds) { add("urlMin"); add("urlMax") }
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
      (rq, new ColumnIOFactory().getColumnIO(rq, fileSchema))
    } catch {
      case e: Throwable =>
        try reader.close() catch { case s: Exception => e.addSuppressed(s) }
        throw e
    }

  private var rowsLeftInGroup: Long = 0L
  private var recordReader: org.apache.parquet.io.RecordReader[Group] = null
  private var rowIter: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = null

  override def next(): Boolean = {
    while (!rowIter.hasNext) {
      if (rowsLeftInGroup == 0L) {
        val pages = reader.readNextRowGroup()
        if (pages == null) return false
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
    if (hasBounds) {
      // chunk-level pruning on (urlMin, urlMax) BEFORE any block decode
      val mn = g.getBinary("urlMin", 0).getBytes
      val mx = g.getBinary("urlMax", 0).getBytes
      val overlaps =
        loB.forall(lo => java.util.Arrays.compareUnsigned(mx, lo) >= 0) &&
          hiB.forall(hi => java.util.Arrays.compareUnsigned(mn, hi) <= 0)
      if (!overlaps) return Iterator.empty
    }
    var urlView: ColumnCodec.BytesView = null
    def bytesView(name: String): ColumnCodec.BytesView = {
      val v = ColumnCodec.decodeBytesView(blockOf(g, pid, blockIdx, name))
      if (name == "url") urlView = v
      if (name == "text")
        graft.jobs.DecodeJob.requireTextCrc(v, g.getLong("textCrc32", 0), pid, blockIdx)
      v
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
        val (micros, nulls) = ColumnCodec.decodeLongs(blockOf(g, pid, blockIdx, "warc_ts"))
        (j: Int) =>
          if (nulls != null && nulls(j)) null
          else java.lang.Long.valueOf(micros(j)) // InternalRow micros
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    if (hasBounds && urlView == null) bytesView("url")
    // shared UTF-8 byte-order range semantics — one definition with
    // DecodeJob.runProjected (see DecodeJob.urlRangeKeep)
    val keep: Int => Boolean =
      if (!hasBounds) _ => true
      else graft.jobs.DecodeJob.urlRangeKeep(urlView, loB, hiB)
    Iterator.range(0, n).filter(keep).map { j =>
      val vals = new Array[Any](getters.length)
      var c = 0
      while (c < getters.length) { vals(c) = getters(c)(j); c += 1 }
      new GenericInternalRow(vals)
    }
  }
}
