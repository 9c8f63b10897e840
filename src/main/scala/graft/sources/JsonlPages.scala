package graft.sources

import org.apache.spark.sql.{Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines interchange for Page tables — the shape crawl drops arrive
  * in before they are parquet (one JSON object per line, binary `html`
  * carried base64). The reference ingests raw byte files
  * (/root/reference/src/file_io.cu:73-115); a schema'd text format is its
  * table-world analog. The schema is EXPLICIT on read: inference would
  * type html as plain string and silently mis-shape the table.
  *
  * Spark's JSON source splits by line, so a multi-GB .jsonl (or .jsonl.gz
  * per file) parallelizes across tasks like any other scan; this is a
  * format adapter, not a new execution path — everything downstream is
  * the ordinary encode pipeline.
  */
object JsonlPages {

  private val WireSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html_b64", StringType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Explicit microsecond timestamp format on the WRITE side only: the
    * JSON sink's default pattern carries milliseconds, silently
    * truncating warc_ts and breaking byte-identity on round-trip. The
    * READ side deliberately does NOT pin this format — external feeds
    * legitimately carry whole-second/millisecond instants, which the
    * shape gate + try_to_timestamp below accept (re-pinning the format
    * there would re-break them, the regression JsonlPagesSpec's second
    * test guards). */
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def write(ds: Dataset[graft.model.Page], path: String): Unit =
    ds.select(col("url"), col("warc_ts"),
        base64(col("html")).as("html_b64"), col("text"), col("lang"))
      .write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TsFormat)
      .json(path)

  /** Read-side wire schema carries warc_ts as STRING: a fixed
    * timestampFormat with a mandatory fraction would reject the common
    * external forms ("...T12:00:00Z", millisecond precision) under
    * FAILFAST. The shape gate + parser below accept 0-6 fraction digits
    * with an EXPLICIT offset or Z and keep microsecond precision; any
    * other non-null value fails loudly via raise_error. */
  private val ReadSchema = StructType(WireSchema.map {
    case f if f.name == "warc_ts" => f.copy(dataType = StringType)
    case f                        => f
  })

  /** Accepted warc_ts shapes: full ISO instant, 'T' separator, 0-6
    * fraction digits, and an EXPLICIT zone — Z or a numeric offset in
    * any of its unambiguous spellings (+HH:MM, +HHMM, +HH), all of
    * which try_to_timestamp resolves identically. try_to_timestamp with
    * no format is far laxer (date-only '2024-01-01' parses; a zone-less
    * timestamp parses IN THE SESSION TIME ZONE) — without this gate a
    * malformed external feed would ingest silently as a
    * plausible-but-wrong instant instead of failing FAILFAST-style.
    * Named zones ("... UTC") are deliberately outside the gate: they
    * are not ISO-8601 instants and feeds carrying them should be
    * normalized upstream, loudly. \A...\z anchors, not ^...$: Java's $
    * also matches BEFORE a trailing line terminator, so a value ending
    * in '\n' would slip through the gate it promises to close. */
  private val TsShape = "\\A\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d{1,6})?(Z|[+-]\\d{2}(:?\\d{2})?)\\z"

  def read(spark: SparkSession, path: String): Dataset[graft.model.Page] =
    spark.read.schema(ReadSchema)
      .option("mode", "FAILFAST") // a malformed crawl line fails loudly
      .json(path)
      .select(col("url"),
        // try_to_timestamp (not to_timestamp): under ANSI mode the
        // latter throws its own cast error before the CASE can attach
        // the diagnostic; try_ returns null in every mode, so the
        // raise_error branch carries one consistent message. rlike via
        // the Column API (not an expr-embedded literal): the pattern's
        // backslashes would need SQL-string re-escaping there.
        when(col("warc_ts").isNotNull &&
            !(col("warc_ts").rlike(TsShape) &&
              expr("try_to_timestamp(warc_ts)").isNotNull),
            expr("CAST(raise_error(concat('unparseable warc_ts: ', warc_ts)) AS TIMESTAMP)"))
          .otherwise(expr("try_to_timestamp(warc_ts)")).as("warc_ts"),
        // STRICT base64: unbase64's MIME decoder silently skips invalid
        // characters, turning a corrupt html_b64 into wrong-but-plausible
        // bytes that round-trip verify could never catch (source and
        // decoded would both carry the corruption). to_binary fails
        // loudly instead — keeping this file's malformed-line contract.
        expr("to_binary(html_b64, 'base64')").as("html"),
        col("text"), col("lang"))
      .as[graft.model.Page](Encoders.product[graft.model.Page])
}
