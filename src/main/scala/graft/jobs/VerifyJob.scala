package graft.jobs

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Page

/** Round-trip verification: per-url aggregate digests of source and
  * decoded, full-outer-joined on `url` and compared column by column
  * (north_rule: byte-identical `text` per `url`).
  *
  * Comparison is MULTISET-based per url: each side aggregates a row
  * count and an order-insensitive content digest (sum of per-row
  * xxhash64) per column. That keeps verify correct where a naive row
  * equi-join breaks: duplicate urls (a re-crawl — the encoder handles
  * them with a content tiebreaker; a row join would explode 2x2 cross
  * pairs and report false mismatches) and rows whose individual columns
  * are null (xxhash64 folds null deterministically, so presence comes
  * from the row count, not from any column's non-nullness). One shuffle
  * per side plus the join; at real scale AQE handles skew and the join
  * key is the table's natural clustering key. */
object VerifyJob {

  final case class Report(
      sourceRows: Long,
      decodedRows: Long,
      joinedRows: Long, // urls present on BOTH sides
      textMismatches: Long, // urls (present on BOTH sides) whose text multiset differs — etc.
      htmlMismatches: Long,
      tsMismatches: Long,
      langMismatches: Long,
      /** urls whose whole-ROW-tuple multiset differs: per-column
        * multisets alone are blind to cross-row column RE-PAIRING among
        * duplicate-url rows — a decoder bug swapping which text goes
        * with which html between two same-url rows leaves every
        * per-column digest unchanged. The tuple digest pins the
        * pairing. */
      rowMismatches: Long = 0L,
      /** urls missing from one side, or present with differing row
        * counts. Counted HERE and only here — the per-column counters
        * above require both sides present, so a wholly-missing url
        * reads as ONE count mismatch, not five misattributed column
        * mismatches. Global sourceRows == decodedRows cannot replace
        * this: one url gaining a row while another loses one keeps the
        * totals equal. */
      countMismatches: Long = 0L) {
    def ok: Boolean =
      sourceRows == decodedRows && joinedRows > 0 == (sourceRows > 0) &&
        textMismatches + htmlMismatches + tsMismatches + langMismatches +
          rowMismatches + countMismatches == 0
  }

  // hashes sum as decimal(38,0): a plain long sum overflows (and under
  // ANSI mode throws) once a url's hash sum crosses 2^63
  private def dig(c: String) = sum(xxhash64(col(c)).cast("decimal(38,0)"))

  private def digests(ds: Dataset[Page], tag: String) = {
    val df = ds.toDF()
    // the row digest is derived FROM THE SCHEMA (every non-key column, in
    // case-class order — identical on both sides by construction): a
    // future Page field cannot silently escape verification. It may lack
    // a NAMED per-column mismatch counter until one is added here, but
    // rowMismatches covers its content from day one.
    val payload = df.columns.filterNot(_ == "url").toSeq
    // whole-row-tuple digest: variadic xxhash64 SKIPS null children (the
    // seed passes through unchanged), so hash(x, null) == hash(null, x)
    // — a value migrating between columns across a null would go
    // undetected. Interleaving each column with its null flag restores
    // positional identity: (x, null) hashes (0, x, 1) while (null, x)
    // hashes (1, 0, x).
    val rowHash = xxhash64(
      payload.flatMap(c => Seq(isnull(col(c)).cast("int"), col(c))): _*)
    df.groupBy(col("url")).agg(
      count(lit(1)).as(s"${tag}_n"),
      dig("text").as(s"${tag}_text"),
      dig("html").as(s"${tag}_html"),
      dig("warc_ts").as(s"${tag}_ts"),
      dig("lang").as(s"${tag}_lang"),
      // catches cross-row column re-pairing among duplicate-url rows,
      // which every per-column multiset digest is blind to
      sum(rowHash.cast("decimal(38,0)")).as(s"${tag}_row"),
      // second moment under an independent re-hash: a sum digest alone
      // is cancellable (corruptions across duplicate-url rows whose
      // hash deltas cancel), and the nonlinear re-hash makes
      // SIMULTANEOUS cancellation in both sums ~2^-128 — the certifier
      // must be harder to fool than the bug class it certifies against
      sum(xxhash64(lit(0x6d32L), rowHash).cast("decimal(38,0)"))
        .as(s"${tag}_row2"))
  }

  def run(spark: SparkSession, source: Dataset[Page], decoded: Dataset[Page]): Report = {
    import spark.implicits._
    val s = digests(source, "s")
    val d = digests(decoded, "d")
    // NULL-SAFE join key: Seq("url") equi-join never matches null keys,
    // so two identical null-url rows would land as TWO half-null joined
    // rows and double-count as mismatches — a false verify failure on a
    // byte-identical round trip (groupBy keeps a null-key group; the
    // join must too)
    val both = $"s_n".isNotNull && $"d_n".isNotNull
    val joined = s.join(d, s("url") <=> d("url"), "full_outer")
      .agg(
        // coalesce the SUM result: a zero-row join (both tables empty —
        // a supported case) makes sum() itself null, which the
        // non-nullable tuple encoder would reject (sum already skips
        // null s_n/d_n rows, so no inner coalesce is needed)
        coalesce(sum($"s_n"), lit(0L)).as("src"),
        coalesce(sum($"d_n"), lit(0L)).as("dec"),
        count(when(both, 1)).as("joined"),
        // per-column counters fire only when BOTH sides carry the url —
        // a missing url or a count drift is a COUNT mismatch, reported
        // once in countMm, not misattributed to five columns
        count(when(both && !($"s_text" <=> $"d_text"), 1)).as("textMm"),
        count(when(both && !($"s_html" <=> $"d_html"), 1)).as("htmlMm"),
        count(when(both && !($"s_ts" <=> $"d_ts"), 1)).as("tsMm"),
        count(when(both && !($"s_lang" <=> $"d_lang"), 1)).as("langMm"),
        count(when(both &&
          (!($"s_row" <=> $"d_row") || !($"s_row2" <=> $"d_row2")), 1)).as("rowMm"),
        count(when(!($"s_n" <=> $"d_n"), 1)).as("countMm"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .head()
    Report(joined._1, joined._2, joined._3, joined._4, joined._5, joined._6,
      joined._7, joined._8, joined._9)
  }
}
