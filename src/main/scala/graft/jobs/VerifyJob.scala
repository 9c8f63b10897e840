package graft.jobs

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Page

/** Round-trip verification: equi-join decoded to source on `url` and
  * compare every column byte-for-byte (north_rule: byte-identical `text`
  * per `url`). One shuffle join; at real scale AQE handles skew and the
  * join key is the table's natural clustering key. */
object VerifyJob {

  final case class Report(
      sourceRows: Long,
      decodedRows: Long,
      joinedRows: Long,
      textMismatches: Long,
      htmlMismatches: Long,
      tsMismatches: Long,
      langMismatches: Long) {
    def ok: Boolean =
      sourceRows == decodedRows && joinedRows == sourceRows &&
        textMismatches + htmlMismatches + tsMismatches + langMismatches == 0
  }

  def run(spark: SparkSession, source: Dataset[Page], decoded: Dataset[Page]): Report = {
    import spark.implicits._
    val s = source.toDF("url", "s_ts", "s_html", "s_text", "s_lang")
    val d = decoded.toDF("url", "d_ts", "d_html", "d_text", "d_lang")
    val joined = s.join(d, Seq("url"), "full_outer")
      .agg(
        count(when($"s_text".isNotNull || $"s_lang".isNotNull, 1)).as("src"),
        count(when($"d_text".isNotNull || $"d_lang".isNotNull, 1)).as("dec"),
        count(when($"s_lang".isNotNull && $"d_lang".isNotNull, 1)).as("joined"),
        count(when(!($"s_text" <=> $"d_text"), 1)).as("textMm"),
        count(when(!($"s_html" <=> $"d_html"), 1)).as("htmlMm"),
        count(when(!($"s_ts" <=> $"d_ts"), 1)).as("tsMm"),
        count(when(!($"s_lang" <=> $"d_lang"), 1)).as("langMm"))
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .head()
    Report(joined._1, joined._2, joined._3, joined._4, joined._5, joined._6, joined._7)
  }
}
