package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.jobs.{DecodeJob, EncodeJob, VerifyJob}

/** JSONL interchange: pages exported to JSON lines (html base64) must
  * read back byte-identically — including null warc_ts and binary html —
  * and feed the encode pipeline unchanged. */
class JsonlPagesSpec extends AnyFunSuite with SparkFixture {

  test("jsonl round-trip is byte-identical and feeds the encoder") {
    import spark.implicits._
    val dir = tmpDir("graft-jsonl")
    val source = WebtextGen.pages(spark, 400L, seed = 21L)
      .map(p => if (p.url.hashCode % 5 == 0) p.copy(warc_ts = null) else p)
      .cache()

    JsonlPages.write(source, s"$dir/drop.jsonl")
    val back = JsonlPages.read(spark, s"$dir/drop.jsonl").cache()
    assert(back.count() == 400L)

    // byte-identity source vs re-read (the verify join checks all columns)
    assert(VerifyJob.run(spark, source, back).ok)

    // and the re-read table runs through the ordinary encode pipeline
    val outDir = s"$dir/enc"
    EncodeJob.run(spark, back, outDir, EncodeJob.Config(numPartitions = 4))
    assert(VerifyJob.run(spark, source, DecodeJob.run(spark, outDir)).ok)
    source.unpersist(); back.unpersist()
  }

  test("external timestamp precisions ingest; unparseable ones fail loudly") {
    // genuinely external drops carry whole-second or millisecond
    // timestamps — a fixed microsecond pattern used to FAILFAST on them
    val dir = tmpDir("graft-jsonl-ts")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/ext.jsonl"),
      Seq(
        """{"url":"https://x/s","warc_ts":"2024-01-01T00:00:07Z","html_b64":"aGk=","text":"t","lang":"en"}""",
        """{"url":"https://x/m","warc_ts":"2024-01-01T00:00:07.123Z","html_b64":"aGk=","text":"t","lang":"en"}""",
        """{"url":"https://x/u","warc_ts":"2024-01-01T00:00:07.123456Z","html_b64":"aGk=","text":"t","lang":"en"}""",
        """{"url":"https://x/o","warc_ts":"2024-01-01T01:00:07+01:00","html_b64":"aGk=","text":"t","lang":"en"}""",
        """{"url":"https://x/o2","warc_ts":"2024-01-01T01:00:07+0100","html_b64":"aGk=","text":"t","lang":"en"}""",
        """{"url":"https://x/o3","warc_ts":"2024-01-01T01:00:07+01","html_b64":"aGk=","text":"t","lang":"en"}""",
        """{"url":"https://x/n","warc_ts":null,"html_b64":"aGk=","text":"t","lang":"en"}"""
      ).mkString("\n") + "\n")
    val rows = JsonlPages.read(spark, dir).collect().map(p => p.url -> p.warc_ts).toMap
    assert(rows("https://x/s").getTime == 1704067207000L)
    assert(rows("https://x/m").getTime == 1704067207123L)
    assert(rows("https://x/u").getNanos == 123456000)
    // every explicit-offset spelling normalizes to the Z-form instant
    assert(rows("https://x/o").getTime == 1704067207000L)
    assert(rows("https://x/o2").getTime == 1704067207000L)
    assert(rows("https://x/o3").getTime == 1704067207000L)
    assert(rows("https://x/n") == null)
    // unparseable, date-only, and zone-LESS values all fail loudly: the
    // lax default parser would accept the last two as plausible-but-
    // wrong instants (midnight / session-zone interpretation)
    // the \n case pins the \A..\z anchoring: Java's $ matches before a
    // trailing line terminator, so ^..$ would let it slip the gate
    Seq("not-a-time", "2024-01-01", "2024-01-01T00:00:07",
        "2024-01-01T00:00:07Z\\n").foreach { v =>
      val bad = tmpDir("graft-jsonl-badts")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(bad))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$bad/bad.jsonl"),
        s"""{"url":"https://x/b","warc_ts":"$v","html_b64":"aGk=","text":"t","lang":"en"}""" + "\n")
      val ex = intercept[Exception] { JsonlPages.read(spark, bad).collect() }
      assert(ex.getMessage.contains("unparseable warc_ts"),
        s"value '$v': unexpected failure: ${String.valueOf(ex.getMessage).take(200)}")
    }
  }

  test("malformed base64 in a crawl line fails loudly, not as silent corruption") {
    // unbase64's MIME decoder would skip the invalid characters and
    // produce wrong-but-plausible html bytes that no round-trip verify
    // could ever catch (source and decoded both corrupt); the strict
    // to_binary decode must throw instead
    val dir = tmpDir("graft-jsonl-bad")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.jsonl"),
      """{"url":"https://x/a","warc_ts":"2024-01-01T00:00:00.000000Z","html_b64":"!!not-base64!!","text":"t","lang":"en"}""" + "\n")
    val ex = intercept[Exception] {
      JsonlPages.read(spark, dir).collect()
    }
    assert(ex.getMessage.contains("BASE64") || ex.getMessage.contains("malformed"),
      s"unexpected failure: ${ex.getMessage.take(200)}")
  }

  test("verify of two empty tables reports zeros, not a crash") {
    import spark.implicits._
    val empty = spark.emptyDataset[graft.model.Page]
    val r = VerifyJob.run(spark, empty, empty)
    assert(r.ok && r.sourceRows == 0L && r.decodedRows == 0L)
  }
}
