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
}
