package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.jobs.EncodeJob
import graft.sources.WebtextGen

/** The SQL-registered codec surface (Table B UDF/UDAF row): byte-level
  * round-trips via SQL only, and the real user story — decoding a column
  * of the on-disk chunk table from SQL without dropping into Scala. */
class GraftFunctionsSpec extends AnyFunSuite with SparkFixture {

  test("fl_/rle_ SQL functions round-trip arbitrary bytes, nulls pass through") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(64)(i =>
      (i.toLong, if (i % 17 == 0) null else {
        val b = new Array[Byte](rnd.nextInt(600)); rnd.nextBytes(b)
        // bias toward low-entropy bytes so both FL and RLE paths matter
        if (i % 2 == 0) b.indices.foreach(j => b(j) = (b(j) & 0x0f).toByte)
        b
      }))
    rows.toDF("id", "payload").createOrReplaceTempView("blobs")
    val bad = spark.sql(
      """SELECT id FROM blobs
        |WHERE (payload IS NULL) != (fl_decode(fl_encode(payload)) IS NULL)
        |   OR (payload IS NULL) != (rle_decode(rle_encode(payload)) IS NULL)
        |   OR (payload IS NOT NULL AND (fl_decode(fl_encode(payload)) != payload
        |                             OR rle_decode(rle_encode(payload)) != payload))""".stripMargin)
    assert(bad.count() == 0L)
    // fl_size matches the exact reference size model on the same bytes
    val sizes = spark.sql(
      "SELECT payload, fl_size(payload) AS s FROM blobs WHERE payload IS NOT NULL").collect()
    sizes.foreach { r =>
      assert(r.getLong(1) == graft.codec.ReferenceFl.fileSizeOf(r.getAs[Array[Byte]](0)))
    }
  }

  test("chunk-table column decodes from pure SQL via col_decode_bytes") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val dir = tmpDir("graft-sqludf")
    val pages = WebtextGen.pages(spark, 400L, partitions = 4)
    EncodeJob.run(spark, pages, dir, EncodeJob.Config(numPartitions = 4))
    spark.read.parquet(EncodeJob.chunksDir(dir)).createOrReplaceTempView("chunks")
    // decode the url column of every chunk entirely in SQL
    val decodedUrls = spark.sql(
      """SELECT CAST(u AS STRING) AS url
        |FROM (SELECT explode(col_decode_bytes(url.block)) AS u FROM chunks)""".stripMargin)
      .as[String].collect().sorted
    val sourceUrls = pages.select($"url").as[String].collect().sorted
    assert(decodedUrls.toSeq == sourceUrls.toSeq)
  }
}
