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
    // a LITERAL NULL (void type — no implicit cast reaches the check)
    // must return NULL like a builtin, not fail analysis
    val lit = spark.sql(
      "SELECT fl_encode(NULL) AS a, rle_decode(NULL) AS b, fl_size(NULL) AS c").head()
    assert(lit.isNullAt(0) && lit.isNullAt(1) && lit.isNullAt(2))
    // non-binary, non-null types still fail analysis with the cast hint
    val ex = intercept[Exception] { spark.sql("SELECT fl_encode('abc')").collect() }
    assert(ex.getMessage.contains("BINARY"), s"unexpected: ${ex.getMessage.take(200)}")
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

  test("codec functions are native codegen'd expressions, not UDF closures") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // forbid the interpreted fallback: if the generated static-kernel call
    // did not compile, this query would FAIL instead of silently running
    // the slow path
    val old = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = spark.sql("""
        SELECT sum(CASE WHEN fl_decode(fl_encode(b)) = b THEN 1 ELSE 0 END) AS fl_ok,
               sum(CASE WHEN rle_decode(rle_encode(b)) = b THEN 1 ELSE 0 END) AS rle_ok,
               sum(fl_size(b)) AS sz, count(*) AS n
        FROM (SELECT CAST(concat('p-', id, repeat('x', CAST(id % 37 AS INT))) AS BINARY) AS b
              FROM range(2000))""").as[(Long, Long, Long, Long)].head()
      assert(r._1 == 2000L && r._2 == 2000L && r._3 > 0L && r._4 == 2000L)
      // and the projection sits INSIDE a WholeStageCodegen span
      val plan = spark.sql("SELECT fl_encode(CAST('a' AS BINARY))")
        .queryExecution.executedPlan.toString
      assert(plan.contains("*(1)"), s"fl_encode fell out of whole-stage codegen:\n$plan")
      // wrong input type is a clear analysis error, not a runtime cast
      val ex = intercept[Exception](spark.sql("SELECT fl_encode(1)").collect())
      assert(ex.getMessage.toLowerCase.contains("binary"))
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("round-trip elimination rewrites decode(encode(x)) to x — and only as opt-in") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // parquet-backed, NOT a LocalRelation: ConvertToLocalRelation would
    // otherwise evaluate the (deterministic) expressions at optimize
    // time and the plan-shape assertions below would see neither form
    val dir = tmpDir("graft-rt-blobs")
    Seq((1L, "payload".getBytes("UTF-8"))).toDF("id", "b")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("rt_blobs")
    def optimizedOf(sql: String) =
      spark.sql(sql).queryExecution.optimizedPlan
    def hasCodecExpr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
      var found = false
      p.transformAllExpressions {
        case e @ (_: FlEncode | _: FlDecode | _: RleEncode | _: RleDecode) =>
          found = true; e
      }
      found
    }
    val rtSql =
      "SELECT fl_decode(fl_encode(b)) AS fb, rle_decode(rle_encode(b)) AS rb FROM rt_blobs"
    // register() alone must NOT elide the pair: q_sql_codec's round-trip
    // proof depends on the kernels actually running
    assert(hasCodecExpr(optimizedOf(rtSql)),
      "register() elided the round-trip — q_sql_codec's proof would be vacuous")
    try {
      // the rule present but conf off (the extensions-route default)
      // must also not elide — otherwise any extensions-built session
      // silently breaks the q_sql_codec proof
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CodecRoundTripElimination
      assert(hasCodecExpr(optimizedOf(rtSql)),
        "rule elided the round-trip with its gating conf OFF")
      // opt-in: pairs vanish from the optimized plan, results unchanged;
      // a bare encode (no pair) must survive
      GraftFunctions.registerOptimizations(spark)
      GraftFunctions.registerOptimizations(spark) // idempotent
      assert(spark.experimental.extraOptimizations
        .count(_ == CodecRoundTripElimination) == 1)
      assert(!hasCodecExpr(optimizedOf(rtSql)), "round-trip pair survived the rule")
      assert(hasCodecExpr(optimizedOf("SELECT fl_encode(b) AS e FROM rt_blobs")),
        "rule removed a bare encode")
      val r = spark.sql(rtSql).collect().head
      assert(r.getAs[Array[Byte]]("fb").toSeq == "payload".getBytes("UTF-8").toSeq)
      assert(r.getAs[Array[Byte]]("rb").toSeq == "payload".getBytes("UTF-8").toSeq)
    } finally {
      // the fixture session is shared — leave no rule or conf residue
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == CodecRoundTripElimination)
      spark.conf.unset(CodecRoundTripElimination.ConfKey)
    }
  }

  test("every SQL name has a builder producing its expression (extensions route)") {
    val byName = GraftFunctions.builders.toMap
    assert(byName.keySet == GraftFunctions.Names.toSet)
    val e = byName("fl_encode")(Seq(org.apache.spark.sql.catalyst.expressions.Literal(
      Array[Byte](1, 2, 3))))
    assert(e.isInstanceOf[FlEncode] && e.prettyName == "fl_encode")
    // wrong arity is an ANALYSIS error (frontends catch AnalysisException;
    // a raw IllegalArgumentException escaping analysis breaks that contract)
    val bad = intercept[org.apache.spark.sql.AnalysisException](
      byName("fl_encode")(Seq.empty))
    assert(bad.getMessage.contains("exactly 1"))
  }
}
