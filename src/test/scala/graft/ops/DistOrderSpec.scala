package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** DistOrder must reproduce the single-partition window semantics exactly
  * — including runs that chain across many range partitions — while never
  * using a global window. Reference results are computed with a plain
  * Scala fold over the totally-ordered data. */
class DistOrderSpec extends AnyFunSuite with SparkFixture {

  private def referenceRuns(values: Seq[String]): Seq[(Long, String, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    values.foreach { v =>
      if (out.nonEmpty && out.last._2 == v) {
        val (id, vv, len) = out.remove(out.length - 1)
        out += ((id, vv, len + 1))
      } else out += ((out.length + 1L, v, 1L))
    }
    out.toSeq
  }

  test("runs == fold oracle, including runs chaining across partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // long runs (often >> rows/partition at 16 partitions) force chaining
    val values = Iterator.unfold(0) { i =>
      if (i >= 20000) None
      else {
        val runLen = 1 + rnd.nextInt(4000)
        Some((Seq.fill(math.min(runLen, 20000 - i))("v" + rnd.nextInt(4)), i + runLen))
      }
    }.flatten.toSeq
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
    val got = DistOrder.runs(df, Seq("k"), "v", numParts = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == referenceRuns(values))
  }

  test("runs handles a single giant run and tiny inputs") {
    import spark.implicits._
    val one = DistOrder.runs(Seq((1L, "x")).toDF("k", "v"), Seq("k"), "v", 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(one.toSeq == Seq((1L, "x", 1L)))
    val giant = DistOrder.runs(
      (0L until 5000L).map((_, "same")).toDF("k", "v"), Seq("k"), "v", 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(giant.toSeq == Seq((1L, "same", 5000L)))
  }

  test("runs: consecutive NULLs form ONE run (null-safe window oracle)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // null-heavy stream with long null runs that chain across partitions,
    // plus a LEADING null run (the window oracle's rn=1 edge)
    val values: Seq[String] = Seq.fill(40)(null: String) ++
      Iterator.unfold(0) { i =>
        if (i >= 12000) None
        else {
          val runLen = 1 + rnd.nextInt(2500)
          val v = if (rnd.nextInt(3) == 0) null else "v" + rnd.nextInt(3)
          Some((Seq.fill(math.min(runLen, 12000 - i))(v), i + runLen))
        }
      }.flatten.toSeq
    val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
    val got = DistOrder.runs(df, Seq("k"), "v", numParts = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // the scaladoc's contract: fold oracle (Scala == is null-safe) ...
    assert(got == referenceRuns(values))
    // ... AND the documented null-SAFE single-partition window oracle
    // (`lag(v) IS DISTINCT FROM v`; the three-valued `<>` form would
    // merge a null row into the preceding run and split null runs)
    df.createOrReplaceTempView("null_runs_in")
    val oracle = spark.sql(
      """WITH s AS (SELECT v, row_number() OVER (ORDER BY k) AS rn FROM null_runs_in),
        |b AS (SELECT v, rn,
        |             CASE WHEN rn = 1
        |                    OR (lag(v) OVER (ORDER BY rn) IS DISTINCT FROM v)
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM s),
        |r AS (SELECT v, sum(brk) OVER (ORDER BY rn
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |      FROM b)
        |SELECT run_id, min(v) AS val, count(*) AS run_len
        |FROM r GROUP BY run_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == oracle)
  }

  test("ntileRanges matches exact ntile fill semantics") {
    import spark.implicits._
    // 1003 rows, 16 tiles: first 1003 % 16 = 11 buckets get 63, rest 62
    val keys = new scala.util.Random(31L).shuffle((0L until 1003L).toVector)
    val got = DistOrder.ntileRanges(keys.map(Tuple1(_)).toDF("doc_id"), "doc_id", 16, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.length == 16)
    val sizes = got.map(_._2)
    assert(sizes.take(11).forall(_ == 63L) && sizes.drop(11).forall(_ == 62L))
    // buckets tile the key space contiguously
    assert(got.head._3 == 0L && got.last._4 == 1002L)
    got.sliding(2).foreach { case Array((_, _, _, hi), (_, _, lo, _)) =>
      assert(lo == hi + 1)
    }
    assert(got.forall { case (_, cnt, lo, hi) => hi - lo + 1 == cnt })
  }
}
