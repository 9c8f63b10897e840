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
