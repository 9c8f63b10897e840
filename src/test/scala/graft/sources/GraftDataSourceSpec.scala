package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FSDataInputStream, Path => HPath, PositionedReadable, RawLocalFileSystem, Seekable}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.jobs.{DecodeJob, EncodeJob}

/** Test-only local FS that counts every byte its streams hand out —
  * registered under `cntfile://` so a spec can measure the connector's
  * ACTUAL disk I/O (Hadoop's built-in Statistics miss positioned reads).
  * Deliberately NOT ByteBufferReadable: parquet then takes the heap-read
  * path, which all funnels through the overloads counted here. */
object CountingLocalFs {
  val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
}
class CountingLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "cntfile"
  override def getUri: URI = URI.create("cntfile:///")
  override def open(f: HPath, bufferSize: Int): FSDataInputStream =
    new FSDataInputStream(new CountingIn(super.open(f, bufferSize)))
}
final class CountingIn(in: FSDataInputStream) extends java.io.InputStream
    with Seekable with PositionedReadable {
  private def add(n: Int): Int = {
    if (n > 0) CountingLocalFs.bytesRead.addAndGet(n.toLong)
    n
  }
  override def read(): Int = {
    val r = in.read()
    if (r >= 0) CountingLocalFs.bytesRead.incrementAndGet()
    r
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = add(in.read(b, off, len))
  override def read(pos: Long, b: Array[Byte], off: Int, len: Int): Int =
    add(in.read(pos, b, off, len))
  override def readFully(pos: Long, b: Array[Byte], off: Int, len: Int): Unit = {
    in.readFully(pos, b, off, len)
    CountingLocalFs.bytesRead.addAndGet(len.toLong)
  }
  override def readFully(pos: Long, b: Array[Byte]): Unit = {
    in.readFully(pos, b)
    CountingLocalFs.bytesRead.addAndGet(b.length.toLong)
  }
  override def seek(pos: Long): Unit = in.seek(pos)
  override def getPos: Long = in.getPos
  override def seekToNewSource(targetPos: Long): Boolean = in.seekToNewSource(targetPos)
  override def available(): Int = in.available()
  override def close(): Unit = in.close()
}

/** The DataSource V2 read surface: `spark.read.format("graft")` must
  * equal the DecodeJob paths bit-for-bit, prune columns down to the
  * parquet block leaves, and consume url-range predicates exactly. */
class GraftDataSourceSpec extends AnyFunSuite with SparkFixture {

  private lazy val dir = {
    val d = tmpDir("graft-dsv2")
    EncodeJob.run(spark, WebtextGen.pages(spark, 800L, partitions = 4), d,
      EncodeJob.Config(numPartitions = 4))
    d
  }

  private def read(): DataFrame = spark.read.format("graft").load(dir)

  test("full read equals DecodeJob.run on every column") {
    val got = read()
    val want = DecodeJob.run(spark, dir).toDF()
    assert(got.count() == 800L)
    // exceptAll both directions: covers url/text/lang strings, html
    // binary, and warc_ts micros — any cell divergence survives one side
    assert(got.exceptAll(want).count() == 0L, "dsv2 read has extra rows")
    assert(want.exceptAll(got).count() == 0L, "dsv2 read lost rows")
  }

  test("column pruning reaches the scan and values match the projection") {
    import spark.implicits._
    val df = read().select($"url", $"lang")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadColumns=[url,lang]"),
      "projection not pushed to GraftScan:\n" + plan)
    val got = df.as[(String, String)].collect().sorted.toSeq
    val want = WebtextGen.pages(spark, 800L, partitions = 4)
      .select($"url", $"lang").as[(String, String)].collect().sorted.toSeq
    assert(got == want)
  }

  test("column pruning reduces actual disk I/O, not just record assembly") {
    import spark.implicits._
    // Hadoop's built-in 'file' Statistics miss parquet's positioned-read
    // paths, so count bytes OURSELVES: a RawLocalFileSystem subclass
    // registered under cntfile:// whose streams count every read — and
    // drive the whole production path (listStatus + readers) through it.
    // text+html dominate chunk bytes, so a url+lang projection that
    // truly prunes I/O (ParquetFileReader.setRequestedSchema) must read
    // far fewer bytes than the full scan; assembly-only pruning reads
    // everything.
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfile.impl", classOf[CountingLocalFs].getName)
    val cdir = s"cntfile://$dir"
    def measure(f: => Unit): Long = {
      val b0 = CountingLocalFs.bytesRead.get()
      f
      CountingLocalFs.bytesRead.get() - b0
    }
    val narrow = measure {
      spark.read.format("graft").load(cdir).select($"url", $"lang")
        .write.format("noop").mode("overwrite").save()
    }
    val full = measure {
      spark.read.format("graft").load(cdir)
        .write.format("noop").mode("overwrite").save()
    }
    info(s"graft DSv2 bytes read: url+lang $narrow vs full $full")
    assert(narrow > 0 && full > 0, s"counting fs saw nothing: $narrow / $full")
    assert(narrow * 2 < full,
      s"projected scan read $narrow bytes vs full $full — block leaves not pruned at I/O level")

    // selective range scan: the row-group STATISTICS filter on
    // (urlMin, urlMax) must skip non-matching row groups BEFORE the
    // I/O, not just before decode. A row group's stats span the UNION
    // of the chunk rows it holds (pid-hash file assignment mixes url
    // ranges), so probe with the GLOBAL MINIMUM url — every group not
    // containing it has min(urlMin) above it and must drop
    val one = spark.read.format("graft").load(dir)
      .agg(org.apache.spark.sql.functions.min("url")).collect().head.getString(0)
    val ranged = measure {
      spark.read.format("graft").load(cdir)
        .filter(org.apache.spark.sql.functions.col("url") === one)
        .write.format("noop").mode("overwrite").save()
    }
    info(s"graft DSv2 bytes read: url-equality ranged $ranged vs full $full")
    // granularity is the ROW GROUP (its stats span the chunks it
    // holds), so the saving is the dropped groups' bytes, not
    // everything-but-one-chunk; assert a pruned group's worth of I/O
    // disappeared rather than a per-chunk ideal
    assert(ranged < full * 9 / 10,
      s"ranged scan read $ranged bytes vs full $full — no row group pruned at I/O level")
  }

  test("url-range predicates are consumed: chunk+row pruning, exact rows") {
    import spark.implicits._
    val source = WebtextGen.pages(spark, 800L, partitions = 4)
    val urls = source.select($"url").as[String].collect().sorted
    val (lo, hi) = (urls(200), urls(600))
    val df = read().select($"url", $"text")
      .filter($"url" >= lo && $"url" <= hi)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(s"url >= '$lo'") && plan.contains(s"url <= '$hi'"),
      "url bounds not pushed into GraftScan:\n" + plan)
    val got = df.as[(String, String)].collect().sortBy(_._1).toSeq
    val want = source.filter($"url" >= lo && $"url" <= hi)
      .select($"url", $"text").as[(String, String)].collect().sortBy(_._1).toSeq
    assert(got == want, s"range read mismatch: got ${got.size}, want ${want.size}")
  }

  test("STRICT bounds (>/<) are consumed on url and warc_ts, exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val source = WebtextGen.pages(spark, 800L, partitions = 4)
    val urls = source.select($"url").as[String].collect().sorted
    val (lo, hi) = (urls(200), urls(600))
    val df = read().select($"url")
      .filter($"url" > lo && $"url" < hi)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(s"url > '$lo'") && plan.contains(s"url < '$hi'"),
      "strict url bounds not pushed into GraftScan:\n" + plan)
    val got = df.as[String].collect().sorted.toSeq
    val want = urls.slice(201, 600).toSeq // strictly between
    assert(got == want, s"strict url range mismatch: got ${got.size}, want ${want.size}")

    // strict ts bounds fold to inclusive ±1µs (micros are integral)
    val micros = source.select(unix_micros($"warc_ts")).as[Long].collect().sorted
    val (tlo, thi) = (micros(100), micros(700))
    val tdf = spark.read.format("graft").load(dir)
      .filter($"warc_ts" > timestamp_micros(lit(tlo)) &&
        $"warc_ts" < timestamp_micros(lit(thi)))
      .select(unix_micros($"warc_ts").as("us"))
    val tplan = tdf.queryExecution.executedPlan.toString
    assert(tplan.contains(s"warc_ts_micros >= ${tlo + 1}") &&
      tplan.contains(s"warc_ts_micros <= ${thi - 1}"),
      "strict ts bounds not folded+pushed into GraftScan:\n" + tplan)
    val tgot = tdf.as[Long].collect().sorted.toSeq
    val twant = micros.filter(m => m > tlo && m < thi).toSeq
    assert(tgot == twant, s"strict ts range mismatch: got ${tgot.size}, want ${twant.size}")
  }

  test("equality predicate narrows to a single url") {
    import spark.implicits._
    val source = WebtextGen.pages(spark, 800L, partitions = 4)
    val one = source.select($"url").as[String].collect().sorted.apply(123)
    val got = read().filter($"url" === one).select($"lang").as[String].collect()
    val want = source.filter($"url" === one).select($"lang").as[String].collect()
    assert(got.toSeq == want.toSeq && got.length == 1)
  }

  test("write path: save runs the full encode pipeline; append resumes; overwrite truncates") {
    import spark.implicits._
    val out = tmpDir("graft-dsv2-write")
    graft.ScalingLevel.rmrf(out)
    val source = WebtextGen.pages(spark, 600L, seed = 21L, partitions = 4).toDF()

    source.write.format("graft").option("partitions", "4").mode("append").save(out)
    // the write produced the REAL engine layout: chunks + manifest, and
    // the DSv2 read and DecodeJob both see exactly the source rows
    val back = spark.read.format("graft").load(out)
    assert(back.count() == 600L)
    assert(back.exceptAll(source).count() == 0L && source.exceptAll(back).count() == 0L)
    val pids = spark.read.parquet(s"$out/manifest").select($"pid").distinct().count()
    assert(pids == 4L, s"partitions option not honored: $pids pids")

    // plain append on an EXISTING table is refused: the engine's append
    // is a crash-resume (committed pids skipped), and silently dropping
    // genuinely new rows through the standard writer contract would be
    // data loss — the error says what to do instead
    val refuse = intercept[Exception] {
      source.write.format("graft").option("partitions", "4").mode("append").save(out)
    }
    assert(refuse.getMessage.contains("resume"), refuse.getMessage)

    // append WITH the explicit resume opt-in = resumable re-run of the
    // same job: all pids already committed are skipped, nothing duplicates
    source.write.format("graft").option("partitions", "4")
      .option("resume", "true").mode("append").save(out)
    assert(spark.read.format("graft").load(out).count() == 600L,
      "re-issued append duplicated rows instead of resuming")

    // null html/text/lang are LEGAL null rows (the codec null bitmaps
    // carry them — the same data the engine's CLI surface accepts), and
    // they round-trip as nulls through the write+read pair
    val nullDir = tmpDir("graft-dsv2-null")
    val withNulls = source.limit(50)
      .withColumn("html", org.apache.spark.sql.functions.lit(null).cast("binary"))
      .withColumn("lang", org.apache.spark.sql.functions.lit(null).cast("string"))
    withNulls.write.format("graft").option("partitions", "2")
      .mode("overwrite").save(nullDir)
    val nback = spark.read.format("graft").load(nullDir)
    assert(nback.count() == 50L &&
      nback.filter($"html".isNull && $"lang".isNull).count() == 50L,
      "null html/lang did not round-trip as null rows")
    // the ONE key constraint — url — still fails with a NAMED error
    val nullErr = intercept[Exception] {
      source.limit(5).withColumn("url",
        org.apache.spark.sql.functions.lit(null).cast("string"))
        .write.format("graft").mode("overwrite").save(tmpDir("graft-dsv2-nullurl"))
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: chain(e.getCause))
    assert(chain(nullErr).exists(m => m != null && m.contains("must be non-null")),
      s"expected the named non-null url error, got: ${chain(nullErr)}")

    // overwrite truncates and re-encodes the new input
    val smaller = WebtextGen.pages(spark, 200L, seed = 22L, partitions = 2).toDF()
    smaller.write.format("graft").option("partitions", "2").mode("overwrite").save(out)
    val after = spark.read.format("graft").load(out)
    assert(after.count() == 200L)
    assert(after.exceptAll(smaller).count() == 0L && smaller.exceptAll(after).count() == 0L)
  }

  test("warc_ts-range predicates are consumed: exact rows, nulls excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a table where some rows LOSE their warc_ts: a ts-range predicate
    // must never match them (SQL null-comparison semantics), at every
    // skip level (row-group stats, chunk stats, exact row filter)
    val src = WebtextGen.pages(spark, 400L, seed = 33L, partitions = 4).toDF()
      .withColumn("warc_ts",
        when(expr("url like '%7'"), lit(null).cast("timestamp"))
          .otherwise($"warc_ts"))
    val out = tmpDir("graft-dsv2-ts")
    graft.ScalingLevel.rmrf(out)
    src.write.format("graft").option("partitions", "4").mode("overwrite").save(out)

    val micros = src.filter($"warc_ts".isNotNull)
      .select(unix_micros($"warc_ts")).as[Long].collect().sorted
    val (lo, hi) = (micros(100), micros(300))
    val df = spark.read.format("graft").load(out)
      .filter($"warc_ts" >= timestamp_micros(lit(lo)) &&
        $"warc_ts" <= timestamp_micros(lit(hi)))
      .select($"url", unix_micros($"warc_ts").as("us"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains(s"warc_ts_micros >= $lo") && plan.contains(s"warc_ts_micros <= $hi"),
      "ts bounds not pushed into GraftScan:\n" + plan)
    val got = df.as[(String, Long)].collect().sortBy(_._1).toSeq
    val want = src.filter($"warc_ts" >= timestamp_micros(lit(lo)) &&
        $"warc_ts" <= timestamp_micros(lit(hi)))
      .select($"url", unix_micros($"warc_ts").as("us"))
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(got == want, s"ts-range read mismatch: got ${got.size}, want ${want.size}")
    assert(got.nonEmpty && got.size < 400, s"degenerate range: ${got.size}")
  }

  test("ts-range scan skips row groups at the I/O level") {
    import org.apache.spark.sql.functions._
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfile.impl", classOf[CountingLocalFs].getName)
    val cdir = s"cntfile://$dir"
    def measure(f: => Unit): Long = {
      val b0 = CountingLocalFs.bytesRead.get()
      f
      CountingLocalFs.bytesRead.get() - b0
    }
    val full = measure {
      spark.read.format("graft").load(cdir)
        .write.format("noop").mode("overwrite").save()
    }
    // probe with the GLOBAL MINIMUM ts (same trick as the url spec): a
    // row group's (tsMin, tsMax) stats span the union of its chunks, so
    // only the group holding the minimum can survive an equality probe
    val minTs = spark.read.format("graft").load(dir)
      .agg(min("warc_ts")).collect().head.getTimestamp(0)
    val ranged = measure {
      spark.read.format("graft").load(cdir)
        .filter(col("warc_ts") === lit(minTs))
        .write.format("noop").mode("overwrite").save()
    }
    info(s"graft DSv2 bytes read: ts-equality ranged $ranged vs full $full")
    assert(ranged > 0 && full > 0, s"counting fs saw nothing: $ranged / $full")
    assert(ranged < full * 9 / 10,
      s"ts-ranged scan read $ranged bytes vs full $full — no row group pruned at I/O level")
  }

  test("ts filter on a pre-round-7 table (no ts statistics) stays exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // simulate a legacy chunk table: same chunks with the tsMin/tsMax
    // statistics columns REMOVED. The reader must fall back to the exact
    // decoded-row filter — a predicate over the missing stats columns
    // would wrongly treat them as all-null and drop every row group
    val legacy = tmpDir("graft-dsv2-legacy")
    graft.ScalingLevel.rmrf(legacy)
    spark.read.parquet(s"$dir/chunks").drop("tsMin", "tsMax")
      .write.mode("overwrite").parquet(s"$legacy/chunks")
    val micros = WebtextGen.pages(spark, 800L, partitions = 4)
      .select(unix_micros($"warc_ts")).as[Long].collect().sorted
    val (lo, hi) = (micros(200), micros(600))
    val pred = (c: DataFrame) => c.filter(
      col("warc_ts") >= timestamp_micros(lit(lo)) &&
        col("warc_ts") <= timestamp_micros(lit(hi)))
    val got = pred(spark.read.format("graft").load(legacy))
      .select($"url").as[String].collect().sorted.toSeq
    val want = pred(WebtextGen.pages(spark, 800L, partitions = 4).toDF())
      .select($"url").as[String].collect().sorted.toSeq
    assert(got == want && got.nonEmpty,
      s"legacy-table ts filter mismatch: got ${got.size}, want ${want.size}")
  }

  test("count(*) pushdown answers from chunk metadata, refuses under predicates") {
    import org.apache.spark.sql.functions._
    val df = read().agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates=[COUNT(*)"),
      "count(*) not pushed into GraftScan:\n" + plan)
    assert(df.collect().head.getLong(0) == 800L)

    // the pushed count reads the `rows` metadata column only — its I/O
    // must be a sliver of the full scan's
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfile.impl", classOf[CountingLocalFs].getName)
    val cdir = s"cntfile://$dir"
    def measure(f: => Unit): Long = {
      val b0 = CountingLocalFs.bytesRead.get()
      f
      CountingLocalFs.bytesRead.get() - b0
    }
    val full = measure {
      spark.read.format("graft").load(cdir)
        .write.format("noop").mode("overwrite").save()
    }
    val counted = measure {
      assert(spark.read.format("graft").load(cdir).count() == 800L)
    }
    info(s"graft DSv2 bytes read: pushed count $counted vs full scan $full")
    // the floor is per-file parquet footers (the nested chunk schema
    // alone is ~3 KB of footer per file) + the tiny `rows` int64 column;
    // the assertion is "a sliver of the data", not "zero"
    assert(counted > 0 && counted < full / 8,
      s"pushed count read $counted bytes vs full $full — not a metadata-only answer")

    // under a consumed predicate the metadata cannot answer exactly:
    // pushdown is refused and the decoded-row count stays correct
    val one = spark.read.format("graft").load(dir)
      .agg(min("url")).collect().head.getString(0)
    val fdf = spark.read.format("graft").load(dir)
      .filter(col("url") === one).agg(count(lit(1)).as("n"))
    val fplan = fdf.queryExecution.executedPlan.toString
    assert(!fplan.contains("PushedAggregates"),
      "count pushed despite a consumed predicate:\n" + fplan)
    assert(fdf.collect().head.getLong(0) == 1L)
  }

  test("min/max pushdown answers url and warc_ts extrema from chunk metadata") {
    import org.apache.spark.sql.functions._
    val df = read().agg(min("url"), max("url"), min("warc_ts"), max("warc_ts"),
      count(lit(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MIN(url)") && plan.contains("MAX(warc_ts)") &&
      plan.contains("COUNT(*)"),
      "min/max/count not pushed into GraftScan:\n" + plan)
    val row = df.collect().head
    val src = WebtextGen.pages(spark, 800L, partitions = 4)
      .agg(min("url"), max("url"), min("warc_ts"), max("warc_ts"), count(lit(1)))
      .collect().head
    assert(row == src, s"pushed extrema $row != source recompute $src")

    // metadata-only I/O: far below even the url+lang projection
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfile.impl", classOf[CountingLocalFs].getName)
    val cdir = s"cntfile://$dir"
    val b0 = CountingLocalFs.bytesRead.get()
    spark.read.format("graft").load(cdir)
      .agg(min("url"), max("warc_ts")).collect()
    val aggBytes = CountingLocalFs.bytesRead.get() - b0
    info(s"graft DSv2 bytes read: pushed min/max $aggBytes")
    assert(aggBytes > 0 && aggBytes < 60000,
      s"pushed min/max read $aggBytes bytes — not metadata-only")

    // a LEGACY table without ts statistics still answers exactly (falls
    // back to decoding only the warc_ts blocks)
    val legacy = tmpDir("graft-dsv2-aggleg")
    graft.ScalingLevel.rmrf(legacy)
    spark.read.parquet(s"$dir/chunks").drop("tsMin", "tsMax")
      .write.mode("overwrite").parquet(s"$legacy/chunks")
    val lrow = spark.read.format("graft").load(legacy)
      .agg(min("warc_ts"), max("warc_ts")).collect().head
    assert(lrow == WebtextGen.pages(spark, 800L, partitions = 4)
      .agg(min("warc_ts"), max("warc_ts")).collect().head,
      s"legacy ts extrema wrong: $lrow")

    // an ALL-NULL-ts table answers null extrema and an exact count
    val nulls = tmpDir("graft-dsv2-aggnull")
    graft.ScalingLevel.rmrf(nulls)
    WebtextGen.pages(spark, 30L, seed = 9L, partitions = 2).toDF()
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .write.format("graft").option("partitions", "2").mode("overwrite").save(nulls)
    val nrow = spark.read.format("graft").load(nulls)
      .agg(min("warc_ts"), max("warc_ts"), count(lit(1))).collect().head
    assert(nrow.isNullAt(0) && nrow.isNullAt(1) && nrow.getLong(2) == 30L,
      s"all-null-ts extrema wrong: $nrow")
  }

  test("a FAILED overwrite leaves the original table intact (stage-then-swap)") {
    import org.apache.spark.sql.functions._
    val out = tmpDir("graft-dsv2-stage")
    graft.ScalingLevel.rmrf(out)
    val orig = WebtextGen.pages(spark, 100L, seed = 41L, partitions = 2).toDF()
    orig.write.format("graft").option("partitions", "2").mode("append").save(out)
    // a poisoned overwrite (null url trips the per-row guard mid-encode)
    // must fail WITHOUT touching the committed table: the encode runs in
    // a staging dir and the swap never happens
    intercept[Exception] {
      orig.withColumn("url", lit(null).cast("string"))
        .write.format("graft").option("partitions", "2").mode("overwrite").save(out)
    }
    val after = spark.read.format("graft").load(out)
    assert(after.count() == 100L, "failed overwrite destroyed the original table")
    assert(after.exceptAll(orig).count() == 0L && orig.exceptAll(after).count() == 0L)
    // the failed attempt's staging dir was cleaned up (target survived)
    val parent = new java.io.File(out).getParentFile
    val leftovers = parent.listFiles()
      .filter(_.getName.startsWith(new java.io.File(out).getName + ".__overwrite-"))
    assert(leftovers.isEmpty, s"staging leftovers: ${leftovers.mkString(", ")}")
    // and a HEALTHY overwrite still swaps in the new table
    val fresh = WebtextGen.pages(spark, 40L, seed = 42L, partitions = 2).toDF()
    fresh.write.format("graft").option("partitions", "2").mode("overwrite").save(out)
    val swapped = spark.read.format("graft").load(out)
    assert(swapped.count() == 40L)
    assert(swapped.exceptAll(fresh).count() == 0L && fresh.exceptAll(swapped).count() == 0L)
  }

  test("overwrite with a TRAILING-SLASH path stages as a sibling, not a child") {
    // save("/data/t/") used to derive the staging dir as "/data/t/.__overwrite-…"
    // — a CHILD of the table dir, which deleteRecursive(path) then destroyed
    // before the rename, losing BOTH the old and the new copy
    val out = tmpDir("graft-dsv2-slash")
    graft.ScalingLevel.rmrf(out)
    val orig = WebtextGen.pages(spark, 60L, seed = 43L, partitions = 2).toDF()
    orig.write.format("graft").option("partitions", "2").mode("append").save(out)
    val fresh = WebtextGen.pages(spark, 30L, seed = 44L, partitions = 2).toDF()
    fresh.write.format("graft").option("partitions", "2").mode("overwrite").save(out + "/")
    val after = spark.read.format("graft").load(out)
    assert(after.count() == 30L, "trailing-slash overwrite lost the table")
    assert(after.exceptAll(fresh).count() == 0L && fresh.exceptAll(after).count() == 0L)
    // no staging leftovers beside OR inside the table dir
    val dirFile = new java.io.File(out)
    val beside = dirFile.getParentFile.listFiles()
      .filter(_.getName.startsWith(dirFile.getName + ".__overwrite-"))
    val inside = Option(dirFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".__overwrite-"))
    assert(beside.isEmpty && inside.isEmpty,
      s"staging leftovers: ${(beside ++ inside).mkString(", ")}")
  }

  test("empty projection (count star) and empty table read") {
    // count(*): Spark prunes to a zero-width schema — the reader must
    // still emit one row per decoded row
    assert(read().count() == 800L)
    // an encode dir without a chunks table is a valid zero-row table
    val empty = tmpDir("graft-dsv2-empty")
    graft.ScalingLevel.rmrf(empty)
    new java.io.File(empty).mkdirs()
    assert(spark.read.format("graft").load(empty).count() == 0L)
    // a nonexistent dir fails loudly at planning
    val err = intercept[Exception] {
      spark.read.format("graft").load(s"$empty/nope").count()
    }
    assert(err.getMessage != null)
  }
}
