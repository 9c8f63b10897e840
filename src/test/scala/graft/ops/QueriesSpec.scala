package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Targeted coverage for query paths the driver's DuckDB oracle cannot
  * reach: the reliable-checkpoint variant of connected components (the
  * oracle always runs the default localCheckpoint path). */
class QueriesSpec extends AnyFunSuite with SparkFixture {

  test("dedup clusters: reliable checkpoint() path matches the localCheckpoint path") {
    import spark.implicits._
    val dir = tmpDir("graft-queries-docs")
    // small corpus with deliberate near-dup groups: template texts shared
    // across several doc_ids so LSH buckets produce edges and clusters
    // 75 templates x 4 docs: buckets of ~4 members sit INSIDE the LSH
    // bucket-size cap (2..16), so edges form and clusters emerge
    val docs = (0L until 300L).map { i =>
      val template = i / 4
      val text = s"shared template number $template with plenty of overlapping shingle content " * 4 +
        (if (i % 4 == 0) s" unique tail $i" else "")
      (i, text, "en", s"src${i % 4}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$dir/documents.parquet")

    val plain = Queries.qDedupClusters(spark, dir).orderBy("cluster_id")
      .as[(Long, Long)].collect().toSeq
    assert(plain.nonEmpty && plain.map(_._2).sum == 300L)
    assert(plain.exists(_._2 > 1L), "expected at least one multi-doc cluster")

    spark.conf.set("spark.graft.cc.checkpointEvery", "2")
    try {
      val reliable = Queries.qDedupClusters(spark, dir).orderBy("cluster_id")
        .as[(Long, Long)].collect().toSeq
      assert(reliable == plain, "reliable-checkpoint run diverged from localCheckpoint run")
      assert(spark.sparkContext.getCheckpointDir.isDefined)
    } finally spark.conf.unset("spark.graft.cc.checkpointEvery")
  }

  test("line-granular ops: windows, keep-first winners, exact df means, empty-doc guard") {
    import spark.implicits._
    val dir = tmpDir("graft-queries-lines")
    // hand-computable corpus; doc 3 is EMPTY (drives the sequence(0,-1)
    // guard: Spark's descending-range default would fabricate two bogus
    // lines for it where DuckDB's range(0) yields none)
    val docs = Seq(
      (0L, "a b c d e f g h i j", "en", "src0", 19L),
      (1L, "a b c d e f g h i j", "en", "src0", 19L),
      (2L, "a b c d e f g h x y", "en", "src1", 19L),
      (3L, "", "en", "src1", 0L),
      (4L, "i j i j", "en", "src2", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$dir/documents.parquet")

    // boilerplate: lines shared by >=2 docs of the SAME source; docs 0/1
    // share both 8-token windows in src0, doc 2's first window matches
    // them textually but sits in src1 -> not boilerplate there
    val boiler = Queries.qBoilerplate(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(boiler == Seq((0L, 2L, 2L), (1L, 2L, 2L), (2L, 2L, 0L), (4L, 1L, 0L)),
      s"boilerplate mismatch: $boiler")

    // keep-first: winner of "a b c d e f g h" is (0,0); "i j" is (0,1);
    // doc 1 keeps nothing, doc 2 keeps only its unique "x y" tail
    val dedup = Queries.qLineDedup(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(dedup == Seq((0L, 2L, 2L), (1L, 2L, 0L), (2L, 2L, 1L), (4L, 1L, 1L)),
      s"line dedup mismatch: $dedup")

    // df: a..h and i,j occur in 3 docs each, x,y in 1; nDocs=5 INCLUDING
    // the token-less doc (corpus size is corpus size)
    val dfm = Queries.qDocFreq(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(dfm == Seq(
      (0L, 10L, 6000L),   // 10 tokens * df 3 -> 30*10000/(10*5)
      (1L, 10L, 6000L),
      (2L, 10L, 5200L),   // 8*3 + 2*1 = 26 -> 26*10000/(10*5)
      (4L, 4L, 6000L)),   // 4 instances of df-3 tokens
      s"doc-freq mismatch: $dfm")
  }

  test("processScratch sweeps dead-JVM dirs, keeps live ones, wipes its own") {
    val tmpRoot = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val prefix = "graft-scrtest"
    // a stale dir from a JVM that no longer exists (pid far beyond
    // pid_max) with content, and a dir named after THIS live JVM
    val deadDir = tmpRoot.resolve(s"$prefix-99999999-dead")
    java.nio.file.Files.createDirectories(deadDir)
    java.nio.file.Files.writeString(deadDir.resolve("chunk"), "stale")
    val mine = ProcessHandle.current().pid()
    val liveDir = tmpRoot.resolve(s"$prefix-$mine-otherinput")
    java.nio.file.Files.createDirectories(liveDir)
    java.nio.file.Files.writeString(liveDir.resolve("inflight"), "keep")
    // a non-numeric-pid name must be treated as not-alive garbage too
    val junkDir = tmpRoot.resolve(s"$prefix-notapid-x")
    java.nio.file.Files.createDirectories(junkDir)
    try {
      val out = java.nio.file.Paths.get(Queries.processScratch(prefix, "/some/input"))
      assert(!java.nio.file.Files.exists(deadDir), "dead-JVM dir not swept")
      assert(!java.nio.file.Files.exists(junkDir), "unparseable-pid dir not swept")
      assert(java.nio.file.Files.exists(liveDir.resolve("inflight")),
        "live JVM's other scratch dir was wiped")
      // own target is returned wiped (created empty or absent, never stale)
      assert(out.getFileName.toString.startsWith(s"$prefix-$mine-"))
      assert(!java.nio.file.Files.exists(out.resolve("anything")))
      // repeated call wipes again and stays stable
      assert(Queries.processScratch(prefix, "/some/input") == out.toString)
    } finally {
      Seq(deadDir, liveDir, junkDir).foreach { p =>
        if (java.nio.file.Files.exists(p)) {
          java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(java.nio.file.Files.deleteIfExists(_))
        }
      }
    }
  }
}
