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
