package graft.tools

import org.apache.spark.sql.SparkSession

import graft.jobs.DecodeJob

/** Scratch decode profiler: times full-table decode (DecodeJob.run ->
  * count) over an existing chunks+manifest dir, best-of-N reps, and prints
  * raw-equivalent GB/s. Not part of the driver contract.
  * Args: <encDir> [rawBytes] [cpus] [reps]. */
object ProfileDecode {
  def main(args: Array[String]): Unit = {
    val encDir = args(0)
    val rawBytes = args.lift(1).map(_.toLong).getOrElse(0L)
    val cpus = args.lift(2).map(_.toInt).getOrElse(32)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-decode")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: one full pass absorbs scan-path JIT + page cache effects
    DecodeJob.run(spark, encDir).count()
    val times = (1 to reps).map { rep =>
      val t0 = System.nanoTime()
      val n = DecodeJob.run(spark, encDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[decode] rep$rep: $n%,d rows in $sec%.2f s")
      sec
    }
    val best = times.min
    println(f"""{"decodeSecBest":$best%.3f,"decodeGbps":${if (rawBytes > 0) rawBytes / 1e9 / best else 0.0}%.4f,"reps":$reps}""")
    spark.stop()
  }
}
