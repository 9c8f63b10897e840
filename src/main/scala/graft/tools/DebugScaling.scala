package graft.tools

import org.apache.spark.sql.SparkSession
import graft.jobs.{EncodeJob, PidPage}
import graft.model.Page

/** Scratch: warm per-stage scaling diagnosis at local[8] vs local[32].
  * Not part of the driver contract. */
object DebugScaling {
  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse("/tmp/graft_scaling/pages_600000.parquet")

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.local.dir", "/dev/shm/graft_shuffle")
        .config("spark.sql.shuffle.partitions", 64)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def measure(cpus: Int): Unit = {
      val s = session(cpus)
      import s.implicits._
      def time(label: String)(f: => Any): Unit = {
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          f
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[dbg] local[$cpus] $label%-28s min ${times.min}%6.2f s  (${times.map(t => f"$t%.2f").mkString(" ")})")
      }
      val input = s.read.parquet(in).as[Page]
      val mapped = input.map(p => PidPage((p.url.hashCode & 0x7fffffff) % 128,
        p.url, p.warc_ts, p.html, p.text, p.lang))
      time("+shuffle+sort")(mapped.repartition(128, $"pid")
        .sortWithinPartitions($"pid", $"url").as[PidPage].count())
      time("+kernel")(mapped.repartition(128, $"pid")
        .sortWithinPartitions($"pid", $"url").as[PidPage]
        .mapPartitions(it => EncodeJob.encodePartition(it, 16L << 20, 65536)).count())
      s.stop()
    }

    measure(32) // warm order: 32 first so 8 is not JIT-advantaged
    measure(8)
    measure(32)
  }
}
