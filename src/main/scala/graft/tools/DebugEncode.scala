package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.jobs.{EncodeJob, PidPage}
import graft.model.Page

/** Scratch: bisect EncodeJob stage costs. Not part of the driver contract. */
object DebugEncode {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[debug] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val input = spark.read.parquet(in).as[Page]
    time("scan count")(input.count())
    time("scan count (again)")(input.count())
    val mapped = input.map(p => PidPage(
      (p.url.hashCode & 0x7fffffff) % 64, p.url, p.warc_ts, p.html, p.text, p.lang))
    time("scan+typed map count")(mapped.count())
    val shuffled = mapped.repartition(64, $"pid").sortWithinPartitions($"pid", $"url").as[PidPage]
    time("  +repartition+sort count")(shuffled.count())
    val chunks = shuffled.mapPartitions(it => EncodeJob.encodePartition(it, 16L << 20, 65536))
    time("  +encode kernel count")(chunks.count())
    time("  +encode kernel count (again)")(chunks.count())
    val out = "/tmp/debug_enc_chunks"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(out), true)
    time("  +write parquet")(chunks.write.mode("overwrite").parquet(out))
    // encoded columns are TOP-LEVEL struct fields (Model.scala), not an
    // array — build the (col, codec) pairs from the five leaves
    val onDisk = time("manifest pruned read")(
      spark.read.parquet(out)
        .select($"pid", $"rows", $"rawBytes", $"encBytes",
          array(Seq("url", "warc_ts", "html", "text", "lang").map(c =>
            struct(lit(c).as("col"), col(s"$c.codec").as("codec"))): _*).as("colCodecs")))
    time("manifest agg")(onDisk.groupBy($"pid").agg(sum($"rows")).count())
    time("manifest explode agg")(
      onDisk.select($"pid", explode($"colCodecs").as("cc"))
        .groupBy($"pid", $"cc.col").agg(count(lit(1))).count())
    spark.stop()
  }
}
