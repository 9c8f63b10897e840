package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Optimization-round evidence dumper: writes `.explain("formatted")`
  * output for selected SparkEntry queries to `<outDir>/<name>_<suffix>.txt`
  * so plan-shape claims in OPTIMIZATION_r*.md are checkable offline.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [query...]
  * (no query names = all declared queries). Env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS — same contract as graft.Bench, so plans are dumped
  * under the bench's exact session configuration.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query...]")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val selected =
      if (names.isEmpty) graft.SparkEntry.queries
      else graft.SparkEntry.queries.filter { case (k, _) => names.contains(k) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote ${name}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
