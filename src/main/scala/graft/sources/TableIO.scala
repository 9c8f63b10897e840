package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thin table-format indirection for every table the engine reads/writes
  * (input pages, encoded chunks, manifests, decoded output).
  *
  * BASELINE.json's north_rule targets Iceberg tables; this sandbox ships
  * no Iceberg runtime jar (/opt/spark/jars has none and dependency
  * resolution is offline), so the default layout is plain parquet — the
  * same file layout an Iceberg table's data files use. On a cluster with
  * `iceberg-spark-runtime` on the classpath, setting
  * `spark.graft.table.format=iceberg` (plus the usual catalog conf)
  * switches every IO site in one place; no job code changes.
  */
object TableIO {

  val FormatKey = "spark.graft.table.format"

  def format(spark: SparkSession): String =
    spark.conf.getOption(FormatKey).getOrElse("parquet")

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(format(spark)).load(path)

  def write(df: DataFrame, path: String, mode: SaveMode,
            options: Map[String, String] = Map.empty): Unit =
    df.write.format(format(df.sparkSession)).options(options).mode(mode).save(path)
}
