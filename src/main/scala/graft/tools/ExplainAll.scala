package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: dump formatted physical plans for every SparkEntry query so
  * pushdown/broadcast/codegen can be audited. Not part of the driver
  * contract. Usage: runMain graft.tools.ExplainAll [queryName ...] */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = args.toSet
    graft.SparkEntry.queries
      .filter { case (k, _) => wanted.isEmpty || wanted(k) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===================== $name =====================")
        // GRAFT_EXPLAIN_EXECUTE=1: run the query first so the printed
        // adaptive plan is the FINAL one (runtime exchange/stage reuse,
        // AQE join demotions) rather than isFinalPlan=false
        try {
          val df = fn(spark, sfDir)
          // collect() (not a noop write): the write would build its OWN
          // QueryExecution and leave this df's adaptive plan unfinalized.
          // An execution failure must not swallow the STATIC plan — that
          // is the plan one most wants to see for a query that dies at
          // runtime (OOM, corrupt input, ANSI overflow).
          if (sys.env.get("GRAFT_EXPLAIN_EXECUTE").contains("1"))
            try df.collect()
            catch { case e: Throwable =>
              println(s"EXECUTE FAILED (static plan below): ${e.getMessage}") }
          df.explain("formatted")
        }
        catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
      }
    spark.stop()
  }
}
