package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): times every SparkEntry
  * query on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A query that throws is NOT silently swallowed: its timing is reported
  * as -1 and the exception surfaces in an `errors` field, so a broken
  * query can never masquerade as a fast one.
  *
  * Each query is timed best-of-3 by default: this host's shared disk
  * gives single-shot timings up to 5x swings that loadavg does not show
  * (one full pass measured 91 s where best-of-3 measured 25 s). Override
  * with `-r N`; query names restrict the set, e.g.
  * `runMain graft.Bench -r 1 q_for_frames`.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object Bench {
  private def jsonEscape(s: String): String = JsonEscape(s)

  /** String-aware brace/bracket balance check — NOT a JSON parser, just
    * enough to reject a truncated blob whose last byte happens to be an
    * inner '}' (which startsWith/endsWith alone accepts). */
  private[graft] def balancedJson(s: String): Boolean = {
    var depth = 0
    var inStr = false
    var esc = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1; if (depth < 0) return false
        case _ => ()
      }
      i += 1
    }
    depth == 0 && !inStr
  }

  def main(args: Array[String]): Unit = {
    val (repeat, names) = args.toList match {
      case "-r" :: n :: rest => (math.max(1, n.toInt), rest)
      case rest              => (3, rest)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // a typo'd name must not silently select nothing and print a passing
    // 0-second bench — and the check needs nothing from Spark, so it runs
    // BEFORE the ~20 s session spin-up, not after
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
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
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = selected.map { case (name, fn) =>
      var best = Double.MaxValue
      var lastErr: Throwable = null
      (1 to repeat).foreach { _ =>
        val t0 = System.nanoTime()
        try {
          // noop sink, NOT count(): count lets Catalyst prune every
          // unreferenced projection, so a select-only query would be
          // timed as a parquet metadata count (and a projection that
          // throws at runtime would be optimized away and "pass")
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable => lastErr = e }
      }
      if (lastErr != null) {
        // ANY failed rep is surfaced (a flaky query is a broken query),
        // even when another rep produced a timing
        errors(name) = s"${lastErr.getClass.getSimpleName}: ${String.valueOf(lastErr.getMessage).take(200)}"
      }
      if (best == Double.MaxValue) name -> -1.0 // every rep threw: sentinel
      else name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else "," + "\"errors\":" + errors
        .map { case (k, v) => "\"" + jsonEscape(k) + "\":\"" + jsonEscape(v) + "\"" }
        .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // attach the latest ScalingBench evidence (north_rule: encode GB/s,
    // ratio vs reference FL, N->4N scaling efficiency); the attached JSON
    // carries its own generatedAtIso/runId stamp so staleness is visible
    val scaling = {
      val p = java.nio.file.Paths.get("bench_scaling.json")
      if (java.nio.file.Files.exists(p)) {
        // sanity-gate the inlined blob: a truncated/empty file (killed
        // ScalingBench mid-write) must not turn THIS bench line — an
        // otherwise-good round — into unparseable JSON; omit instead.
        // Balance-count braces/brackets (string-aware): a prefix
        // truncated at an INNER '}' still starts '{' and ends '}', which
        // the old startsWith/endsWith gate waved through
        val s = java.nio.file.Files.readString(p).trim
        if (s.startsWith("{") && s.endsWith("}") && balancedJson(s))
          "," + "\"scaling\":" + s
        else { System.err.println(s"[bench] ignoring malformed bench_scaling.json (${s.length} chars)"); "" }
      } else ""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"${jsonEscape(sfDir)}"$errJson$scaling}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
