package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-registered codec surface (SURVEY.md §2 Table B "UDF/UDAF" row,
  * §7 M5): the byte-level codecs exposed as Spark SQL functions, so a
  * user querying the chunk table from SQL can decode a column without
  * dropping into Scala — the SQL analog of the reference CLI's
  * decompress surface (/root/reference/src/main.cu:131-169).
  *
  * Since round 4 these are NATIVE Catalyst expressions
  * ([[CodecExpression]]), not Scala UDFs: each inlines a static kernel
  * call into whole-stage codegen, so a Project using them compiles to one
  * generated function with no closure invocation or catalyst<->scala
  * conversion per row. Registration routes: [[register]] on a live
  * session (what the engine's own queries use), or
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session
  * build for spark-submit deployments.
  *
  *   fl_encode(bin)  -> self-describing FL bit-pack block (FlBytes;
  *                      bit-compatible with the reference fl_cpu.cu path)
  *   fl_decode(bin)  -> original bytes
  *   fl_size(bin)    -> exact reference-FL on-disk size of the input
  *                      (the north-rule baseline, without materializing)
  *   rle_encode(bin) -> RLE block (value,varint-count runs)
  *   rle_decode(bin) -> original bytes
  *   col_decode_bytes(block) -> array<binary>: decode one ColumnCodec
  *                      chunk-column block (any byte form the selector
  *                      emits: dict / composite / fl_plain)
  */
object GraftFunctions {

  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = {
    def unary(name: String, mk: Expression => Expression): (String, Seq[Expression] => Expression) =
      name -> { es: Seq[Expression] =>
        // AnalysisException, not require(): a wrong-arity SQL call is an
        // analysis error, and frontends catch AnalysisException — a raw
        // IllegalArgumentException escaping analysis breaks that contract
        if (es.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            s"[WRONG_NUM_ARGS] $name expects exactly 1 argument, got ${es.length}",
            None, None, None, None, Map.empty,
            Array.empty[org.apache.spark.QueryContext])
        mk(es.head)
      }
    Seq(
      unary("fl_encode", FlEncode),
      unary("fl_decode", FlDecode),
      unary("fl_size", FlSize),
      unary("rle_encode", RleEncode),
      unary("rle_decode", RleDecode),
      unary("col_decode_bytes", ColDecodeBytes))
  }

  // derived, not hand-maintained: a seventh builder can't silently drift
  // out of the public name list
  val Names: Seq[String] = builders.map(_._1)

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      // source label "built-in": these are codegen-native Catalyst
      // expressions, and "scala_udf" would misreport them to
      // listFunctions()-style tooling as opaque closures
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
    // DELIBERATELY does not enable CodecRoundTripElimination: register()
    // is the route the engine's own verification query (q_sql_codec)
    // uses, and that query exists to RUN the kernels under the oracle —
    // auto-eliding decode(encode(x)) there would turn the round-trip
    // proof into `text = text`. The rule itself is conf-gated (inert by
    // default) on EVERY route; registerOptimizations is the opt-in.
  }

  /** Opt-in live-session route for the round-trip-elimination optimizer
    * rule: registers the rule AND flips its gating conf on (the
    * extensions route injects the rule at session build, but it stays
    * inert until this conf opts in — see the rule's scaladoc for why
    * default-on would defeat q_sql_codec's proof). Idempotent: repeated
    * calls never stack duplicate rule instances. */
  def registerOptimizations(spark: SparkSession): Unit = {
    // the check-then-append is a read-modify-write on shared session
    // state: unsynchronized, two concurrent initializers could stack the
    // rule twice (or lose another writer's rule)
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(CodecRoundTripElimination))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ CodecRoundTripElimination
    }
    spark.conf.set(CodecRoundTripElimination.ConfKey, "true")
  }
}
