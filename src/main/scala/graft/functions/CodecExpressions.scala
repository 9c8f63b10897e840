package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.codec.{ColumnCodec, FlBytes, ReferenceFl, RleBytes}

/** Static-forwarder kernel entry points for the generated code: a Scala
  * top-level object compiles to a mirror class with static methods, so
  * whole-stage codegen can emit plain
  * `graft.functions.CodecKernels.flEncode(input)` calls — no UDF closure
  * serialization, no boxing through Row converters, no codegen fallback.
  * (The eval path calls the same methods, so interpreted and generated
  * execution are one implementation.) */
object CodecKernels {
  def flEncode(d: Array[Byte]): Array[Byte] = FlBytes.encode(d)
  def flDecode(b: Array[Byte]): Array[Byte] = FlBytes.decode(b)
  def flSize(d: Array[Byte]): Long = ReferenceFl.fileSizeOf(d)
  def rleEncode(d: Array[Byte]): Array[Byte] = RleBytes.encode(d)
  def rleDecode(b: Array[Byte]): Array[Byte] = RleBytes.decode(b)
  def colDecodeBytes(b: Array[Byte]): ArrayData = {
    val arr = ColumnCodec.decodeBytes(b)
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }
}

/** Native Catalyst expressions for the SQL codec surface (the extension
  * preference order: a codegen'd `Expression` beats a Scala UDF). Each is
  * a deterministic, null-intolerant unary over BinaryType whose
  * `doGenCode` inlines a static kernel call into whole-stage codegen —
  * the Project stays one generated function, where a UDF would insert an
  * opaque closure invocation with catalyst<->scala converters per row. */
abstract class CodecExpression extends UnaryExpression {
  // NullType is accepted so `SELECT fl_encode(NULL)` returns NULL like a
  // builtin would, instead of failing analysis ("got void") — the
  // implicit-cast machinery builtins use (ImplicitCastInputTypes /
  // AbstractDataType) is private[sql] in Spark 4.1, so the null case
  // must be admitted here and short-circuited in codegen below. A
  // STRING argument still needs an explicit CAST(x AS BINARY); the
  // message says so.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${child.dataType.catalogString}" +
        " (use CAST(x AS BINARY) for strings)")
  override def nullIntolerant: Boolean = true
  /** Fully-qualified static kernel the generated code calls. */
  protected def kernel: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // a NullType child can never feed the byte[] kernel signature —
    // emit a constant-null result (interpreted eval is covered by
    // nullIntolerant: null in, null out)
    if (child.dataType == NullType) ExprCode.forNullValue(dataType)
    else defineCodeGen(ctx, ev, c => s"graft.functions.CodecKernels.$kernel($c)")
}

case class FlEncode(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "fl_encode"
  protected def kernel: String = "flEncode"
  protected override def nullSafeEval(in: Any): Any =
    CodecKernels.flEncode(in.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): FlEncode = copy(child = c)
}

case class FlDecode(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "fl_decode"
  protected def kernel: String = "flDecode"
  protected override def nullSafeEval(in: Any): Any =
    CodecKernels.flDecode(in.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): FlDecode = copy(child = c)
}

case class FlSize(child: Expression) extends CodecExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fl_size"
  protected def kernel: String = "flSize"
  protected override def nullSafeEval(in: Any): Any =
    CodecKernels.flSize(in.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): FlSize = copy(child = c)
}

case class RleEncode(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "rle_encode"
  protected def kernel: String = "rleEncode"
  protected override def nullSafeEval(in: Any): Any =
    CodecKernels.rleEncode(in.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): RleEncode = copy(child = c)
}

case class RleDecode(child: Expression) extends CodecExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "rle_decode"
  protected def kernel: String = "rleDecode"
  protected override def nullSafeEval(in: Any): Any =
    CodecKernels.rleDecode(in.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): RleDecode = copy(child = c)
}

case class ColDecodeBytes(child: Expression) extends CodecExpression {
  // decoded chunk columns may hold null rows -> containsNull
  override def dataType: DataType = ArrayType(BinaryType, containsNull = true)
  override def prettyName: String = "col_decode_bytes"
  protected def kernel: String = "colDecodeBytes"
  protected override def nullSafeEval(in: Any): Any =
    CodecKernels.colDecodeBytes(in.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): ColDecodeBytes = copy(child = c)
}

/** Optimizer rule: codec ROUND-TRIP ELIMINATION —
  * `fl_decode(fl_encode(x))` and `rle_decode(rle_encode(x))` rewrite to
  * `x`. decode(encode(x)) == x is the invariant CodecSpec property-tests
  * for every input (and both expressions are deterministic and
  * null-intolerant, so the null case rewrites identically: null in, null
  * out), which makes the pair a no-op the optimizer can drop — the codec
  * analog of Catalyst eliminating `cast(cast(x))`. Matters in practice
  * when views/CTEs compose an encoding writer with a decoding reader:
  * the kernel calls vanish from the generated code instead of running
  * encode+decode per row.
  *
  * CONF-GATED, default OFF ([[CodecRoundTripElimination.ConfKey]]): the
  * engine's own verification query (q_sql_codec) PROVES the round-trip
  * by running the kernels under the DuckDB oracle, and an
  * always-on rewrite would silently turn that proof into `x = x` on any
  * session built with the extensions route — codec corruption would
  * pass verification. The rule is therefore injected everywhere but
  * inert until the conf opts in (registerOptimizations sets it). */
object CodecRoundTripElimination
  extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  val ConfKey = "spark.graft.optimizer.roundTripElimination"
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    if (conf.getConfString(ConfKey, "false") != "true") plan
    else plan.transformAllExpressions {
      // BinaryType only: the pair also accepts a NullType literal
      // (fl_decode(fl_encode(NULL)) analyzes as BINARY), and substituting
      // the raw NullType child would change the optimized plan's
      // expression schema out from under the parent's generated code
      case FlDecode(FlEncode(c)) if c.dataType == BinaryType   => c
      case RleDecode(RleEncode(c)) if c.dataType == BinaryType => c
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * codec functions AND the round-trip-elimination optimizer rule at
  * session build — the SparkSessionExtensions route for spark-submit
  * deployments ([[GraftFunctions.register]] covers already-running
  * sessions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(classOf[CodecExpression].getName, name), builder))
    }
    ext.injectOptimizerRule(_ => CodecRoundTripElimination)
  }
}
