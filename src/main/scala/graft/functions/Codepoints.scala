package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the string's Unicode code points as
  * `array<int>`, in order.
  *
  * Spark ships no code-point accessor at all — `split(s, '')` runs a
  * Java regex over the UTF-16 form and CUTS SURROGATE PAIRS IN HALF
  * (every emoji becomes two lone surrogates), so any per-character
  * classification built on it silently corrupts non-BMP text. This
  * kernel walks `String.codePoints()`, which pairs surrogates
  * correctly, making code-point-level analysis (script histograms,
  * range filters, confusable detection) expressible as ordinary
  * integer HOF arithmetic downstream.
  *
  * Cross-engine: DuckDB mirrors it with
  * `list_transform(regexp_extract_all(e, '(?s).'), c -> unicode(c))` —
  * RE2's `.` matches one code point over UTF-8 (the `(?s)` flag only
  * lifts the no-newline exclusion) and `unicode()` returns its scalar
  * value, so both engines emit the identical int list for any valid
  * UTF-8 input including non-BMP. [[sql]] renders that fragment so the
  * two dialects cannot drift.
  *
  * Codegen calls the static kernel (one pass, exact-sized output
  * array), keeping the expression inside WholeStageCodegen like the
  * other kernels in this package.
  */
case class Codepoints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"codepoints requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "codepoints"

  override protected def nullSafeEval(input: Any): Any =
    Codepoints.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Codepoints.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Codepoints =
    copy(child = newChild)
}

object Codepoints {

  /** Per-row kernel shared by eval and codegen: surrogate-aware
    * code-point walk. `codePointCount` pre-sizes the output so the
    * array is built in one pass with no growth copies.
    */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new Array[Any](str.codePointCount(0, str.length))
    var i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(out)
  }

  private[functions] val ident = FunctionIdentifier("codepoints")
  private[functions] val info =
    new ExpressionInfo(classOf[Codepoints].getName, "codepoints")
  private[functions] val builder = (args: Seq[Expression]) => {
    require(args.length == 1, "codepoints takes exactly one argument")
    Codepoints(args.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** DuckDB mirror: one string per RE2 code-point match, then its
    * scalar value. `(?s)` so a literal newline cannot silently drop a
    * code point from the list.
    */
  def sql(e: String): String =
    s"list_transform(regexp_extract_all($e, '(?s).'), c -> unicode(c))"
}
