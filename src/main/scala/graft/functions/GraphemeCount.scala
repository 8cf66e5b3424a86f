package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the number of extended grapheme clusters
  * (UAX #29 — "characters as a user sees them") in a string, as
  * IntegerType.
  *
  * Spark ships no grapheme function at all (`length` counts code
  * points), which left user-perceived character counts the one
  * documented un-mirrorable text surface (see [[graft.text.Utf8Queries]]
  * — a multilingual quality scorer wants "📏 by what the user sees",
  * not by code points that count 👨‍👩‍👧‍👦 as 7). The kernel rides the
  * JDK's own UAX #29 segmenter via the regex `\X` construct (extended
  * grapheme cluster, `java.util.regex.Grapheme`), so there is no
  * hand-rolled break logic to drift from the spec.
  *
  * Cross-engine: DuckDB's `length_grapheme` (utf8proc) implements the
  * same UAX #29 extended clusters. Probe-measured agreement on every
  * cluster shape the corpus can contain — combining marks (café NFD),
  * CJK, Hangul syllable + conjoining jamo, ZWJ emoji sequences
  * (👩‍💻, 👨‍👩‍👧‍👦), skin-tone modifiers (👋🏽), regional-indicator flags
  * (🇺🇸), and Devanagari virama conjuncts (क्ष) — so the surface is
  * oracle-checkable. Residual skew risk is Unicode-VERSION drift on
  * exotic future clusters; the gate fixture pins the shapes above.
  *
  * Codegen calls the static kernel (one matcher pass per row, pattern
  * precompiled) — the expression stays inside WholeStageCodegen with no
  * row boxing, like the other kernels in this package.
  */
case class GraphemeCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"grapheme_count requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "grapheme_count"

  override protected def nullSafeEval(input: Any): Any =
    GraphemeCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GraphemeCount.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): GraphemeCount =
    copy(child = newChild)
}

object GraphemeCount {

  /** `\X` = one extended grapheme cluster (JDK ≥ 9). */
  private val Cluster = Pattern.compile("\\X")

  /** Per-row kernel shared by eval and codegen: count of `\X` matches.
    * Matchers are cheap to create; the Pattern (the expensive part) is
    * compiled once per JVM.
    */
  def compute(s: UTF8String): Int = {
    val m = Cluster.matcher(s.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }

  private[functions] val ident = FunctionIdentifier("grapheme_count")
  private[functions] val info =
    new ExpressionInfo(classOf[GraphemeCount].getName, "grapheme_count")
  private[functions] val builder = (args: Seq[Expression]) => {
    require(args.length == 1, "grapheme_count takes exactly one argument")
    GraphemeCount(args.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** DuckDB mirror: utf8proc's UAX #29 segmenter (cast to Spark's INT). */
  def sql(e: String): String = s"CAST(length_grapheme($e) AS INTEGER)"
}
