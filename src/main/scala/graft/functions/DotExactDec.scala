package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: the exact-decimal dot product —
  * value-identical to the HOF kernel in [[graft.vector.VectorOps]]
  * (`zip_with` → per-product `CAST(x·y AS DECIMAL(30,15))` → exact
  * `aggregate` sum → double), and therefore checked by the SAME DuckDB
  * mirror (`sqlDotExact`).
  *
  * Each product is computed in double (exact for float inputs: 24-bit
  * mantissas multiply into 48 < 53 bits), rounded ONCE to scale 15 with
  * HALF_UP — `java.math.BigDecimal.valueOf` is the same
  * shortest-string conversion Spark's double→decimal cast uses — and
  * summed exactly, so the result is associative and engine-portable.
  *
  * Null semantics mirror the HOF formulation: any null element, or a
  * length mismatch (zip_with pads with nulls), nulls the whole result.
  *
  * Why native: the HOF chain costs two Catalyst lambda dispatches and a
  * Decimal box per element per pair; this is the per-pair inner loop of
  * every similarity query, so at 100 TB it must be a tight JVM loop.
  */
case class DotExactDec(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_exact_dec requires two array<float|double> args, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_exact_dec"

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotExactDec.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.DotExactDec.compute(
         |  $a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)});
         |${ev.isNull} = ($tmp == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExactDec =
    copy(left = newLeft, right = newRight)
}

object DotExactDec {

  /** Shared eval/codegen kernel; null mirrors the HOF null semantics. */
  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with pads nulls -> null sum
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc = acc.add(
        JBigDecimal.valueOf(x * y).setScale(15, RoundingMode.HALF_UP))
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }

  private[functions] val ident = FunctionIdentifier("dot_exact_dec")
  private[functions] val info =
    new ExpressionInfo(classOf[DotExactDec].getName, "dot_exact_dec")
  private[functions] val builder = (args: Seq[Expression]) => {
    require(args.length == 2, "dot_exact_dec takes exactly two arguments")
    DotExactDec(args(0), args(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
