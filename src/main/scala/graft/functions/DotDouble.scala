package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: the FAST double dot product — a plain
  * left-to-right IEEE-754 double fold, value-identical to the HOF
  * formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (same
  * element order, same rounding at every step), which stays in-tree as
  * the executable spec (DotKernelProps).
  *
  * This is the PREFILTER kernel, not the verdict kernel: double sums
  * are not engine-portable (DuckDB's list_reduce fold is the same
  * order, but the repo's determinism discipline does not lean on
  * libm/codegen accidents), so any cross-engine comparison built on it
  * must carry a threshold margin that covers the <1e-12 divergence and
  * hand the real decision to [[DotExactDec]]. What it buys: a pair
  * screen ~50× cheaper than the decimal kernel and ~10× cheaper than
  * the interpreted HOF chain, which is what makes cluster-scoped
  * all-pairs screens (semantic dedup) affordable in the hot path.
  *
  * Null semantics mirror the HOF: any null element or a length
  * mismatch nulls the result.
  */
case class DotDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_double requires two array<float|double> args, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_double"

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotDouble.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
         |java.lang.Double $tmp = graft.functions.DotDouble.compute(
         |  $a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)});
         |${ev.isNull} = ($tmp == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}

object DotDouble {

  /** Shared eval/codegen kernel: strict left-to-right double fold. */
  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with pads nulls -> null sum
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc = acc + x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  private[functions] val ident = FunctionIdentifier("dot_double")
  private[functions] val info =
    new ExpressionInfo(classOf[DotDouble].getName, "dot_double")
  private[functions] val builder = (args: Seq[Expression]) => {
    require(args.length == 2, "dot_double takes exactly two arguments")
    DotDouble(args(0), args(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
