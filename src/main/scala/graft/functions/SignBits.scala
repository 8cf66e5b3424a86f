package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `h`-bit sign-random-hyperplane LSH
  * signature of an embedding, as an `h`-char '0'/'1' string.
  *
  * Arithmetic is pure 64-bit integer, so it is exact, associative, and
  * engine-portable with no decimal detour:
  *
  *   xi_d  = floor(x_d * 2^20)                        (fixed-point input)
  *   w_jd  = ((j*1009 + d*9176) % 97) - 48            (1-based dim d)
  *   bit_j = [ Σ_d w_jd * xi_d  >= 0 ]
  *
  * Scaling the deterministic weights by any positive constant cannot
  * change the projection's sign, so this is the same hyperplane family
  * as [[graft.vector.VectorOps.signBucket]] — minus that version's
  * interpreted DECIMAL(30,15) folds, which made signatures the dominant
  * per-row cost of the similarity queries. Overflow bound: |w| <= 48,
  * |xi| <= 2^20·|x|, so 64 dims of unit-scale values stay under 2^34 —
  * nowhere near Long range.
  *
  * The DuckDB mirror is [[graft.vector.VectorOps.sqlSignBits]]; both
  * engines compute identical BIGINTs in any summation order.
  */
case class SignBits(child: Expression, h: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if h > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(s"sign_bits needs h > 0, got $h")
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bits requires array<float> or array<double>, got $other")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "sign_bits"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    SignBits.compute(input.asInstanceOf[ArrayData], h, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignBits.compute($c, $h, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

object SignBits {

  /** Shared eval/codegen kernel. Null elements contribute 0. */
  def compute(arr: ArrayData, h: Int, isFloat: Boolean): UTF8String = {
    val n = arr.numElements()
    val xi = new Array[Long](n)
    var d = 0
    while (d < n) {
      val x =
        if (arr.isNullAt(d)) 0.0
        else if (isFloat) arr.getFloat(d).toDouble
        else arr.getDouble(d)
      xi(d) = math.floor(x * 1048576.0).toLong
      d += 1
    }
    val out = new Array[Byte](h)
    var j = 0
    while (j < h) {
      var p = 0L
      d = 0
      while (d < n) {
        p += (((j * 1009 + (d + 1) * 9176) % 97) - 48).toLong * xi(d)
        d += 1
      }
      out(j) = if (p >= 0L) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  private[functions] val ident = FunctionIdentifier("sign_bits")
  private[functions] val info =
    new ExpressionInfo(classOf[SignBits].getName, "sign_bits")
  private[functions] val builder = (args: Seq[Expression]) => {
    require(args.length == 2 && args(1).foldable,
      "sign_bits takes (array<float|double>, literal int h)")
    SignBits(args.head, Registry.literalInt(args(1), "sign_bits", "h"))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
