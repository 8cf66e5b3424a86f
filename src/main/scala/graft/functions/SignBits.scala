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
  *   w_jd  = [[SignBits.weight]](j, d)                (1-based dim d)
  *   bit_j = [ Σ_d w_jd * xi_d  >= 0 ]
  *
  * The weights are md5-derived (the KeyHash recipe), NOT an affine
  * (j·a + d·b) mod p ramp: an affine family makes every hyperplane a
  * SHIFT of one periodic sawtooth, so planes within a band correlate
  * and banded LSH loses its selectivity exactly when the data has
  * structure — measured on the round-7 corpus: the old ramp's band 3
  * put 271k of 292k candidate pairs into a handful of periodic-key
  * buckets, 65× the pair mass md5 weights produce, which is the
  * difference between sub-linear and quadratic at 100 TB. Scaling the
  * deterministic weights by any positive constant cannot change the
  * projection's sign, so this is the same hyperplane family as
  * [[graft.vector.VectorOps.signBucket]] — minus that version's
  * interpreted DECIMAL(30,15) folds. Overflow bound: |w| <= 48,
  * |xi| <= 2^20·|x|, so 64 dims of unit-scale values stay under 2^34 —
  * nowhere near Long range.
  *
  * The DuckDB mirror is [[graft.vector.VectorOps.sqlSignBits]] (fed by
  * the hoisted [[graft.vector.VectorOps.sqlSignWeightsCte]] weight
  * matrix — per-row md5 in a lambda would cost the oracle h·dims
  * digests per vector); both engines compute identical BIGINTs in any
  * summation order.
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

  /** md5-derived hyperplane weight for (plane j, 1-based dim d), in
    * [-48, 48]: first 4 hex chars of md5("signw" ++ (j·1000 + d)) mod
    * 97, minus 48 — exactly [[KeyHash.bucket]]("signw", j·1000+d, 97)
    * − 48, which is what the SQL-side weight CTE computes.
    */
  def weight(j: Int, d: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val b = md.digest(s"signw${j * 1000 + d}".getBytes("UTF-8"))
    ((((b(0) & 0xff) << 8) | (b(1) & 0xff)) % 97) - 48
  }

  /** Weight matrices cached per (h, dims): h·dims md5 digests once per
    * JVM per shape, then plain array loads in the per-row kernel.
    */
  private val wcache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Long]]]()
  private def weights(h: Int, n: Int): Array[Array[Long]] =
    wcache.computeIfAbsent((h.toLong << 32) | n.toLong, _ =>
      Array.tabulate(h, n)((j, d0) => weight(j, d0 + 1).toLong))

  /** Shared eval/codegen kernel. Null elements contribute 0. */
  def compute(arr: ArrayData, h: Int, isFloat: Boolean): UTF8String = {
    val n = arr.numElements()
    val w = weights(h, n)
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
      val wj = w(j)
      d = 0
      while (d < n) {
        p += wj(d) * xi(d)
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
