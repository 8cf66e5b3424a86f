package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: k MinHash values over a shingle-set
  * column, value-identical to the HOF formulation in
  * [[graft.text.NearDup.minhashes]] —
  * `hash_i(s) = md5(i || '|' || s)`, minimum per `i` taken
  * lexicographically on the lowercase hex string — and therefore checked
  * by the SAME DuckDB oracle SQL.
  *
  * Why native: the HOF version evaluates k × |shingles| interpreted
  * lambda steps per row (Catalyst dispatch + UTF8String concat + hex
  * stringification per hash), which made `dedup_minhash_lsh` the single
  * most expensive query on the bench (37.7 s of a 112 s total at sf0.1 —
  * pure CPU, not shuffle). This expression does one tight JVM loop per
  * row: prefix bytes are precomputed per seed, each digest is compared
  * as raw bytes (hex is order-preserving, so unsigned byte order ==
  * lexicographic hex order), and only the k winning digests are
  * hex-encoded at the end. Signature generation stays in the scan with
  * no shuffle — the 100 TB shape is unchanged, just ~an order of
  * magnitude cheaper per row.
  */
case class MinHashMd5(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"minhash_md5 needs k > 0, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5 requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    MinHashMd5.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashMd5.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5 =
    copy(child = newChild)
}

object MinHashMd5 {

  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** The per-row kernel (shared by eval and codegen): min_i over the
    * shingles of md5(i || '|' || shingle). Empty input → k nulls (the
    * HOF version's `array_min(empty)` semantics); null elements are
    * skipped like `array_min` skips them.
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](k)
    if (n > 0) {
      val md = digests.get()
      val prefixes = new Array[Array[Byte]](k)
      var i = 0
      while (i < k) {
        prefixes(i) = (i.toString + "|").getBytes(StandardCharsets.UTF_8)
        i += 1
      }
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val tb = arr.getUTF8String(j).getBytes
          i = 0
          while (i < k) {
            md.reset()
            md.update(prefixes(i))
            md.update(tb)
            val d = md.digest()
            if (mins(i) == null || java.util.Arrays.compareUnsigned(d, mins(i)) < 0)
              mins(i) = d
            i += 1
          }
        }
        j += 1
      }
    }
    new GenericArrayData(mins.map(m => if (m == null) null else toHex(m)))
  }

  private[functions] val ident = FunctionIdentifier("minhash_md5")
  private[functions] val info =
    new ExpressionInfo(classOf[MinHashMd5].getName, "minhash_md5")
  private[functions] val builder = (args: Seq[Expression]) => {
    require(args.length == 2 && args(1).foldable,
      "minhash_md5 takes (array<string>, literal int k)")
    MinHashMd5(args.head, Registry.literalInt(args(1), "minhash_md5", "k"))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
