package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct n-word shingles of a token
  * array — value-identical (including first-occurrence order and
  * array_join's null-skipping) to the HOF formulation in
  * [[graft.text.NearDup.wordShinglesHof]], so the DuckDB oracle SQL is
  * unchanged.
  *
  * Why native: shingling is the first stage of every text-dedup scan
  * (profiled 3.8 s of dedup_minhash_lsh's 9 s at sf0.1 — the largest
  * single cost after the interpreted transform/slice/array_join/
  * array_distinct chain re-evaluates per shingle). One pass per row
  * with a hash set keeps it proportional to token count.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"word_shingles needs n > 0, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** Shared eval/codegen kernel. Shorter-than-n inputs yield an empty
    * array; null tokens are skipped inside a shingle exactly like
    * `array_join` skips them.
    */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    i = 0
    while (i <= len - n) {
      val parts = new java.util.ArrayList[UTF8String](n)
      var j = 0
      while (j < n) {
        val t = toks(i + j)
        if (t != null) { parts.add(t); () }
        j += 1
      }
      seen.add(UTF8String.concatWs(sep,
        parts.toArray(new Array[UTF8String](parts.size())): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  private[functions] val ident = FunctionIdentifier("word_shingles")
  private[functions] val info =
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles")
  private[functions] val builder = (args: Seq[Expression]) => {
    require(args.length == 2 && args(1).foldable,
      "word_shingles takes (array<string>, literal int n)")
    WordShingles(args.head, Registry.literalInt(args(1), "word_shingles", "n"))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
