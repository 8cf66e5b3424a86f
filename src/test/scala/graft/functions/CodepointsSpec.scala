package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CodepointsSpec extends SparkSpec {

  /** The contract: exactly `String.codePoints()` — surrogate pairs
    * emerge as single supplementary code points, never as lone halves
    * (the `split(s, '')` corruption the expression exists to avoid).
    */
  private val cases: Seq[(String, Seq[Int])] = Seq(
    "" -> Seq.empty,
    "abc" -> Seq(0x61, 0x62, 0x63),
    "你好" -> Seq(0x4F60, 0x597D),
    "café" -> Seq(0x63, 0x61, 0x66, 0xE9), // NFC precomposed
    "café" -> Seq(0x63, 0x61, 0x66, 0x65, 0x301), // NFD combining
    "😀" -> Seq(0x1F600), // non-BMP: one code point, not two surrogates
    "👩‍💻" -> Seq(0x1F469, 0x200D, 0x1F4BB), // ZWJ sequence
    "🇺🇸" -> Seq(0x1F1FA, 0x1F1F8), // regional-indicator pair
    "a😀b" -> Seq(0x61, 0x1F600, 0x62)) // BMP/non-BMP interleaved

  test("emits the string's code points in order, surrogate-safe") {
    val s = spark
    import s.implicits._
    Codepoints.register(s)
    val got = cases.map(_._1).toDF("s")
      .select(expr("codepoints(s)").as("cps"))
      .as[Seq[Int]].collect().toSeq
    assert(got == cases.map(_._2), cases.map(_._1).zip(got))
  }

  test("null in, null out; codegen and interpreted paths agree") {
    val s = spark
    import s.implicits._
    Codepoints.register(s)
    val got = Seq[Option[String]](None, Some("a😀")).toDF("s")
      .select(expr("codepoints(s)")).collect()
    assert(got(0).isNullAt(0) &&
      got(1).getSeq[Int](0) == Seq(0x61, 0x1F600))
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interpreted = cases.map { case (v, _) =>
      Codepoints(Literal(v)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
    }
    assert(interpreted == cases.map(_._2))
  }

  test("matches String.codePoints on the utf8 fixture rows") {
    val s = spark
    import s.implicits._
    Codepoints.register(s)
    val texts = graft.text.Utf8Queries.docs.map(_._2)
    val got = texts.toDF("s")
      .select(expr("codepoints(s)").as("cps")).as[Seq[Int]].collect().toSeq
    val want = texts.map(_.codePoints().toArray.toSeq)
    assert(got == want)
  }
}
