package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.Parameters

import org.apache.spark.sql.functions.expr

import graft.SharedSpark

/** Randomized lock on the `codepoints` expression: for ARBITRARY
  * well-formed unicode strings — BMP text, supplementary-plane code
  * points (surrogate pairs in UTF-16), combining marks, interleavings —
  * the expression must emit exactly `String.codePoints()`, through the
  * full UTF8String round trip and the codegen path.
  */
object CodepointsProps extends Properties("codepoints") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SharedSpark.spark

  /** Well-formed code points across the planes the corpus can contain:
    * ASCII, Latin-1, CJK, combining marks, and supplementary (emoji,
    * SMP) — excluding the surrogate range, which cannot appear as a
    * code point in a valid string.
    */
  private val codePoint: Gen[Int] = Gen.frequency(
    4 -> Gen.choose(0x20, 0x7E),
    2 -> Gen.choose(0xA1, 0x2FF),
    1 -> Gen.choose(0x300, 0x36F), // combining marks
    2 -> Gen.choose(0x4E00, 0x9FFF),
    2 -> Gen.choose(0x1F300, 0x1F6FF), // supplementary: surrogate pairs
    1 -> Gen.choose(0x10000, 0x10FFF))

  private val uniString: Gen[String] =
    Gen.listOf(codePoint).map(cps =>
      new String(cps.toArray.flatMap(Character.toChars), 0,
        cps.map(Character.charCount).sum))

  property("equals String.codePoints for arbitrary unicode strings") =
    forAll(Gen.listOfN(12, uniString)) { strs =>
      val s = spark
      import s.implicits._
      Codepoints.register(s)
      val got = strs.toDF("s")
        .select(expr("codepoints(s)").as("cps"))
        .as[Seq[Int]].collect().toSeq
      val want = strs.map(_.codePoints().toArray.toSeq)
      got == want
    }
}
