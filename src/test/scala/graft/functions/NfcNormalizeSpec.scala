package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NfcNormalizeSpec extends SparkSpec {

  /** (input, expected NFC) as code-point escapes — composed/decomposed
    * source literals are visually identical, so nothing here relies on
    * editor rendering. Shapes mirror the `text_utf8_nfc_dedup` fixture
    * classes; all probe-verified equal between java.text.Normalizer and
    * DuckDB's nfc_normalize (utf8proc), 778 110/778 112 sweep cases —
    * the 2 divergent Yezidi multi-mark cases are documented in the
    * expression scaladoc and excluded from gated fixtures.
    */
  private val cases: Seq[(String, String)] = Seq(
    "" -> "",
    "abc" -> "abc",
    "caf\u00e9" -> "caf\u00e9", // already NFC: fixpoint
    "cafe\u0301" -> "caf\u00e9", // decomposed composes
    "A\u030a" -> "\u00c5", // A + ring
    "\u212b" -> "\u00c5", // angstrom sign singleton
    "\u1100\u1161\u11a8" -> "\uac01", // jamo -> syllable
    "s\u0323\u0307" -> "\u1e69", // marks in canonical order
    "\u1e61\u0323" -> "\u1e69", // composed-above + below reorders
    "\u0958" -> "\u0915\u093c", // composition EXCLUSION decomposes
    "\u0915\u093c" -> "\u0915\u093c",
    "\ud83d\ude00" -> "\ud83d\ude00") // SMP pass-through

  test("composes, reorders, and applies exclusions per UAX #15") {
    val s = spark
    import s.implicits._
    NfcNormalize.register(s)
    val got = cases.map(_._1).toDF("s")
      .select(expr("nfc_normalize(s)").as("n"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2),
      cases.map(_._1).zip(got).map { case (i, o) =>
        i.map(c => f"${c.toInt}%04x").mkString(" ") + " -> " +
          o.map(c => f"${c.toInt}%04x").mkString(" ")
      })
  }

  test("null in, null out; interpreted path agrees; NFC is a fixpoint") {
    val s = spark
    import s.implicits._
    NfcNormalize.register(s)
    val got = Seq[Option[String]](None, Some("café")).toDF("s")
      .select(expr("nfc_normalize(s)")).collect()
    assert(got(0).isNullAt(0) && got(1).getString(0) == "café")
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interpreted = cases.map { case (v, _) =>
      NfcNormalize(Literal(v)).eval(null).toString
    }
    assert(interpreted == cases.map(_._2))
    // idempotence over every case: normalize(normalize(x)) == normalize(x)
    cases.foreach { case (v, n) =>
      assert(NfcNormalize(Literal(n)).eval(null).toString == n,
        s"not a fixpoint: ${n.map(c => f"${c.toInt}%04x").mkString(" ")}")
    }
  }
}
