package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphemeCountSpec extends SparkSpec {

  /** Shapes probe-verified equal between JDK `\X` and DuckDB's
    * `length_grapheme` (utf8proc) — the cross-engine contract the
    * `text_utf8_grapheme_stats` gate rides.
    */
  private val cases: Seq[(String, Int)] = Seq(
    "" -> 0,
    "abc" -> 3,
    "你好" -> 2,
    "café" -> 4, // NFC: precomposed é
    "café" -> 4, // NFD: e + combining acute = one cluster
    "👩‍💻" -> 1, // 👩‍💻 ZWJ sequence (3 cp)
    "👨‍👩‍👧‍👦" -> 1, // 👨‍👩‍👧‍👦 (7 cp)
    "👋🏽" -> 1, // 👋🏽 skin-tone modifier (2 cp)
    "🇺🇸" -> 1, // 🇺🇸 regional-indicator pair (2 cp)
    "가가" -> 2, // hangul syllable + conjoining jamo pair
    "क्ष" -> 2) // क्ष devanagari virama conjunct

  test("counts extended grapheme clusters per UAX #29") {
    val s = spark
    import s.implicits._
    GraphemeCount.register(s)
    val got = cases.map(_._1).toDF("s")
      .select(expr("grapheme_count(s)").as("n"))
      .as[Int].collect().toSeq
    assert(got == cases.map(_._2), cases.map(_._1).zip(got))
  }

  test("null in, null out; codegen and interpreted paths agree") {
    val s = spark
    import s.implicits._
    GraphemeCount.register(s)
    val got = Seq[Option[String]](None, Some("abc")).toDF("s")
      .select(expr("grapheme_count(s)")).collect()
    assert(got(0).isNullAt(0) && got(1).getInt(0) == 3)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interpreted = cases.map { case (v, _) =>
      GraphemeCount(Literal(v)).eval(null).asInstanceOf[Int]
    }
    assert(interpreted == cases.map(_._2))
  }

  test("is resolvable through SQL after registration") {
    val s = spark
    GraphemeCount.register(s)
    assert(s.sql("SELECT grapheme_count('café') AS n")
      .collect()(0).getInt(0) == 4)
  }
}
