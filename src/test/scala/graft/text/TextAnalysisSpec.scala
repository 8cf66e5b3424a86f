package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import TextAnalysis._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("normText lowercases, collapses whitespace runs, trims") {
    val got = Seq("  Hello   WORLD\t x \n").toDF("t")
      .select(normText($"t")).as[String].collect().head
    assert(got == "hello world x")
  }

  test("token counts: whitespace vs distinct vs BPE-ish") {
    val got = Seq("the cat the cat sat!").toDF("t")
      .select(nTokens($"t"), nUniqTokens($"t"), nBpeTokens($"t"))
      .as[(Int, Int, Int)].collect().head
    // tokens: the cat the cat sat! -> 5; distinct: the, cat, sat! -> 3
    // bpe-ish: the|cat|the|cat|sat|! -> 6
    assert(got == ((5, 3, 6)))
  }

  test("wordHits counts whole words only, case-insensitively") {
    val got = Seq("The theater is the best, THE END").toDF("t")
      .select(wordHits($"t", Seq("the"))).as[Int].collect().head
    assert(got == 3) // 'theater' must not match
  }

  test("langBest breaks score ties in inventory order and falls back to 'und'") {
    val got = Seq(
      "the house und der hund",  // en 1 hit, de 2 hits -> de
      "la la la",                // es 'la' and fr 'la': tie -> es (first in inventory)
      "zzz qqq").toDF("t")       // nothing -> und
      .select(langBest($"t")).as[String].collect().toSeq
    assert(got == Seq("de", "es", "und"))
  }

  test("fingerprint is invariant under case and whitespace mutations") {
    val rows = Seq(
      ("a", "Hello  World"), ("b", "hello world"), ("c", "  HELLO\tWORLD ")
    ).toDF("id", "t").select(fingerprint($"t")).as[String].collect().toSeq
    assert(rows.distinct.size == 1)
  }
}
