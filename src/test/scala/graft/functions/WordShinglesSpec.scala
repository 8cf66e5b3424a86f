package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.NearDup

class WordShinglesSpec extends SparkSpec {

  test("native word_shingles equals the HOF formulation, order included") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog the quick brown fox",
      "a b c",
      "one two",           // shorter than n=3 -> empty
      "x x x x x"          // heavy duplication -> distinct collapses
    ).toDF("text").select(split($"text", " ").as("toks"))
    val both = docs.select(
      NearDup.wordShingles($"toks", 3).as("native"),
      NearDup.wordShinglesHof($"toks", 3).as("hof"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("null input array yields an empty shingle set on both formulations") {
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      NearDup.wordShingles(lit(null).cast("array<string>"), 3).as("n"),
      NearDup.wordShinglesHof(lit(null).cast("array<string>"), 3).as("h"))
    val r = df.head()
    assert(r.getSeq[String](0) == Seq.empty && r.getSeq[String](1) == Seq.empty)
  }

  test("null tokens are skipped inside a shingle like array_join skips them") {
    import spark.implicits._
    val df = Seq(1).toDF("x").select(
      NearDup.wordShingles(
        array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")), 3).as("n"),
      NearDup.wordShinglesHof(
        array(lit("a"), lit(null).cast("string"), lit("b"), lit("c")), 3).as("h"))
    val r = df.head()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
  }
}
