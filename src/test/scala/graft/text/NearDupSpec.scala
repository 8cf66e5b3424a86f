package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import NearDup._

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(s: String) = split(lit(s), " ")

  test("wordShingles yields n-k+1 shingles, distinct, and empty when too short") {
    val got = spark.range(1).select(
        wordShingles(toks("a b c d"), 3).as("s4"),
        wordShingles(toks("a b"), 3).as("s2"),
        wordShingles(toks("x y x y x y"), 3).as("rep"))
      .as[(Seq[String], Seq[String], Seq[String])].collect().head
    assert(got._1 == Seq("a b c", "b c d"))
    assert(got._2 == Seq())
    assert(got._3 == Seq("x y x", "y x y")) // repeats deduped
  }

  test("identical shingle sets give identical minhash signatures; disjoint sets differ") {
    val df = spark.range(1).select(
      minhashes(wordShingles(toks("a b c d e"), 3), 8).as("m1"),
      minhashes(wordShingles(toks("a b c d e"), 3), 8).as("m2"),
      minhashes(wordShingles(toks("p q r s t"), 3), 8).as("m3"))
    val (m1, m2, m3) = df.as[(Seq[String], Seq[String], Seq[String])].collect().head
    assert(m1 == m2)
    assert(m1 != m3)
    assert(m1.size == 8 && m1.forall(_.length == 32))
  }

  test("jaccard and containment on known sets") {
    val a = array(lit("x"), lit("y"), lit("z"))
    val b = array(lit("y"), lit("z"), lit("w"))
    val got = spark.range(1)
      .select(jaccard(a, b).as("j"), containment(a, b).as("c"))
      .as[(Double, Double)].collect().head
    assert(got._1 == 2.0 / 4.0)
    assert(got._2 == 2.0 / 3.0)
  }

  test("bandRows groups r consecutive hashes in index order") {
    val sig = Seq((1L, 0, "h0"), (1L, 1, "h1"), (1L, 2, "h2"), (1L, 3, "h3"))
      .toDF("doc_id", "i", "h")
    val got = bandRows(sig, "doc_id", 2)
      .orderBy("band").select("band", "mh").as[(Int, String)].collect().toSeq
    assert(got == Seq((0, "h0|h1"), (1, "h2|h3")))
  }

  test("lshCandidates pairs ids sharing a band key exactly once, ordered") {
    val bands = Seq(
      (1L, 0, "k"), (2L, 0, "k"), (3L, 0, "other"),
      (1L, 1, "k2"), (2L, 1, "k2")).toDF("doc_id", "band", "mh")
    val got = lshCandidates(bands, "doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L))) // two shared bands, one distinct pair
  }

  test("simhash: identical inputs agree across dialect and differ for disjoint texts") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "p q r s"))
      .toDF("t1", "t2")
      .selectExpr(
        s"${tokenHashesExpr(sparkDialect, "t1")} AS h1",
        s"${tokenHashesExpr(sparkDialect, "t2")} AS h2")
      .selectExpr(
        s"${simhashExpr(sparkDialect, "h1", "size(h1)")} AS s1",
        s"${simhashExpr(sparkDialect, "h2", "size(h2)")} AS s2")
      .as[(String, String)].collect()
    assert(df(0)._1 == df(0)._2)
    assert(df(1)._1 != df(1)._2)
    assert(df(0)._1.length == 64 && df(0)._1.forall(c => c == '0' || c == '1'))
  }

  test("charNgrams slide over normalized text") {
    val got = spark.range(1)
      .select(charNgrams(lit("AB cd"), 3)).as[Seq[String]].collect().head
    assert(got == Seq("ab ", "b c", " cd"))
  }
}
