package graft.text

import graft.SparkSpec

class UrlCanonicalSpec extends SparkSpec {

  /** Every mess axis the canonicalizer claims to normalize, pinned
    * independently: (input, expected canonical form).
    */
  private val cases: Seq[(String, String)] = Seq(
    // scheme + host case
    "HTTP://Example.COM/path" -> "http://example.com/path",
    // default ports stripped per scheme; non-default kept
    "http://example.com:80/path" -> "http://example.com/path",
    "https://example.com:443/path" -> "https://example.com/path",
    "http://example.com:8080/path" -> "http://example.com:8080/path",
    "https://example.com:80/path" -> "https://example.com:80/path",
    // www prefix
    "http://www.example.com/path" -> "http://example.com/path",
    // empty path -> '/', trailing slashes stripped on non-root
    "http://example.com" -> "http://example.com/",
    "http://example.com/" -> "http://example.com/",
    "http://example.com/path/" -> "http://example.com/path",
    "http://example.com/a/b//" -> "http://example.com/a/b",
    // fragments dropped
    "http://example.com/path#sec2" -> "http://example.com/path",
    // tracking params dropped, survivors sorted; empty query dropped
    "http://example.com/p?utm_source=x&id=2" -> "http://example.com/p?id=2",
    "http://example.com/p?b=1&a=2" -> "http://example.com/p?a=2&b=1",
    "http://example.com/p?fbclid=f&gclid=g&ref=r" -> "http://example.com/p",
    "http://example.com/p?utm_campaign=z&id=2&utm_medium=m"
      -> "http://example.com/p?id=2",
    // path case is PRESERVED (paths are case-sensitive)
    "http://example.com/Article/1" -> "http://example.com/Article/1",
    // all axes at once
    "HTTPS://WWW.News.ORG:443/a/?utm_source=s&z=1&a=2#frag"
      -> "https://news.org/a?a=2&z=1")

  test("canonicalizer normalizes each mess axis independently") {
    val s = spark
    import s.implicits._
    val got = DedupQueries.canonicalizeUrls(s,
      cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("doc_id", "url"))
      .orderBy($"doc_id")
      .select($"canonical_url").as[String].collect().toSeq
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"canonicalize($in)")
    }
  }

  test("variants collapse to one group keyed by the lowest doc_id") {
    val s = spark
    import s.implicits._
    val variants = Seq(
      (10L, "HTTP://Example.COM/p/?utm_source=a&id=1#x"),
      (11L, "http://www.example.com:80/p?id=1"),
      (12L, "http://example.com/p?id=1&gclid=g"),
      (20L, "http://example.com/p?id=2"))
    val got = DedupQueries.canonicalizeUrls(s, variants.toDF("doc_id", "url"))
      .groupBy($"canonical_url")
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("kept"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("http://example.com/p?id=1", 10L, 3L),
      ("http://example.com/p?id=2", 20L, 1L)))
  }
}
