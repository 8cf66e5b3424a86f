package graft.text

import org.apache.spark.sql.functions._

import graft.{Queries, SparkSpec, Tables}

/** Pins curate_decontaminate_spans' accounting: every planted
  * contamination source (the doc its eval span was lifted from) must
  * surface with at least the full 25-token span removed, every report
  * row must balance (after = before − removed ≥ 0), and removal is
  * never smaller than one 5-gram window.
  */
class DecontaminateSpec extends SparkSpec {

  test("planted sources surface with the full span removed; accounting balances") {
    import spark.implicits._
    val rows = Queries.queries("curate_decontaminate_spans")(spark, sf0001)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tokens_before"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("tokens_removed"), r.getAs[Long]("tokens_after")))
      .toMap
    val planted = Tables(spark, sf0001, "documents")
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
      .filter(graft.functions.KeyHash.bucket100("eval|", $"doc_id") < 3 &&
        size($"toks") >= 32)
      .select($"doc_id").as[Long].collect()
    graft.CacheTracker.releaseAll()
    assert(planted.nonEmpty, "the 3% eval selection must hit this corpus")
    planted.foreach { id =>
      assert(rows.contains(id), s"planted source $id not reported")
      assert(rows(id)._3 >= 25L,
        s"source $id: the lifted 25-token span must be fully covered")
    }
    rows.foreach { case (id, (before, nSpans, removed, after)) =>
      assert(after == before - removed && after >= 0, s"doc $id balance")
      assert(nSpans >= 1 && removed >= 5L,
        s"doc $id: removal below one 5-gram window")
      assert(removed <= before, s"doc $id: removed more than it had")
    }
  }

  test("13-gram verdict: every planted source drops with >= 13 hits; keeps exist") {
    import spark.implicits._
    val rows = Queries.queries("curate_decontaminate_ngrams")(spark, sf0001)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[String]("verdict")))
      .toMap
    val planted = Tables(spark, sf0001, "documents")
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
      .filter(graft.functions.KeyHash.bucket100("eval|", $"doc_id") < 3 &&
        size($"toks") >= 32)
      .select($"doc_id").as[Long].collect()
    graft.CacheTracker.releaseAll()
    assert(planted.nonEmpty, "the 3% eval selection must hit this corpus")
    planted.foreach { id =>
      val (hits, verdict) = rows(id)
      // the lifted 25-token span holds 13 distinct 13-grams, all of
      // which the source doc itself contains
      assert(verdict == "drop" && hits >= 13L,
        s"planted source $id: ($hits, $verdict)")
    }
    assert(rows.values.count(_._2 == "keep") > rows.size / 2,
      "most of the corpus must survive decontamination")
    rows.foreach { case (id, (hits, verdict)) =>
      assert((hits == 0L) == (verdict == "keep"), s"doc $id inconsistent")
    }
  }
}
