package graft

import java.security.MessageDigest

/** Pins curate_token_budget_trim to the prefix-rule definition: per
  * source, documents ordered by the salted 48-bit key hash contribute
  * tokens until the running total would exceed the 800-token budget —
  * the kept set is the MAXIMAL prefix, never a backfilled subset — and
  * the report's counts and utilization are exact.
  */
class BudgetTrimSpec extends SparkSpec {

  private def h48(salt: String, key: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest((salt + key).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    java.lang.Long.parseLong(hex, 16)
  }

  test("budget trim matches a plain-Scala recompute of the prefix rule") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Queries.queries("curate_token_budget_trim")(spark, sf0001)
      .collect()
    val docs = Tables(spark, sf0001, "documents")
      .select($"source", $"doc_id",
        graft.text.TextAnalysis.nTokens($"text").cast("long").as("n"))
      .as[(String, Long, Long)].collect()
    graft.CacheTracker.releaseAll()
    val bySource = docs.groupBy(_._1)
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ordered = bySource(src)
        .sortBy { case (_, id, _) => (h48("budget", id.toString), id) }
      val cums = ordered.map(_._3).scanLeft(0L)(_ + _).tail
      val kept = cums.count(_ <= 800L)
      val tokensKept = ordered.take(kept).map(_._3).sum
      assert(r.getAs[Long]("n_docs") == ordered.length.toLong, src)
      assert(r.getAs[Long]("n_kept") == kept.toLong, src)
      assert(r.getAs[Long]("tokens_total") == ordered.map(_._3).sum, src)
      assert(r.getAs[Long]("tokens_kept") == tokensKept, src)
      assert(r.getAs[Long]("util_ppm") == 1000000L * tokensKept / 800L, src)
      // maximality: the kept set is a prefix and the next doc overflows
      assert(tokensKept <= 800L, src)
      if (kept < ordered.length)
        assert(tokensKept + ordered(kept)._3 > 800L,
          s"$src: prefix not maximal — doc ${ordered(kept)._2} would fit")
    }
  }
}
