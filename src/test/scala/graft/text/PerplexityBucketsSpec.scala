package graft.text

import org.apache.spark.sql.functions._

import graft.{Queries, SparkSpec, Tables}

/** Pins the text_perplexity_buckets tercile contract: per language the
  * buckets partition exactly the ≥2-token documents of that language,
  * tercile sizes obey ntile's first-tiles-get-the-remainder rule, the
  * head/middle/tail score ranges are internally consistent and
  * non-interleaved (head's worst doc still scores ≥ middle's best), and
  * the band labels match the bucket ids.
  */
class PerplexityBucketsSpec extends SparkSpec {

  test("terciles partition each language and ranges do not interleave") {
    import spark.implicits._
    val rows = Queries.queries("text_perplexity_buckets")(spark, sf0001)
      .collect()
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    val docCounts = Tables(spark, sf0001, "documents")
      .select($"lang", TextAnalysis.tokens($"text").as("toks"))
      .filter(size($"toks") >= 2)
      .groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.keySet == docCounts.keySet)
    byLang.foreach { case (lang, lr) =>
      val byBucket = lr.sortBy(_.getAs[Int]("bucket"))
      assert(byBucket.map(_.getAs[Int]("bucket")).toSeq ==
        (1 to byBucket.length).toSeq, s"$lang buckets not contiguous")
      val sizes = byBucket.map(_.getAs[Long]("n_docs"))
      assert(sizes.sum == docCounts(lang), s"$lang docs not partitioned")
      // ntile: earlier tiles are never smaller, and by at most one row
      assert(sizes.sliding(2).forall {
        case Array(a, b) => a >= b && a - b <= 1
        case _ => true
      }, s"$lang tercile sizes ${sizes.mkString(",")} violate ntile")
      byBucket.foreach { r =>
        assert(r.getAs[Double]("lp_lo") <= r.getAs[Double]("lp_hi"),
          s"$lang bucket ${r.getAs[Int]("bucket")} inverted range")
        val expectBand = r.getAs[Int]("bucket") match {
          case 1 => "head"
          case 2 => "middle"
          case _ => "tail"
        }
        assert(r.getAs[String]("band") == expectBand)
      }
      // ordered DESC by score: head's floor >= middle's ceiling, etc.
      assert(byBucket.sliding(2).forall {
        case Array(hi, lo) =>
          hi.getAs[Double]("lp_lo") >= lo.getAs[Double]("lp_hi")
        case _ => true
      }, s"$lang bucket ranges interleave")
    }
  }
}
