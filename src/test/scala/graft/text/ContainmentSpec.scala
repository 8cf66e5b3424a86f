package graft.text

import graft.{Queries, SparkSpec, Tables}

/** Pins dedup_shingle_containment to the property the gate exists for:
  * a prefix fragment's shingles are a SUBSET of its original's (so the
  * fragment-side containment is exactly 1e6 ppm), while the pair's
  * Jaccard sits far below the 0.9 near-dup threshold — the case
  * Jaccard-only dedup provably misses and containment provably flags.
  */
class ContainmentSpec extends SparkSpec {

  test("recovered fragment pairs: containment exactly 1e6, Jaccard below 0.9") {
    import spark.implicits._
    val rows = Queries.queries("dedup_shingle_containment")(spark, sf0001)
      .collect()
    graft.CacheTracker.releaseAll()
    val fragPairs = rows.filter(r =>
      r.getAs[Long]("doc_b") == r.getAs[Long]("doc_a") + 20000)
    assert(fragPairs.nonEmpty, "the planted fragments must surface")
    fragPairs.foreach { r =>
      val (inter, sa, sb) = (r.getAs[Int]("inter"),
        r.getAs[Int]("size_a"), r.getAs[Int]("size_b"))
      // fragment (doc_b, the smaller side) fully contained: A∩B = B
      assert(inter == sb, s"pair ${r.getAs[Long]("doc_a")}: prefix " +
        "shingles must be a subset of the original's")
      assert(r.getAs[Long]("cont_b_ppm") == 1000000L)
      // and Jaccard = inter / (sa + sb - inter) is NOT a near-dup hit
      val jacPpm = 1000000L * inter / (sa + sb - inter)
      assert(jacPpm < 900000L,
        s"pair ${r.getAs[Long]("doc_a")}: Jaccard $jacPpm ppm should be " +
          "below the 0.9 threshold — otherwise this gate proves nothing")
    }
  }

  test("fragment recovery clears the banding's expected recall") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val eligible = Tables(spark, sf0001, "documents")
      .select(TextAnalysis.tokens($"text").as("toks"))
      .filter(size($"toks") >= 15).count()
    val rows = Queries.queries("dedup_shingle_containment")(spark, sf0001)
      .collect()
    graft.CacheTracker.releaseAll()
    val recovered = rows.count(r =>
      r.getAs[Long]("doc_b") == r.getAs[Long]("doc_a") + 20000)
    // (1-j²)^bands miss at j≈0.7 is ~7%; demand >= 60% so a banding
    // regression (e.g. the affine-plane collapse class) fails loudly
    // without the test riding the exact corpus
    assert(recovered >= (eligible * 6) / 10,
      s"only $recovered of $eligible planted fragments recovered")
  }
}
