package graft.text

import graft.{Queries, SparkSpec}

/** Behavioral pins for `dedup_exact_substring` (the hash gate pins
  * exact values; this pins the SEMANTICS): a planted excerpt doc is
  * verbatim-contained in its original, so every one of its windows is
  * duplicated — coverage must be exactly 1.0; and the original's two
  * OVERLAPPING excerpt spans must MERGE (interval union ≥ 30 tokens,
  * not 2 × 20 double-counted and not k-truncated fragments).
  */
class ExactSubstringSpec extends SparkSpec {

  test("excerpts fully covered; originals merge both overlapping spans") {
    val out = Queries.queries("dedup_exact_substring")(spark, sf0001).collect()
    val excerpts = out.filter(_.getAs[Long]("doc_id") >= 20000)
    assert(excerpts.length >= 100, s"expected planted excerpt docs, got ${excerpts.length}")
    assert(excerpts.forall(_.getAs[Double]("dup_frac") == 1.0),
      "every planted excerpt doc is verbatim-contained in its original")
    val plantedIds = excerpts.map(_.getAs[Long]("doc_id") % 20000).toSet
    val planted = out.filter(r => plantedIds.contains(r.getAs[Long]("doc_id")))
    assert(planted.nonEmpty)
    // spans [5, 25) and [15, 35) merge to 30 covered tokens minimum
    // (organic cross-doc overlap can only add on top)
    assert(planted.forall(_.getAs[Long]("dup_toks") >= 30),
      "overlapping excerpt spans must union to >= 30 covered tokens")
    // the union must also never exceed the doc (sanity on the telescope)
    assert(out.forall(r =>
        r.getAs[Long]("dup_toks") <= r.getAs[Int]("n_toks").toLong),
      "covered tokens can never exceed the doc length")
  }
}
