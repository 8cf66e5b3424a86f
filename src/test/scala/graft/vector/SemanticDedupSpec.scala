package graft.vector

import graft.{Queries, SparkSpec}

/** Behavioral floor for `dedup_semantic` (the hash gate pins exact
  * values; this pins the SEMANTICS a refactor must not erode): the
  * planted twins must be dropped onto their originals, with only
  * cell-boundary leakage — a twin landing in a different Lloyd cell
  * than its original — escaping, and that leakage bounded.
  */
class SemanticDedupSpec extends SparkSpec {

  test("planted twins drop to their originals; cell-boundary leakage stays under 10%") {
    val out = Queries.queries("dedup_semantic")(spark, sf0001).collect()
    val twins = out.filter(_.getAs[Long]("vec_id") >= 10000)
    assert(twins.length == 500, s"expected 500 twins, got ${twins.length}")
    val dropped = twins.filter(_.getAs[Int]("kept") == 0)
    // measured 488/500 (0.976) — the floor leaves room for corpus
    // regeneration, not for a broken assignment
    assert(dropped.length >= 450,
      s"twin drop rate ${dropped.length}/500 under the 0.9 floor")
    assert(dropped.forall(r =>
        r.getAs[Long]("canon") == r.getAs[Long]("vec_id") - 10000),
      "every dropped twin must point at its own original as canonical")
    // originals all survive: twin ids are higher, and organic pairs top
    // out near cosine 0.5 on this corpus — far under the 0.98 verdict
    val originals = out.filter(_.getAs[Long]("vec_id") < 10000)
    assert(originals.forall(_.getAs[Int]("kept") == 1),
      "no original may be dropped")
  }

  test("hot-cell gate: skewed cell is capped, twins still drop, cap is load-bearing") {
    val out = Queries.queries("dedup_semantic_hot_cell")(spark, sf0001).collect()
    val hot = out.filter(_.getAs[Long]("vec_id") >= 1000000L)
    assert(hot.length == 500, s"expected 500 hot members, got ${hot.length}")
    // the planted region concentrates: the modal cell must dwarf the
    // 64-rank window (measured 424/500 at sf0.001 — the capped regime)
    val modal = hot.groupBy(_.getAs[Int]("cell")).values.map(_.size).max
    assert(modal >= 5 * 64,
      s"dominant hot cell has $modal members, not >> the 64 window")
    // every odd jittered member is a +0.001 twin of its even partner:
    // rank-adjacent by construction, must drop onto exactly that id
    val twins = hot.filter(r => r.getAs[Long]("vec_id") >= 1000128L &&
      r.getAs[Long]("vec_id") % 2 == 1)
    assert(twins.nonEmpty && twins.forall(r =>
        r.getAs[Int]("kept") == 0 &&
          r.getAs[Long]("canon") == r.getAs[Long]("vec_id") - 1),
      "every planted twin must drop onto its even partner")
    // jitter keeps non-twin pairs far under the verdict: no even
    // jittered member and no original may be dropped
    assert(hot.filter(r => r.getAs[Long]("vec_id") >= 1000128L &&
        r.getAs[Long]("vec_id") % 2 == 0)
      .forall(_.getAs[Int]("kept") == 1), "even jittered members all kept")
    assert(out.filter(_.getAs[Long]("vec_id") < 1000000L)
      .forall(_.getAs[Int]("kept") == 1), "no original may be dropped")
    // the cap is IN the output, not just in the plan: the colinear run
    // (128 mutual dupes at cosine 1, spanning ~2x the 64-rank window)
    // must CHAIN its canonicalization at the window boundary — an
    // uncapped screen pairs every run member with colinear vec 0 and
    // collapses the run onto ONE canonical, so an oracle that dropped
    // the window term would hash-mismatch on these rows
    val run = hot.filter(r => r.getAs[Long]("vec_id") < 1000128L)
    assert(run.count(_.getAs[Int]("kept") == 0) >= 127,
      "the colinear run is mutual dupes: every member except at most " +
        "the rank-extreme one must find a lower-id window partner")
    val runCanons = run.filter(_.getAs[Int]("kept") == 0)
      .map(_.getAs[Long]("canon")).distinct
    assert(runCanons.length > 10,
      s"run canonicalization must CHAIN at the window boundary " +
        s"(got ${runCanons.length} distinct canons; an uncapped screen " +
        "would collapse the run onto a single canonical)")
  }
}
