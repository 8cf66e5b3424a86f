package graft

/** Structural pins for the Bloom pre-join screen, complementing the
  * cross-engine hash gate: the no-false-negative contract holds EXACTLY
  * (n_true equals the true intersection recomputed from the raw
  * tables), pass counts are consistent, and the filter actually
  * screens (pass ≪ probe universe).
  */
class BloomPrefilterSpec extends SparkSpec {

  test("no false negatives: n_true is the exact build∩probe intersection") {
    val r = Queries.queries("agg_bloom_prefilter")(spark, sf0001).head()
    val (nBuild, nBits, nProbe, nPass, nTrue, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    import spark.implicits._
    val build = Tables(spark, sf0001, "orders")
      .filter($"o_orderstatus" === "F" && $"o_orderkey" % 7 === 0)
      .select($"o_orderkey").distinct().as[Long].collect().toSet
    val probe = Tables(spark, sf0001, "lineitem")
      .select($"l_orderkey").distinct().as[Long].collect().toSet
    CacheTracker.releaseAll()
    assert(nBuild == build.size && nProbe == probe.size)
    // the Bloom contract: every true member passes — so n_true must be
    // EXACTLY |build ∩ probe|, not at-most
    assert(nTrue == probe.count(build.contains),
      s"n_true $nTrue vs exact ${probe.count(build.contains)}")
    assert(nPass >= nTrue && nFp == nPass - nTrue)
    // the screen must actually screen: with ~2.8k of 16384 bits set,
    // fp rate ~(bits/m)^4 — passes stay within 2x of the true members
    assert(nPass <= 2 * nTrue + 16,
      s"screen not selective: $nPass passes for $nTrue members")
    assert(nBits <= 4 * nBuild, "at most k bits per build key")
  }
}
