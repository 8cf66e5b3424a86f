package graft

/** Pins `agg_kmv_intersect`'s estimator quality and the KMV structural
  * invariants the one-row gate output must satisfy — the oracle hash
  * pins both engines build the identical sketches; this spec pins that
  * the sketches are USEFUL (estimates near exact) and well-formed.
  */
class KmvSpec extends SparkSpec {

  private val M = 1L << 48

  test("KMV estimates land within 50% of exact; union sketch is well-formed") {
    Seq(sf0001, "/root/testdata/sf0.01").foreach { dir =>
      val r = Queries.queries("agg_kmv_intersect")(spark, dir).head()
      graft.CacheTracker.releaseAll()
      val k = r.getAs[Int]("k")
      val (hkA, hkB, hkU) = (r.getAs[Long]("hk_a"), r.getAs[Long]("hk_b"),
        r.getAs[Long]("hk_u"))
      val nCommon = r.getAs[Long]("n_common")
      val (exA, exB, exI) = (r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"),
        r.getAs[Long]("exact_inter"))
      // structure: the union's k-th smallest can never exceed either
      // input's (the union only adds candidates below the cut)
      assert(hkU <= math.min(hkA, hkB), s"union kth-value above inputs at $dir")
      assert(nCommon <= k && nCommon >= 0)
      assert(exI <= math.min(exA, exB))
      def est(hk: Long): Double = (k - 1).toDouble * M / hk
      def close(e: Double, x: Long): Boolean =
        x <= k || math.abs(e - x) <= 0.5 * x
      // quality: for sets larger than the sketch, (k-1)·M/h_k must land
      // within ±50% (k = 64 gives ~12.5% standard error; 50% is ~4σ)
      assert(close(est(hkA), exA), s"$dir est_a ${est(hkA)} vs $exA")
      assert(close(est(hkB), exB), s"$dir est_b ${est(hkB)} vs $exB")
      val estI = nCommon.toDouble / k * est(hkU)
      assert(exI <= k || math.abs(estI - exI) <= 0.5 * exI,
        s"$dir est_inter $estI vs $exI")
    }
  }
}
