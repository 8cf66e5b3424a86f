package graft

/** Pins the lake_deletion_vectors merge-on-read contract at sf0.001:
  * the DV-masked logical view and the physically compacted v2 must be
  * indistinguishable per partition, the mask removes exactly the
  * dead-key rows from F and nothing else, and no dead key survives the
  * mask or the compaction.
  */
class DeletionVectorsSpec extends SparkSpec {

  test("dv_applied and compacted states agree; the mask is exact") {
    val rows = Queries.queries("lake_deletion_vectors")(spark, sf0001)
      .collect()
    graft.CacheTracker.releaseAll()
    val byState = rows.groupBy(_.getAs[String]("state")).view
      .mapValues(_.map(r => r.getAs[String]("o_orderstatus") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("total"),
          r.getAs[Long]("n_dv_keys")))).toMap).toMap
    assert(byState.keySet == Set("raw", "dv_applied", "compacted"))
    val raw = byState("raw")
    val dv = byState("dv_applied")
    val compacted = byState("compacted")
    // merge-on-read view == physical rewrite, partition by partition
    assert(dv == compacted, "DV-masked read diverges from compacted v2")
    // no dead key survives the mask
    dv.values.foreach { case (_, _, nDv) => assert(nDv == 0L) }
    raw.foreach { case (status, (nRaw, totRaw, nDvKeys)) =>
      val (nMasked, totMasked, _) = dv(status)
      if (status == "F") {
        assert(nDvKeys > 0L, "fixture must contain dead keys in F")
        assert(nRaw == nMasked + nDvKeys, "mask removed wrong row count")
      } else {
        // untouched partitions are identical through the mask
        assert(nDvKeys == 0L)
        assert(nRaw == nMasked && totRaw == totMasked, s"$status changed")
      }
    }
  }
}
