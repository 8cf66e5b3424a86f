package graft.multimodal

import graft.{Queries, SparkSpec}

/** Definition pin for multimodal_crossmodal_ann: collect the 16-bin
  * histogram features of the synthetic corpus once, then re-derive the
  * dominant-bin index, each audio query's top-2 probes, the in-cell L1
  * candidates, and the top-3 ranking in plain Scala — the gate must
  * agree row-for-row.
  */
class CrossmodalSpec extends SparkSpec {

  test("cross-modal ANN matches a plain-Scala probe-and-rank recompute") {
    val rows = Queries.queries("multimodal_crossmodal_ann")(spark, sf0001)
      .collect()
    val feats = Multimodal.featurize(
      Multimodal.syntheticCorpus(spark, 200)
        .filter(m => m.kind == "image" || m.kind == "audio"))
      .collect().map(f => (f.media_id, f.kind, f.histogram))
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)

    def dominant(h: Array[Long]): Int = {
      val mx = h.max
      h.indexWhere(_ == mx) + 1 // 1-based, ties to the first
    }
    val imgs = feats.filter(_._2 == "image")
      .map { case (id, _, h) => (id, h, dominant(h)) }
    val expected = feats.filter(_._2 == "audio").flatMap { case (qid, _, qh) =>
      val probes = (1 to 16).map(b => (b, qh(b - 1)))
        .sortBy { case (b, v) => (-v, b) }.take(2).map(_._1).toSet
      val cand = imgs.filter { case (_, _, blk) => probes(blk) }
        .map { case (nid, h, blk) =>
          val l1 = h.indices.map(i => math.abs(qh(i) - h(i))).sum
          (qid, nid, blk, l1)
        }
      cand.sortBy { case (_, nid, _, l1) => (l1, nid) }.take(3).zipWithIndex
        .map { case ((q, nid, blk, l1), i) => (q, nid, blk, l1, i + 1) }
    }.sortBy { case (q, _, _, _, rk) => (q, rk) }

    assert(rows.length == expected.length,
      s"gate ${rows.length} rows != recompute ${expected.length}")
    rows.zip(expected).foreach { case (r, (q, nid, blk, l1, rk)) =>
      assert(r.getAs[Long]("media_id") == q)
      assert(r.getAs[Long]("nbr_id") == nid, s"query $q rank $rk")
      assert(r.getAs[Int]("blk") == blk, s"query $q rank $rk")
      assert(r.getAs[Long]("l1") == l1, s"query $q rank $rk")
      assert(r.getAs[Int]("rank") == rk, s"query $q")
    }
  }
}
