package graft.vector

import graft.SparkSpec

/** Structural pins for greedy k-center selection (farthest-point
  * traversal), complementing the cross-engine oracle with a plain-Scala
  * recompute: distinct centers, the non-increasing coverage certificate,
  * and greedy dominance (each pick is the true argmax of min-distance
  * to the chosen set, checked with double arithmetic at a tolerance far
  * above the exact kernel's divergence but far below any real gap).
  */
class KcenterSpec extends SparkSpec {

  test("k-center picks are distinct, non-increasing, and greedy-dominant") {
    val rows = graft.Queries.queries("curate_kcenter_diverse")(spark, sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val emb = graft.Tables(spark, sf0001, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) v")
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).toArray).toMap
    graft.CacheTracker.releaseAll()
    assert(rows.length == 8)
    assert(rows.map(_._2).distinct.length == 8, "centers must be distinct")
    val dists = rows.map(_._3)
    dists.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"coverage certificate increased: $a -> $b")
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // greedy dominance: pick t's recorded distance matches the true max
    // over all points of min-distance-to-previous-centers
    val centers = rows.map(_._2)
    for (t <- 1 until 8) {
      val prev = centers.take(t).map(emb)
      val trueMax = emb.valuesIterator
        .map(v => prev.map(c => 1.0 - cos(v, c)).min).max
      assert(math.abs(trueMax - rows(t)._3) < 1e-8,
        s"round ${t + 1}: recorded ${rows(t)._3} vs recomputed $trueMax")
    }
  }
}
