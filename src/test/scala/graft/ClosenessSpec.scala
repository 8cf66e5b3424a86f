package graft

/** Pins graph_closeness_landmarks: landmark 0's distance column must
  * reproduce graph_bfs_layers' histogram exactly (the vectorized
  * 4-landmark loop is provably four independent BFS relaxations sharing
  * shuffles — this catches any cross-column bleed), and each row's
  * reached-count and distance-sum must recompute from its own columns.
  */
class ClosenessSpec extends SparkSpec {

  test("landmark 0 reproduces the BFS layer histogram; row sums recompute") {
    val cl = Queries.queries("graph_closeness_landmarks")(spark, sf0001)
      .collect()
    val bfs = Queries.queries("graph_bfs_layers")(spark, sf0001)
      .collect()
      .map(r => r.getAs[Long]("dist") -> r.getAs[Long]("n_nodes")).toMap
    graft.CacheTracker.releaseAll()
    val hist0 = cl.groupBy(_.getAs[Long]("d0")).view
      .mapValues(_.length.toLong).toMap
    assert(hist0 == bfs,
      "the vectorized loop's landmark-0 distances diverged from the BFS gate")
    cl.foreach { r =>
      val ds = (0 until 4).map(i => r.getAs[Long](s"d$i"))
      assert(ds.forall(_ >= -1L))
      assert(r.getAs[Long]("n_reached") == ds.count(_ >= 0).toLong)
      assert(r.getAs[Long]("dist_sum") == ds.filter(_ >= 0).sum)
    }
    // the landmarks themselves sit at distance 0 from themselves
    assert(cl.count(r => (0 until 4).exists(i =>
      r.getAs[Long](s"d$i") == 0L)) >= 4)
  }
}
