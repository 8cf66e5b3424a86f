package graft.vector

import graft.{Queries, SparkSpec}

/** Pins the sim_cascade_rerank funnel contract at sf0.001: every query
  * returns a full ordered top-5, tier scores are present and internally
  * consistent (final ordering is by exact cosine, not by either cheap
  * tier), and the cascade's recall@5 against the exact brute-force
  * top-5 stays above a measured floor (20/25 measured; pinned at 15 —
  * the 1-bit screen is the lossy stage, and a regression in the
  * signature family or the int8 quantizer would drop through this).
  */
class CascadeRerankSpec extends SparkSpec {

  test("cascade funnel is ordered by the exact tier and recalls >= 60%") {
    val rows = Queries.queries("sim_cascade_rerank")(spark, sf0001).collect()
    val brute = Queries.queries("sim_knn_brute")(spark, sf0001).collect()
      .filter(_.getAs[Int]("rank") <= 5)
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    graft.CacheTracker.releaseAll()
    assert(rows.length == 25, s"expected 5 queries x top-5, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getAs[Int]("h_dist") >= 0 && r.getAs[Int]("h_dist") <= 64)
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, qr) =>
      val byRank = qr.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to 5), s"q=$q")
      val cosines = byRank.map(_.getAs[Double]("cosine"))
      assert(cosines.sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      }, s"q=$q not ordered by the exact tier")
    }
    val hits = rows.count(r =>
      brute((r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))))
    assert(hits >= 15, s"cascade recall@5 collapsed: $hits/25 vs exact")
  }
}
