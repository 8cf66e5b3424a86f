package graft.vector

import graft.{Queries, SparkSpec}

/** Pins the sim_rrf_fusion definition: the fused score must equal the
  * k=60 integer RRF formula recomputed from the gate's own rank columns
  * (so the score column can never drift from the ranks it claims to
  * fuse), per-query output ranks are a contiguous descending-score
  * prefix, and every contributing rank is inside the top-100 input
  * bound.
  */
class RrfFusionSpec extends SparkSpec {

  test("rrf score is the integer k=60 formula over its own rank columns") {
    val rows = Queries.queries("sim_rrf_fusion")(spark, sf0001).collect()
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    def term(r: Long): Long = if (r > 0) 1000000000L / (60L + r) else 0L
    rows.foreach { r =>
      val lex = r.getAs[Long]("lex_rank")
      val vec = r.getAs[Long]("vec_rank")
      assert(lex >= 0 && lex <= 100, s"lex_rank $lex outside [0, 100]")
      assert(vec >= 0 && vec <= 100, s"vec_rank $vec outside [0, 100]")
      assert(lex > 0 || vec > 0, "an item must come from at least one list")
      assert(r.getAs[Long]("rrf") == term(lex) + term(vec),
        s"score mismatch at q=${r.getAs[Long]("q_id")} item=${r.getAs[Long]("item_id")}")
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, qr) =>
      val byRank = qr.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq ==
        (1 to byRank.length).toSeq, s"q=$q ranks not contiguous")
      val scores = byRank.map(r =>
        (r.getAs[Long]("rrf"), r.getAs[Long]("item_id")))
      // descending by score, ties ascending by item id — the window order
      assert(scores.sliding(2).forall {
        case Array((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2)
        case _ => true
      }, s"q=$q not ordered by (rrf desc, item_id)")
      assert(byRank.map(_.getAs[Long]("item_id")).distinct.length ==
        byRank.length, s"q=$q duplicate items")
    }
  }
}
