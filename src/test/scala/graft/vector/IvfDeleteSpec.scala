package graft.vector

import graft.{Queries, SparkSpec}

/** Pins the sim_ivf_delete_tombstone erasure contract at sf0.001: no
  * tombstoned vector (vec_id % 7 = 3) is ever returned, every query
  * still gets a full top-5 (deletes shrink candidates, not the answer),
  * and the mask demonstrably suppressed candidates somewhere — the
  * fixture is only meaningful if there was something to delete.
  */
class IvfDeleteSpec extends SparkSpec {

  test("tombstoned vectors never surface; the mask measurably fires") {
    val rows = Queries.queries("sim_ivf_delete_tombstone")(spark, sf0001)
      .collect()
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") % 7 != 3,
        s"tombstoned vec ${r.getAs[Long]("vec_id")} returned for " +
          s"q=${r.getAs[Long]("q_id")}")
      assert(r.getAs[Long]("suppressed_in_probe") >= 0L)
    }
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, qr) =>
      assert(qr.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5),
        s"q=$q missing ranks")
    }
    assert(rows.exists(_.getAs[Long]("suppressed_in_probe") > 0L),
      "no query had a tombstoned candidate — fixture exercises nothing")
  }
}
