package graft

import java.security.MessageDigest

/** Pins curate_shard_assign to the rendezvous-hashing definition and to
  * THE property rendezvous hashing exists for: the per-shard counts must
  * match a plain-Scala argmax-of-md5 recompute, and removing one shard
  * must move ONLY that shard's documents (every other assignment is
  * decided by a comparison set that merely lost a loser, so it cannot
  * change) — the minimal-disruption contract a `hash mod N` scheme
  * violates for ~all rows.
  */
class ShardAssignSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def assign(docId: Long, shards: Seq[Int]): Int =
    shards.maxBy(sh => md5hex(s"$docId:$sh"))

  test("per-shard counts match the plain-Scala rendezvous recompute") {
    import spark.implicits._
    val rows = Queries.queries("curate_shard_assign")(spark, sf0001)
      .collect()
    val ids = Tables(spark, sf0001, "documents")
      .select($"doc_id").as[Long].collect()
    graft.CacheTracker.releaseAll()
    val expected = ids.groupBy(assign(_, 0 until 16))
      .view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getAs[Int]("shard")).toSeq == rows.map(_.getAs[Int]("shard")).sorted.toSeq)
    val got = rows.map(r => r.getAs[Int]("shard") -> r.getAs[Long]("n_docs")).toMap
    assert(got == expected)
    // shares sum to ~1e6 (integer-division dust only) and each is exact
    val total = ids.length.toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("share_ppm") ==
        1000000L * r.getAs[Long]("n_docs") / total)
    }
  }

  test("dropping a shard moves only that shard's documents") {
    import spark.implicits._
    val ids = Tables(spark, sf0001, "documents")
      .select($"doc_id").as[Long].collect()
    graft.CacheTracker.releaseAll()
    val full = ids.map(id => id -> assign(id, 0 until 16)).toMap
    val dropped = 7
    val reduced = (0 until 16).filterNot(_ == dropped)
    ids.foreach { id =>
      val after = assign(id, reduced)
      if (full(id) != dropped)
        assert(after == full(id), s"doc $id moved ${full(id)} -> $after")
    }
    // and the displaced docs really existed (the property isn't vacuous)
    assert(ids.exists(id => full(id) == dropped))
  }
}
