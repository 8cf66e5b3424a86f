package graft

/** Independent in-memory recompute of the events_decayed_counts gate at
  * sf0.001: per-(user, day) counts, the 2^(day−d0) scaled-integer decay
  * weights, and the (score desc, user_id) top-50 are re-derived in plain
  * Scala BigInt and must agree exactly — the oracle hash says "both
  * engines agree"; this pin says "and they agree with the half-life
  * definition".
  */
class DecayedCountsSpec extends SparkSpec {

  test("decayed-counts gate matches a plain-Scala BigInt recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Queries.queries("events_decayed_counts")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val evs = Tables(spark, sf0001, "events")
      .select($"user_id",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .as[(Long, Long)].collect()
    graft.CacheTracker.releaseAll()
    val daily = evs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val d0 = daily.keys.map(_._2).min
    val d1 = daily.keys.map(_._2).max
    val perUser = daily.groupBy(_._1._1).map { case (u, m) =>
      val score = m.map { case ((_, d), y) =>
        BigInt(y) * (BigInt(1) << (d - d0).toInt) }.sum
      val n = m.values.sum
      val idle = d1 - m.keys.map(_._2).max
      (u, score, n, idle)
    }
    val expect = perUser.toSeq
      .sortBy { case (u, score, _, _) => (-score, u) }
      .take(50)
    assert(rows.length == math.min(50, perUser.size))
    rows.zip(expect).zipWithIndex.foreach {
      case ((r, (u, score, n, idle)), i) =>
        assert(r.getAs[Int]("rank") == i + 1)
        assert(r.getAs[Long]("user_id") == u, s"rank ${i + 1}")
        assert(BigInt(r.getAs[Long]("score")) == score, s"user $u")
        assert(r.getAs[Long]("n_events") == n, s"user $u")
        assert(r.getAs[Long]("days_idle") == idle, s"user $u")
    }
  }
}
