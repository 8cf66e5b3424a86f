package graft

/** Independent in-memory recompute of the events_cusum_changepoint gate
  * at sf0.001: the dense per-type day spine, the n-scaled mean-centered
  * running sums, and the |C|-max change point (ties to the earliest day)
  * are re-derived in plain Scala BigInt and must agree exactly — the
  * oracle hash says "both engines agree"; this pin says "and they agree
  * with the CUSUM definition".
  */
class CusumSpec extends SparkSpec {

  test("CUSUM gate matches a plain-Scala BigInt recompute of the definition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Queries.queries("events_cusum_changepoint")(spark, sf0001)
      .collect()
    val evs = Tables(spark, sf0001, "events")
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .as[(String, Long)].collect()
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    val (d0, d1) = (evs.map(_._2).min, evs.map(_._2).max)
    val byType = evs.groupBy(_._1)
    assert(rows.length == byType.size)
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val counts = byType(tpe).groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      val xs = (d0 to d1).map(d => counts.getOrElse(d, 0L))
      val n = BigInt(xs.size)
      val s = BigInt(xs.sum)
      // running sums of n·y − S and the earliest |C|-max index
      val cs = xs.scanLeft(BigInt(0))((acc, y) => acc + (n * y - s)).tail
      val best = cs.zipWithIndex.maxBy { case (c, i) => (c.abs, -i) }
      assert(BigInt(r.getAs[Long]("n_days")) == n, tpe)
      assert(r.getAs[Long]("change_day") == best._2.toLong, tpe)
      assert(BigInt(r.getAs[Long]("cusum")) == best._1, tpe)
      val expectShift =
        if (best._1 > 0) "drop_after"
        else if (best._1 < 0) "rise_after" else "flat"
      assert(r.getAs[String]("shift") == expectShift, tpe)
    }
  }
}
