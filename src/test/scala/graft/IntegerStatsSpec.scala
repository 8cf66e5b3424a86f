package graft

/** Independent in-memory recomputes of the two exact-integer analytics
  * gates added late in round 10 — the oracle hash says "both engines
  * agree"; these pins say "and they agree with the definitions".
  */
class IntegerStatsSpec extends SparkSpec {

  test("trend slopes match a plain-Scala BigInt OLS recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Queries.queries("events_trend_slope")(spark, sf0001)
      .collect()
    val daily = Tables(spark, sf0001, "events")
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .as[(String, Long)].collect()
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    val d0 = daily.map(_._2).min
    val byType = daily.groupBy(_._1).view.mapValues(
      _.groupBy(_._2).map { case (d, xs) => (d - d0, xs.length.toLong) })
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val pts = byType(t).toSeq
      val n = BigInt(pts.size)
      val sx = pts.map(p => BigInt(p._1)).sum
      val sy = pts.map(p => BigInt(p._2)).sum
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      assert(BigInt(r.getAs[Long]("n_days")) == n, t)
      assert(BigInt(r.getAs[Long]("num")) == num, t)
      assert(BigInt(r.getAs[Long]("den")) == den, t)
      val want = if (num > 0) "up" else if (num < 0) "down" else "flat"
      assert(r.getAs[String]("trend") == want, t)
    }
  }

  test("HITS matches a plain-Scala fixed-point power iteration") {
    import spark.implicits._
    val rows = Queries.queries("graph_hits")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = Tables(spark, sf0001, "documents")
      .select($"doc_id").as[Long].collect().sorted
    graft.CacheTracker.releaseAll()
    val n = ids.length.toLong
    // the gate's deterministic link graph, deduped, self-loops dropped
    val edges = ids.flatMap(i => Seq((i * 7 + 1) % n, (i * 13 + 2) % n,
        (i * 29 + 3) % n).filter(_ != i).map(d => (i, d))).distinct
    var hub = ids.map(i => i -> (1000000000000L / n)).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to 4) {
      val a0 = edges.groupBy(_._2).view.mapValues(
        _.map(e => hub(e._1)).sum).toMap
      val at = a0.values.sum
      auth = ids.map(i =>
        i -> a0.getOrElse(i, 0L) * 100000L / (at / 10000000L)).toMap
      val h0 = edges.groupBy(_._1).view.mapValues(
        _.map(e => auth(e._2)).sum).toMap
      val ht = h0.values.sum
      hub = ids.map(i =>
        i -> h0.getOrElse(i, 0L) * 100000L / (ht / 10000000L)).toMap
    }
    val want = ids.map(i => (i, auth(i), hub(i)))
      .sortBy { case (i, a, _) => (-a, i) }.take(50).toSeq
    assert(rows.toSeq == want)
  }
}
