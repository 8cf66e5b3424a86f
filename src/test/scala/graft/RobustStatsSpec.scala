package graft

/** Independent in-memory recompute of the events_anomaly_mad gate at
  * sf0.001: the lower-median/MAD selection and the 3-MAD flag are
  * re-derived in plain Scala over the collected corpus and must agree
  * column-for-column — the oracle hash says "both engines agree"; this
  * pin says "and they agree with the definition".
  */
class RobustStatsSpec extends SparkSpec {

  test("MAD gate matches a plain-Scala recompute of the definition") {
    import spark.implicits._
    val rows = Queries.queries("events_anomaly_mad")(spark, sf0001).collect()
    val corpus = Tables(spark, sf0001, "events")
      .select($"event_id", $"event_type", $"value")
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Double]("value")))
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    // lower median under the gate's exact ordering (key, tiebreak id)
    def lowerMedianBy[A](xs: Seq[(Double, Long)]): Double = {
      val sorted = xs.sortBy(identity)
      sorted(((sorted.size + 1) / 2) - 1)._1
    }
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val vs = corpus.filter(_._1 == t).map(c => (c._3, c._2)).toSeq
      assert(r.getAs[Long]("n") === vs.size)
      val med = lowerMedianBy(vs)
      assert(r.getAs[Double]("med") === med)
      val devs = corpus.filter(_._1 == t)
        .map(c => (math.abs(c._3 - med), c._2)).toSeq
      val mad = lowerMedianBy(devs)
      assert(r.getAs[Double]("mad") === mad)
      val flagged = devs.count(_._1 > 3.0 * mad)
      assert(r.getAs[Long]("n_anomalies") === flagged)
    }
  }
}
