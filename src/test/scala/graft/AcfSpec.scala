package graft

/** Independent in-memory recompute of the events_autocorrelation gate
  * at sf0.001: the dense hour spine, the n²-scaled mean-centered sums,
  * and the per-lag numerators are re-derived in plain Scala (BigInt —
  * no scaling tricks) and must agree exactly — the oracle hash says
  * "both engines agree"; this pin says "and they agree with the ACF
  * definition".
  */
class AcfSpec extends SparkSpec {

  test("ACF gate matches a plain-Scala BigInt recompute of the definition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Queries.queries("events_autocorrelation")(spark, sf0001)
      .collect()
    val hours = Tables(spark, sf0001, "events")
      .select(expr("unix_micros(cast(ts as timestamp)) div 3600000000")
        .as("h"))
      .as[Long].collect()
    graft.CacheTracker.releaseAll()
    assert(rows.length == 6)
    val counts = hours.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (h0, h1) = (hours.min, hours.max)
    val xs = (h0 to h1).map(h => counts.getOrElse(h, 0L))
    val n = BigInt(xs.size)
    val s = BigInt(xs.sum)
    val dev = xs.map(x => n * x - s)
    val den = dev.map(d => d * d).sum
    rows.foreach { r =>
      val k = r.getAs[Int]("lag")
      assert(BigInt(r.getAs[Long]("n")) == n)
      assert(BigInt(r.getAs[Long]("s")) == s)
      assert(BigInt(r.getAs[Long]("den")) == den)
      val num = (0 until xs.size - k).map(t => dev(t) * dev(t + k)).sum
      assert(BigInt(r.getAs[Long]("num")) == num, s"lag $k")
    }
  }
}
