package graft

/** Independent plain-Scala recompute of events_seasonality_dow at
  * sf0.001: dense day spine, epoch-day weekday arithmetic, exact
  * integer rates, and the (rate desc, dow) peak rule.
  */
class SeasonalitySpec extends SparkSpec {

  test("burstiness gate matches a plain-Scala BigInt recompute of the Fano integers") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Queries.queries("events_burstiness")(spark, sf0001)
      .collect()
    val evs = Tables(spark, sf0001, "events")
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .as[(String, Long)].collect()
    graft.CacheTracker.releaseAll()
    val (d0, d1) = (evs.map(_._2).min, evs.map(_._2).max)
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val counts = evs.filter(_._1 == tpe).groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      val xs = (d0 to d1).map(d => BigInt(counts.getOrElse(d, 0L)))
      val n = BigInt(xs.size)
      val s = xs.sum
      val varNum = n * xs.map(x => x * x).sum - s * s
      assert(BigInt(r.getAs[Long]("n_days")) == n, tpe)
      assert(BigInt(r.getAs[Long]("s")) == s, tpe)
      assert(BigInt(r.getAs[Long]("var_num")) == varNum, tpe)
      assert(BigInt(r.getAs[Long]("mean_den")) == n * s, tpe)
      val expect =
        if (varNum > n * s * 2) "bursty"
        else if (varNum * 2 < n * s) "regular" else "poisson_like"
      assert(r.getAs[String]("regime") == expect, tpe)
    }
  }

  test("seasonality gate matches a plain-Scala recompute of the definition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Queries.queries("events_seasonality_dow")(spark, sf0001)
      .collect()
    val evs = Tables(spark, sf0001, "events")
      .select($"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .as[(String, Long)].collect()
    graft.CacheTracker.releaseAll()
    val (d0, d1) = (evs.map(_._2).min, evs.map(_._2).max)
    val byType = evs.groupBy(_._1)
    assert(rows.length == byType.size * 7)
    byType.foreach { case (tpe, es) =>
      val counts = es.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val cells = (d0 to d1).groupBy(d => (d + 4) % 7).map { case (dow, ds) =>
        val events = ds.map(d => counts.getOrElse(d, 0L)).sum
        dow -> (ds.size.toLong, events, 1000L * events / ds.size)
      }
      val peak = cells.toSeq.map { case (dow, (_, _, r)) => (dow, r) }
        .maxBy { case (dow, r) => (r, -dow) }._1
      val got = rows.filter(_.getAs[String]("event_type") == tpe)
      got.foreach { r =>
        val dow = r.getAs[Long]("dow")
        val (nd, ne, rate) = cells(dow)
        assert(r.getAs[Long]("n_days") == nd, s"$tpe dow $dow")
        assert(r.getAs[Long]("n_events") == ne, s"$tpe dow $dow")
        assert(r.getAs[Long]("rate_permille") == rate, s"$tpe dow $dow")
        assert(r.getAs[Boolean]("is_peak") == (dow == peak), s"$tpe dow $dow")
      }
    }
  }
}
