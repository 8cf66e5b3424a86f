package graft

import org.apache.spark.sql.functions._

/** Pins the events_attribution and events_cohort_ltv definitions at
  * sf0.001 with plain-Scala recomputes: first/last-touch credit per
  * purchase re-derived from the raw (user, ts, event_id, type) stream
  * (including the strictly-before rule and the (ts, event_id) tie
  * order), and the LTV matrix checked against per-user first-week
  * cohorts with exact purchase counts.
  */
class AttributionSpec extends SparkSpec {

  private def events() = {
    import spark.implicits._
    Tables(spark, sf0001, "events")
      .select($"user_id", $"event_id", $"event_type",
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .as[(Long, Long, String, Long)].collect()
  }

  test("attribution matches a plain-Scala first/last-touch recompute") {
    val rows = Queries.queries("events_attribution")(spark, sf0001).collect()
    val evs = events()
    graft.CacheTracker.releaseAll()
    val byUser = evs.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2))).toMap
    var last = Map.empty[String, Long].withDefaultValue(0L)
    var first = Map.empty[String, Long].withDefaultValue(0L)
    byUser.values.foreach { seq =>
      val firstTouch = seq.collectFirst {
        case (_, _, t, _) if t == "click" || t == "view" => t
      }.getOrElse("none")
      seq.zipWithIndex.foreach { case ((_, _, t, _), i) =>
        if (t == "purchase") {
          val lastTouch = seq.take(i).reverse.collectFirst {
            case (_, _, tt, _) if tt == "click" || tt == "view" => tt
          }.getOrElse("none")
          last += lastTouch -> (last(lastTouch) + 1)
          first += firstTouch -> (first(firstTouch) + 1)
        }
      }
    }
    rows.foreach { r =>
      val expect = r.getAs[String]("model") match {
        case "last_touch" => last(r.getAs[String]("touch_type"))
        case _ => first(r.getAs[String]("touch_type"))
      }
      assert(r.getAs[Long]("n_purchases") == expect,
        s"${r.getAs[String]("model")}/${r.getAs[String]("touch_type")}")
    }
    // both models partition the same purchase set
    val total = evs.count(_._3 == "purchase").toLong
    Seq("last_touch", "first_touch").foreach { m =>
      assert(rows.filter(_.getAs[String]("model") == m)
        .map(_.getAs[Long]("n_purchases")).sum == total, m)
    }
  }

  test("cohort LTV partitions purchases into first-week cohorts") {
    import spark.implicits._
    val rows = Queries.queries("events_cohort_ltv")(spark, sf0001).collect()
    val evs = Tables(spark, sf0001, "events")
      .select($"user_id", $"event_type",
        expr("unix_micros(cast(ts as timestamp)) div 86400000000 div 7")
          .as("w"))
      .as[(Long, String, Long)].collect()
    graft.CacheTracker.releaseAll()
    val cohortOf = evs.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val expect = evs.groupBy(e => (cohortOf(e._1), e._3 - cohortOf(e._1)))
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val key = (r.getAs[Long]("cohort_w"), r.getAs[Long]("age"))
      val cell = expect(key)
      assert(r.getAs[Long]("active_users") ==
        cell.map(_._1).distinct.length, key)
      assert(r.getAs[Long]("n_purchases") ==
        cell.count(_._2 == "purchase"), key)
    }
  }
}
