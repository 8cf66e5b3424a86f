package graft

/** Pins join_asof_tolerance against the untolerated backward gate: the
  * two must agree row-for-row wherever the backward match is within the
  * 30-minute bound, and the tolerance gate must null exactly the rows
  * whose backward match is staler — so the tolerance is provably a
  * post-filter on the same as-of semantics, not a different match.
  */
class AsofToleranceSpec extends SparkSpec {

  test("tolerance as-of = backward as-of with stale matches nulled") {
    import org.apache.spark.sql.functions._
    val tol = 1800000000L
    val tolRows = Queries.queries("join_asof_tolerance")(spark, sf0001)
      .collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.get(r.fieldIndex("click_ts"))),
          Option(r.get(r.fieldIndex("delta_us"))).map(_.asInstanceOf[Long])))
      .toMap
    val back = Queries.queries("join_asof_purchase_click")(spark, sf0001)
      .withColumn("delta_us",
        expr("unix_micros(cast(ts as timestamp)) - " +
          "unix_micros(cast(click_ts as timestamp))"))
      .collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.get(r.fieldIndex("click_ts"))),
          Option(r.get(r.fieldIndex("delta_us"))).map(_.asInstanceOf[Long])))
      .toMap
    graft.CacheTracker.releaseAll()
    assert(tolRows.keySet == back.keySet,
      "both gates must emit every purchase exactly once")
    var nulled = 0
    back.foreach { case (pid, (bTs, bDelta)) =>
      val (tTs, tDelta) = tolRows(pid)
      bDelta match {
        case Some(d) if d <= tol =>
          assert(tTs == bTs && tDelta.contains(d),
            s"purchase $pid: in-tolerance match must ride through")
        case Some(_) =>
          assert(tTs.isEmpty && tDelta.isEmpty,
            s"purchase $pid: stale match must be nulled")
          nulled += 1
        case None =>
          assert(tTs.isEmpty && tDelta.isEmpty,
            s"purchase $pid: unmatched stays unmatched")
      }
    }
    assert(nulled > 0, "the corpus must exercise the stale branch")
  }
}
