package graft

/** Independent plain-Scala recomputes of the two r15 exact-integer
  * gates at sf0.001 — the oracle hash says "both engines agree"; these
  * pins say "and they agree with the DEFINITION".
  */
class ForecastSmoothingSpec extends SparkSpec {

  test("Holt smoothing gate matches a plain-Scala fold of the definition") {
    import spark.implicits._
    val rows = Queries.queries("events_holt_winters")(spark, sf0001).collect()
    val daily = Tables(spark, sf0001, "events")
      .select($"event_type",
        org.apache.spark.sql.functions.expr(
          "unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy($"event_type", $"day")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("c")))
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    val d0 = daily.map(_._2).min
    val d1 = daily.map(_._2).max
    def fl4(x: Long): Long = Math.floorDiv(x, 4L)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val byDay = daily.filter(_._1 == t).map(c => c._2 -> c._3).toMap
      val cs = (d0 to d1).map(d => byDay.getOrElse(d, 0L))
      assert(r.getAs[Int]("n_days") === cs.size)
      var sL = cs.head * 1000000L
      var bL = 0L
      cs.tail.foreach { c =>
        val sN = fl4(c * 1000000L + 3L * (sL + bL))
        bL = fl4((sN - sL) + 3L * bL)
        sL = sN
      }
      assert(r.getAs[Long]("level_micro") === sL, s"level of $t")
      assert(r.getAs[Long]("trend_micro") === bL, s"trend of $t")
      assert(r.getAs[Long]("forecast7_micro") === sL + 7L * bL)
    }
    // the recompute above builds the SAME dense spine (zero-filled gap
    // days) the gate builds, so a gap-handling divergence would fail the
    // per-type equality even though this corpus happens to be dense
  }

  test("Kneser-Ney gate matches a plain-Scala recompute over the bigram counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Queries.queries("text_kneser_ney_bigram")(spark, sf0001).collect()
    // recompute from the same tokenization's bigram counts (tokenization
    // itself is pinned by the wider text family)
    val bg = Tables(spark, sf0001, "documents")
      .select(graft.text.TextAnalysis.tokens($"text").as("toks"))
      .filter(size($"toks") >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) AS u,
          |              element_at(toks, i + 1) AS w))""".stripMargin)).as("b"))
      .groupBy($"b.u".as("u"), $"b.w".as("w"))
      .agg(count(lit(1)).as("cuw"))
      .collect()
      .map(r => (r.getAs[String]("u"), r.getAs[String]("w"),
        r.getAs[Long]("cuw")))
    graft.CacheTracker.releaseAll()
    assert(rows.length == 60, s"20 contexts x top-3 expected, got ${rows.length}")
    val nn = bg.length.toLong
    val cu = bg.groupBy(_._1).map { case (u, xs) =>
      u -> (xs.map(_._3).sum, xs.length.toLong) }
    val n1w = bg.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    val top20 = cu.toSeq.sortBy { case (u, (c, _)) => (-c, u) }.take(20)
      .map(_._1).toSet
    assert(rows.map(_.getAs[String]("u")).toSet === top20)
    rows.foreach { r =>
      val (u, w) = (r.getAs[String]("u"), r.getAs[String]("w"))
      val cuw = bg.find(x => x._1 == u && x._2 == w).get._3
      assert(r.getAs[Long]("cuw") === cuw)
      val (cuV, n1uV) = cu(u)
      val num = math.max(4L * cuw - 3L, 0L) * nn + 3L * n1uV * n1w(w)
      assert(r.getAs[Long]("num") === num, s"num of ($u, $w)")
      assert(r.getAs[Long]("den") === 4L * cuV * nn)
    }
    // per-context ranks are the exact (num desc, w) order over ALL of
    // that context's continuations, not just the emitted 3
    rows.groupBy(_.getAs[String]("u")).foreach { case (u, rs) =>
      val want = bg.filter(_._1 == u).map { case (_, w, cuw) =>
        (math.max(4L * cuw - 3L, 0L) * nn + 3L * cu(u)._2 * n1w(w), w)
      }.sortBy { case (num, w) => (-num, w) }.take(rs.length).map(_._2)
      val got = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[String]("w")).toSeq
      assert(got === want, s"top-3 of $u")
    }
  }
}
