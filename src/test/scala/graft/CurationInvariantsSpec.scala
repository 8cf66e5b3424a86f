package graft

import java.sql.Timestamp

/** Structural invariants the row-hash gates alone would not explain if
  * they broke: `scd2_dimension_history` version chains must be rooted,
  * contiguous, and singly-current (the properties an as-of dimension
  * join relies on), and `curate_quantile_bins` deciles must partition
  * the corpus into ordered disjoint value ranges.
  */
class CurationInvariantsSpec extends SparkSpec {
  import spark.implicits._

  test("quantile bins partition the corpus into ordered, disjoint ranges") {
    val bins = Queries.queries("curate_quantile_bins")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(bins.map(_._1).toSeq == (0L to 9L),
      "all ten deciles must be populated on this corpus")
    val total = Tables(spark, sf0001, "documents").count()
    assert(bins.map(_._2).sum == total, "bins must partition the corpus")
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 < b._3,
          s"bin ${a._1} max ${a._4} must precede bin ${b._1} min ${b._3} " +
            "(ties share a bin, so ranges are strictly disjoint)")
      case _ =>
    }
  }

  test("l-diversity agrees with the k-anonymity report on the shared QI grid") {
    // both audits group by the SAME quasi-identifier tuple
    // (nation × balance band), so the per-nation group counts and row
    // totals must be identical between the two reports, and l is
    // bounded by group size (distinct sensitive values can't exceed
    // members) so min_l >= 1 always
    val ld = Queries.queries("curate_l_diversity")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val ka = Queries.queries("curate_k_anonymity")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(ld.keySet == ka.keySet, "same nations on both reports")
    ld.foreach { case (nation, (_, nGroups, nLow, nExposed, minL)) =>
      assert(nGroups == ka(nation)._2,
        s"nation $nation group counts diverge between the QI audits")
      assert(minL >= 1 && nLow <= nGroups && nExposed >= nLow,
        s"nation $nation: exposed rows must cover each low-l group")
    }
  }

  test("t-closeness matches a plain-Scala BigInt recompute of the TV integers") {
    import org.apache.spark.sql.functions._
    val rows = Queries.queries("curate_t_closeness")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[Number]("nation").longValue,
          r.getAs[Long]("bal_band")) ->
        (r.getAs[Long]("n_g"), r.getAs[Long]("tv_num"),
          r.getAs[Long]("tv_den"), r.getAs[Boolean]("far")))
      .toMap
    val cust = Tables(spark, sf0001, "customer")
      .select($"c_nationkey".cast("long"),
        floor($"c_acctbal" / 2000.0).cast("long"), $"c_mktsegment")
      .as[(Long, Long, String)].collect()
    graft.CacheTracker.releaseAll()
    val nn = BigInt(cust.length)
    val globalCnt = cust.groupBy(_._3).view.mapValues(v => BigInt(v.length))
    val segs = globalCnt.keys.toSeq
    val byGroup = cust.groupBy(c => (c._1, c._2))
    assert(rows.keySet == byGroup.keySet)
    byGroup.foreach { case (g, members) =>
      val nG = BigInt(members.length)
      val cnt = members.groupBy(_._3).view.mapValues(v => BigInt(v.length))
      val num = segs.map(s =>
        (cnt.getOrElse(s, BigInt(0)) * nn - globalCnt(s) * nG).abs).sum
      val den = 2 * nG * nn
      val (rN, rNum, rDen, rFar) = rows(g)
      assert(BigInt(rN) == nG && BigInt(rNum) == num && BigInt(rDen) == den,
        s"group $g")
      assert(rFar == (num * 5 > den), s"group $g flag")
    }
  }

  test("every history chain is contiguous, rooted, and singly-current") {
    val rows = Queries.queries("scd2_dimension_history")(spark, sf0001)
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    val root = Timestamp.valueOf("2020-01-01 00:00:00")
    rows.foreach { case (key, vs) =>
      val chain = vs.sortBy(_._3.getTime)
      assert(chain.head._3 == root, s"key $key chain not rooted at v0")
      assert(chain.count(_._5) == 1, s"key $key current-flag count != 1")
      assert(chain.last._5 && chain.last._4.isEmpty,
        s"key $key open interval must be the LAST version")
      chain.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3),
            s"key $key gap: valid_to ${a._4} != next valid_from ${b._3}")
          assert(a._2 != b._2,
            s"key $key adjacent versions must differ (change detection)")
        case _ =>
      }
    }
  }
}
