package graft.pipeline

import graft.SparkSpec

/** Plain-Scala recompute of the temperature-mix arithmetic — pins the
  * DEFINITION (exact isqrt, integer-div weights, the decomposed floor
  * identity for the allocation) independently of both engines, plus
  * the invariants that make it a temperature sampler.
  */
class TemperatureMixSpec extends SparkSpec {

  private def mdBucket(salt: String, key: String, n: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + key).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 4), 16) % n
  }

  test("gate rows equal the plain-Scala definition; sampler invariants hold") {
    import org.apache.spark.sql.functions._
    val census = graft.Tables(spark, sf0001, "documents")
      .select(col("source"), col("doc_id"),
        size(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")),
          " ")).cast("long").as("t"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter { case (src, id, _) =>
        mdBucket("tmix|", id.toString, 100) <
          math.min(100L, mdBucket("tq|", src, 97) + 5) }
      .groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    def isqrt(n: Long): Long = {
      val i0 = math.floor(math.sqrt(n.toDouble)).toLong
      if ((i0 + 1) * (i0 + 1) <= n) i0 + 1
      else if (i0 * i0 > n) i0 - 1 else i0
    }
    val sumIsq = census.values.map(isqrt).sum
    val total = census.values.sum
    val tgt = total / 2
    val expected = census.map { case (src, n) =>
      val w = isqrt(n) * 1000000L / sumIsq
      val take = (tgt / 1000000L) * w + ((tgt % 1000000L) * w) / 1000000L
      src -> (n, isqrt(n), w, take, take * 1000L / n)
    }
    val got = graft.Queries.queries("curate_temperature_mix")(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap
    graft.CacheTracker.releaseAll()
    assert(got.keySet == expected.keySet, "source set drifted")
    got.foreach { case (s0, m) =>
      assert(m == expected(s0), s"source $s0: $m != ${expected(s0)}")
    }
    // sampler invariants: weights ~sum to 1e6 (floor-div slack < n_src),
    // and temperature actually compresses the range — the ratio of
    // extreme weights must sit strictly inside the ratio of sizes
    val ws = got.values.map(_._3)
    assert(ws.sum <= 1000000L && ws.sum > 1000000L - got.size,
      s"weights sum ${ws.sum}")
    val (nMin, nMax) = (got.values.map(_._1).min, got.values.map(_._1).max)
    assert(nMax > nMin, "planted skew missing")
    assert(ws.max.toDouble / ws.min < nMax.toDouble / nMin,
      "temperature must compress the size ratio")
    // the planted skew makes at least one source upsample past 1 epoch
    // relative to its share: epochs spread must straddle the uniform
    // allocation (tgt/total = 0.5 → 500 milli-epochs)
    val es = got.values.map(_._5)
    assert(es.min < 500 && es.max > 500,
      s"epochs [${es.min}, ${es.max}] never straddle the uniform share")
  }
}
