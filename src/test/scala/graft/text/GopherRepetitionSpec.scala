package graft.text

import graft.SparkSpec

/** Plain-Scala recompute of the Gopher repetition metrics — pins the
  * DEFINITION (chunk lines, every-occurrence char mass, integer
  * cross-multiplied thresholds) independently of both engines, the
  * Cusum/Winnowing template. Runs the whole sf0.001 corpus.
  */
class GopherRepetitionSpec extends SparkSpec {

  private def bucket100(salt: String, key: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + key.toString).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 4), 16) % 100
  }

  private def metrics(toks: Array[String]):
      (Long, Long, Long, Long, Long, String) = {
    val totalChars = toks.mkString(" ").length.toLong
    val lines = (0 until toks.length / 10)
      .map(j => toks.slice(j * 10, j * 10 + 10).mkString(" "))
    val lineCnt = lines.groupBy(identity).view.mapValues(_.size.toLong)
    val nLines = lines.size.toLong
    val nDup = lineCnt.values.filter(_ >= 2).sum
    def gramMass(n: Int): Map[String, Long] =
      toks.sliding(n).map(_.mkString(" ")).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val g2 = gramMass(2)
    val top2 = g2.toSeq.sortBy { case (g, c) => (-c, g) }.head
    val top2Chars = top2._1.length.toLong * top2._2
    val dup5 = gramMass(5).collect {
      case (g, c) if c >= 2 => g.length.toLong * c }.sum
    val verdict =
      if (nDup * 100 > nLines * 30 || top2Chars * 100 > totalChars * 20 ||
        dup5 * 100 > totalChars * 15) "filter" else "keep"
    (nLines, nDup, totalChars, top2Chars, dup5, verdict)
  }

  test("gate rows equal the plain-Scala definition on the whole corpus") {
    import org.apache.spark.sql.functions._
    val raw = graft.Tables(spark, sf0001, "documents")
      .select(col("doc_id"),
        split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")
          .as("t0"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
      .filter(_._2.length >= 15)
    val expected = raw.map { case (id, t0) =>
      val toks =
        if (bucket100("rep|", id) < 20) t0.take(10) ++ t0.take(10) ++ t0
        else t0
      id -> metrics(toks)
    }.toMap
    val got = graft.Queries.queries("text_gopher_repetition")(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
      .toMap
    graft.CacheTracker.releaseAll()
    assert(got.keySet == expected.keySet, "doc set drifted")
    got.foreach { case (id, m) =>
      assert(m == expected(id), s"doc $id: $m != ${expected(id)}")
    }
    // the plant is live: every planted doc filters, and the filter set
    // is not only the plant (natural repetition exists in the corpus
    // at sf0.1; at sf0.001 it may or may not — only assert the plant)
    expected.collect { case (id, e) if bucket100("rep|", id) < 20 =>
      assert(e._6 == "filter", s"planted doc $id escaped the filter")
    }
  }
}
