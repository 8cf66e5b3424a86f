package graft.text

import java.security.MessageDigest

import graft.{Queries, SparkSpec, Tables}

/** Pins text_winnowing_fingerprint to the MOSS definition with a
  * plain-Scala recompute at sf0.001, and pins the algorithm's theorem:
  * documents sharing a token run of length >= w+k-1 = 8 must share a
  * fingerprint HASH (the whole point of winnowing's density guarantee).
  */
class WinnowingSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The gate's model: positional 4-gram hashes, leftmost-min of every
    * 5-window of `hash|paddedpos` strings, distinct selected set.
    */
  private def winnow(toks: Seq[String]): Seq[String] = {
    val pgs = (0 to toks.size - 4).map { p =>
      md5hex(toks.slice(p, p + 4).mkString(" ")) + "|" + f"$p%06d"
    }
    (0 to pgs.size - 5).map(s => pgs.slice(s, s + 5).min).distinct.sorted
  }

  test("winnowing gate matches a plain-Scala recompute of the definition") {
    import spark.implicits._
    val rows = Queries.queries("text_winnowing_fingerprint")(spark, sf0001)
      .collect()
    val docs = Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    graft.CacheTracker.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id"))
        .toLowerCase.trim.split("\\s+").toSeq
      val sel = winnow(toks)
      val nGrams = (toks.size - 3).toLong
      assert(r.getAs[Long]("n_grams") == nGrams)
      assert(r.getAs[Long]("n_windows") == nGrams - 4)
      assert(r.getAs[Long]("n_selected") == sel.size.toLong)
      assert(r.getAs[Long]("density_ppm") ==
        1000000L * sel.size / (nGrams - 4))
      assert(r.getAs[String]("fp_digest") == md5hex(sel.mkString(",")))
    }
  }

  test("docs sharing an 8-token run share a fingerprint hash (the w+k-1 guarantee)") {
    val run = "alpha beta gamma delta epsilon zeta eta theta".split(" ").toSeq
    assert(run.size == 8)
    // the run embedded at different offsets inside unrelated noise
    val d1 = Seq("one", "two", "three") ++ run ++ Seq("four", "five")
    val d2 = Seq("six", "seven") ++ run ++
      Seq("eight", "nine", "ten", "eleven")
    val h1 = winnow(d1).map(_.takeWhile(_ != '|')).toSet
    val h2 = winnow(d2).map(_.takeWhile(_ != '|')).toSet
    assert(h1.intersect(h2).nonEmpty,
      "a shared >= w+k-1 token run must yield a shared fingerprint hash")
    // and density behaves: ~2/(w+1) of windows, never more than all
    val d = winnow(d1).size.toDouble / (d1.size - 3 - 4)
    assert(d > 0 && d <= 1.0)
  }
}
