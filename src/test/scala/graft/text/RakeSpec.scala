package graft.text

import graft.{Queries, SparkSpec, Tables}

/** Pins text_rake_keywords to the RAKE definition with an independent
  * plain-Scala recompute over the sf0.001 corpus: stopword-split token
  * runs capped at 3 words, corpus-wide word degrees (Σ of containing
  * phrase lengths, multiplicity included), phrase score = Σ word
  * degrees, top-50 under the (score desc, phrase) total order.
  */
class RakeSpec extends SparkSpec {

  private val stop = Set("the", "a", "and", "of", "to", "in", "is",
    "on", "for", "with", "fast", "slow", "big", "small")

  test("RAKE gate matches a plain-Scala recompute of the definition") {
    import spark.implicits._
    val rows = Queries.queries("text_rake_keywords")(spark, sf0001)
      .collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("n_occ"),
        r.getAs[Long]("score")))
    val texts = Tables(spark, sf0001, "documents")
      .select($"text").as[String].collect()
    graft.CacheTracker.releaseAll()

    // phrases: maximal stopword-free runs, kept iff <= 3 words
    val phrases = texts.toSeq.flatMap { t =>
      val toks = t.toLowerCase.trim.split("\\s+").toSeq
      val runs = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      toks.foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) { runs += cur.toSeq; cur.clear() } }
        else cur += w
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs.filter(_.size <= 3)
    }
    val deg = phrases.flatMap(p => p.map(_ -> p.size.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = phrases.groupBy(_.mkString(" "))
      .map { case (ph, insts) =>
        (ph, insts.size.toLong, insts.head.map(deg).sum)
      }.toSeq
      .sortBy { case (ph, _, score) => (-score, ph) }
      .take(50)

    assert(rows.toSeq == expected)
  }
}
